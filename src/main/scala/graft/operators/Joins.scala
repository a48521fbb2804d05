package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark lacks as builtins, composed from union + ordered
  * windows (preference (a) of the custom-operator ladder — no custom
  * strategy needed because the composition is already the optimal
  * distributed shape).
  */
object Joins {

  /** Backward as-of join: for every left row, attach the chosen columns of
    * the LATEST right row with `rightTime <= leftTime` within the same key
    * group (NULLs when no such row — left-join semantics; ties on equal
    * timestamps take the right row, matching DuckDB/pandas ASOF `>=`).
    *
    * Shape: tag + union both inputs, one hash-partition by key with an
    * in-partition sort by (time, side), then `last(value, ignoreNulls)` over
    * the running frame carries each right value forward to the left rows
    * that follow it. ONE shuffle of left+right (no range-join explosion, no
    * per-row probing); at 100 TB this is the sort-merge-shaped plan you
    * want, and AQE handles skewed keys.
    *
    * @param rightValues right-side columns to carry (renamed as given)
    */
  def asOfBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTime: Column, rightTime: Column,
                   rightValues: Map[String, String]): DataFrame = {
    import org.apache.spark.sql.types.{StructField, StructType}
    val leftCols = left.columns.filterNot(keys.contains)
    val rightSchema = right.schema
    // Carry ONE struct of all right values (not one last() per column):
    // ASOF semantics attach a single matched right row, so all carried
    // columns must come from the same row and a genuine NULL in a payload
    // column must survive — per-column last(ignoreNulls) would skip it and
    // leak an older row's value in.
    val rvPairs = rightValues.toSeq
    val rvType = StructType(rvPairs.map { case (rc, out) =>
      StructField(out, rightSchema(rc).dataType)
    })
    val l = left
      .withColumn("__t", leftTime.cast("timestamp"))
      .withColumn("__side", lit(1))
      .withColumn("__rv", lit(null).cast(rvType))
    val r0 = right
      .withColumn("__t", rightTime.cast("timestamp"))
      .withColumn("__side", lit(0))
      .withColumn("__rv",
        struct(rvPairs.map { case (rc, out) => col(rc).as(out) }: _*))
    val rAligned = leftCols.foldLeft(r0) { case (df, lc) =>
      df.withColumn(lc, lit(null).cast(left.schema(lc).dataType))
    }
    val outCols = keys ++ Seq("__t", "__side", "__rv") ++ leftCols
    val u = l.select(outCols.map(col): _*)
      .unionByName(rAligned.select(outCols.map(col): _*))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = u.withColumn("__rv", last(col("__rv"), ignoreNulls = true).over(w))
    val unpacked = rvPairs.foldLeft(filled) { case (df, (_, out)) =>
      df.withColumn(out, col("__rv").getField(out))
    }
    unpacked.filter(col("__side") === 1).drop("__t", "__side", "__rv")
  }

  /** Bucketized interval (range) join: inner-join every left "point" row to
    * the right rows whose [start, end] interval contains it, within equal
    * `keys`. A plain equi-join on the keys followed by a range filter
    * multiplies per-key cardinalities (quadratic in rows per key — Spark's
    * default plan for this query); bucketizing time into `bucketSeconds`
    * cells and equi-joining on (keys, cell) bounds the fan-out to
    * intervalLength/bucketSeconds + 1 join rows per interval — the
    * standard distributed interval-join shape. Pick bucketSeconds ≈ the
    * typical interval length: longer intervals add join rows linearly,
    * never quadratically. Both sides shuffle once on (keys, cell); the
    * exact containment filter runs post-join. Point/start/end must be
    * castable to timestamp; column names must not collide across inputs. */
  def rangeJoin(points: DataFrame, intervals: DataFrame, keys: Seq[String],
                point: Column, start: Column, end: Column,
                bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val w = bucketSeconds * 1000000L
    val p = points
      .withColumn("__p", unix_micros(point.cast("timestamp")))
      .withColumn("__cell", floor(col("__p") / w))
    val i = intervals
      .withColumn("__s", unix_micros(start.cast("timestamp")))
      .withColumn("__e", unix_micros(end.cast("timestamp")))
      .withColumn("__cell",
        explode(sequence(floor(col("__s") / w), floor(col("__e") / w))))
    p.join(i, keys :+ "__cell")
      .filter(col("__p").between(col("__s"), col("__e")))
      .drop("__cell", "__p", "__s", "__e")
  }

  /** Gap-based sessionization: assign a session id per key that increments
    * whenever the time since the previous event exceeds `gapSeconds`.
    * One hash-partition + in-partition sort; session ids are 1-based per
    * key in time order. */
  def sessionize(df: DataFrame, keys: Seq[String], time: Column,
                 gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(time)
    val newSession = when(
      unix_micros(time) - unix_micros(lag(time, 1).over(w)) > gapSeconds * 1000000L,
      1).otherwise(0)
    val firstRow = when(lag(time, 1).over(w).isNull, 1).otherwise(0)
    df.withColumn("session_id",
      sum(greatest(newSession, firstRow))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"))
  }
}
