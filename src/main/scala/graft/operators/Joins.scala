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
    val leftCols = left.columns.filterNot(keys.contains)
    val rightSchema = right.schema
    val l = left
      .withColumn("__t", leftTime.cast("timestamp"))
      .withColumn("__side", lit(1))
    val lAligned = rightValues.foldLeft(l) { case (df, (rc, out)) =>
      df.withColumn(out, lit(null).cast(rightSchema(rc).dataType))
    }
    val r0 = right
      .withColumn("__t", rightTime.cast("timestamp"))
      .withColumn("__side", lit(0))
    val rAligned = leftCols.foldLeft(
      rightValues.foldLeft(r0) { case (df, (rc, out)) => df.withColumn(out, col(rc)) }
    ) { case (df, lc) => df.withColumn(lc, lit(null).cast(left.schema(lc).dataType)) }
    val outCols = keys ++ Seq("__t", "__side") ++ leftCols ++ rightValues.values.toSeq
    val u = lAligned.select(outCols.map(col): _*)
      .unionByName(rAligned.select(outCols.map(col): _*))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rightValues.values.foldLeft(u) { case (df, out) =>
      df.withColumn(out, last(col(out), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1).drop("__t", "__side")
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
