package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Log compaction — latest-row-per-key, the CDC/upsert ingest shape: a
  * change stream (inserts/updates keyed by entity, versioned by event
  * time + a unique sequence id) compacts to current state in ONE
  * aggregate. `max(struct(version…, payload…))` does a MAP-SIDE partial
  * max per key, so the exchange carries one candidate row per key per
  * partition — the property that matters at 100 TB, where the
  * `row_number() = 1` window form shuffles the ENTIRE change history
  * before discarding all but one row per key. (Spark plans the struct
  * max as SortAggregate — a per-partition sort on the grouping key over
  * the already-combined rows, not on the history; strictly cheaper than
  * the window's full-data sort.) Determinism requires the version
  * columns to totally order each key's rows — put a unique tie-breaker
  * (sequence id) last; payload columns ride along and only break ties if
  * the caller ignores that contract. */
object Compaction {

  /** Compact to the latest row per `keys`. `version` columns compare
    * lexicographically (latest = max); `payload` columns ride along.
    * Output columns: keys ++ version ++ payload, names preserved. */
  def latestByKey(df: DataFrame, keys: Seq[String], version: Seq[String],
                  payload: Seq[String]): DataFrame = {
    require(version.nonEmpty, "need at least one version column")
    val carried = version ++ payload
    df.groupBy(keys.map(col): _*)
      .agg(max(struct(carried.map(col): _*)).as("__top"))
      .select(keys.map(col) ++
        carried.map(n => col(s"__top.$n").as(n)): _*)
  }

  /** Type-2 slowly-changing-dimension builder — the history twin of
    * [[latestByKey]]: from a change log, the validity INTERVALS each
    * attribute value held, the standard warehouse dimension shape (every
    * as-of question then answers with one [[Joins.rangeJoin]] /
    * [[Joins.asOfBackward]] against this table instead of a scan of the
    * raw log).
    *
    * Per `key`, rows sort on (`time`, `attr`) — attr in the order makes
    * equal-timestamp changes a total order, so the build is deterministic
    * and SQL-replayable — then consecutive equal attr values collapse
    * (re-stating the current value is not a change), and each surviving
    * change opens an interval `[valid_from, valid_to)` closed by the next
    * change (`valid_to` NULL for the current row). `version` numbers the
    * key's history 1..n in change order.
    *
    * 100 TB shape: ONE hash-partition by key with an in-partition sort
    * shared by the lag (collapse), lead (close), and row_number (version)
    * — a single WindowExec; no self-join against the history. Output:
    * (key, attr, valid_from, valid_to, version), times as epoch seconds.
    */
  def scd2Intervals(df: DataFrame, key: Column, time: Column,
                    attr: Column): DataFrame = {
    // floor(micros / 1e6) mirrors DuckDB's floor(epoch(ts)) exactly (one
    // IEEE division + floor, identical in both engines)
    val base = df.select(key.as("key"),
      floor(unix_micros(time.cast("timestamp")) / lit(1000000.0))
        .cast("long").as("t"),
      attr.cast("string").as("attr"))
    val w = Window.partitionBy("key").orderBy("t", "attr")
    val changes = base
      .withColumn("__prev", lag(col("attr"), 1).over(w))
      .filter(col("__prev").isNull || col("__prev") =!= col("attr"))
    val w2 = Window.partitionBy("key").orderBy("t", "attr")
    changes
      .select(col("key"), col("attr"), col("t").as("valid_from"),
        lead(col("t"), 1).over(w2).as("valid_to"),
        row_number().over(w2).cast("long").as("version"))
  }
}
