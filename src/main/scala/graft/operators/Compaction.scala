package graft.operators

import org.apache.spark.sql.DataFrame
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
}
