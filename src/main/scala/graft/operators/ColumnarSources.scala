package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** ORC read/write — the second columnar format large estates actually hold
  * (Hive-era lakes are ORC; parquet and ORC routinely coexist in one 100 TB
  * ingest). Spark's native `orc` source shares the vectorized reader,
  * predicate pushdown (`spark.sql.orc.filterPushdown`, default true — the
  * scan carries a `pushedFilters` search argument evaluated against ORC
  * row-group/stripe statistics), column pruning, and partition discovery
  * with the parquet path, so every downstream operator in this library is
  * format-agnostic; these helpers pin the two details that differ:
  *
  *  - reads are SCHEMA-ENFORCED, never inferred (the [[TextSources]]
  *    posture): a drifted file errors loudly at analysis instead of
  *    silently widening types downstream;
  *  - writes sort within partitions by the caller's layout columns so ORC
  *    stripe min/max statistics are tight — the same reason
  *    [[Layout]] z-orders parquet: pushdown only skips stripes whose
  *    statistics exclude the predicate.
  */
object ColumnarSources {

  /** Write `df` as ORC at `path`, sorted within partitions by `layoutCols`
    * (empty = keep the incoming order) for tight stripe statistics. */
  def writeOrc(df: DataFrame, path: String, layoutCols: Seq[String] = Nil): Unit = {
    val laid =
      if (layoutCols.isEmpty) df
      else df.sortWithinPartitions(layoutCols.map(org.apache.spark.sql.functions.col): _*)
    laid.write.mode("overwrite").orc(path)
  }

  /** Schema-enforced ORC scan: pushdown/pruning-eligible, inference-free. */
  def readOrc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)
}
