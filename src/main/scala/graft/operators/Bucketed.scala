package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table ingest — the co-located-join half of the 100 TB design.
  *
  * The dedup/ANN pipelines repeatedly join corpus-scale frames on the same
  * key (doc_id, fingerprint, cell id). Shuffling 100 TB per join is the
  * dominant cost at scale; writing the corpus ONCE as a bucketed+sorted
  * table moves that shuffle to ingest: both sides of any subsequent
  * equi-join on the bucket column read already-hash-partitioned files and
  * the join plans with NO Exchange (and no sort, when sortBy matches).
  * This is Spark's native bucketing (`DataFrameWriter.bucketBy` +
  * metastore table), not a custom layout — any Spark reader gets the
  * shuffle elimination for free.
  *
  * BucketedJoinSpec asserts the property that matters: a self-join of two
  * tables written here contains zero shuffle exchanges in the executed
  * plan.
  */
object Bucketed {

  /** Write `df` as a bucketed, in-bucket-sorted managed parquet table.
    * Equi-joins/aggregations on `bucketCols` against any table bucketed
    * with the SAME column set and bucket count then run shuffle-free.
    * Bucket count rule of thumb at scale: total size / ~256 MB, rounded to
    * a power of two shared across the tables that join together. */
  def writeBucketed(df: DataFrame, table: String, numBuckets: Int,
                    bucketCols: Seq[String]): Unit = {
    require(bucketCols.nonEmpty, "need at least one bucket column")
    df.write
      .format("parquet")
      .mode("overwrite")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(table)
  }

  /** Read a bucketed table back (plain metastore read — the bucketing
    * metadata rides along and drives Exchange elimination). */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
