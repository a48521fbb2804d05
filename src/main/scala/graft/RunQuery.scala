package graft

/** Dev-loop runner: executes one or more registered queries at a fixture
  * dir and prints row counts + a result sample (the Verify/driver path
  * without the parquet dump). Usage:
  * `scripts/run_class.sh graft.RunQuery <sfDir> <queryName...>` */
object RunQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val rows = df.count()
      println(f"\n== $name: $rows rows in ${(System.nanoTime() - t0) / 1e9}%.2fs")
      df.show(20, truncate = false)
    }
    spark.stop()
  }
}
