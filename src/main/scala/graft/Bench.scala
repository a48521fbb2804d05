package graft
import org.apache.spark.sql.functions._
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    // Warm the session so the first measured query doesn't absorb one-time
    // costs: codegen/JIT compilation, parquet footer+page readers for EVERY
    // fixture table (the first documents scan alone was ~17 s of apparent
    // "query time" in cold runs), and the regex/HOF/hash/window expression
    // classes the suite leans on.
    try {
      spark.range(1000).selectExpr("sum(id)").collect()
      for (t <- Seq("region", "nation", "customer", "supplier", "part",
                    "orders", "lineitem", "events", "documents", "embeddings"))
        Tables.load(spark, sfDir, t).count()
      Tables.load(spark, sfDir, "documents")
        .select(col("doc_id"), lower(col("text")).as("t"))
        .limit(200)
        .select(
          md5(regexp_replace(col("t"), "[^a-z0-9 ]", "").cast("binary")).as("m"),
          xxhash64(col("t")).as("x"),
          size(filter(split(trim(col("t")), "\\s+"), w => length(w) > 2)).as("f"),
          aggregate(split(trim(col("t")), "\\s+"), lit(0L),
            (acc, w) => acc + length(w)).as("a"))
        // double-sum the hashes: ANSI mode makes sum(random longs) an
        // ARITHMETIC_OVERFLOW, which aborted the whole warmup block mid-run
        .agg(count(col("m")), sum(col("x").cast("double")),
          sum(col("f")), sum(col("a")))
        .collect()
      val ev = Tables.load(spark, sfDir, "events")
        .select(col("event_id"), col("value")).limit(20000)
      ev.withColumn("s", sum("value").over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(pmod(col("event_id"), lit(8))).orderBy("event_id")
            .rowsBetween(-5, 0)))
        .agg(sum("s")).collect()
    } catch { case e: Throwable =>
      System.err.println(s"BENCH WARMUP FAIL: ${e.getClass.getName}: ${e.getMessage}")
    }
    var failed = List.empty[String]
    // The host carries heavy external load (observed ~2x inflation on
    // identical code); report steady-state as the MIN of `reps` runs,
    // skipping re-runs for sub-0.3 s queries where noise can't matter.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt.max(1)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        // queryExecution.toRdd runs the plan AS WRITTEN: df.count() would
        // let Catalyst prune every computed column that doesn't affect
        // cardinality, under-measuring pure-projection queries.
        try { fn(spark, sfDir).queryExecution.toRdd.count() }
        catch { case e: Throwable =>
          if (!failed.contains(name)) failed ::= name
          System.err.println(s"BENCH FAIL $name: ${e.getClass.getName}: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }
      var best = once()
      var r = 1
      while (r < reps && best > 0.3) { best = math.min(best, once()); r += 1 }
      name -> best
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val failedJson = failed.reverse.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
