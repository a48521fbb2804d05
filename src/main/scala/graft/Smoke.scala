package graft


/** Driver-contract smoke: `SparkEntry.entry` must return rows > 0 at
  * sf0.001 (mirrors the driver's t0 gate). */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val n = SparkEntry.entry(spark).count()
    println(s"[smoke] entry rows = $n")
    assert(n > 0, "entry returned no rows")
    spark.stop()
  }
}
