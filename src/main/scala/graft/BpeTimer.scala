package graft

import org.apache.spark.sql.functions._

import graft.operators.{CheckpointPolicy, Vocab}

/** Dev-loop timer for BPE training modes: runs sequential
  * [[Vocab.bpeTrain]] and batched [[Vocab.bpeTrainBatched]] cold on the
  * same fixture, asserts the merge tables are byte-identical, and prints
  * wall seconds + Spark job counts — the evidence behind the BENCH.md
  * training-pacing note. Usage:
  * `scripts/run_class.sh graft.BpeTimer <sfDir> [nMerges] [batch]` */
object BpeTimer {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val nMerges = args.lift(1).map(_.toInt).getOrElse(40)
    val batch = args.lift(2).map(_.toInt).getOrElse(32)
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, sfDir).localCheckpoint()
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    })
    def timed[A](label: String)(f: => A): A = {
      val j0 = jobs.get(); val t0 = System.nanoTime()
      val out = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.1f s, " +
        s"${jobs.get() - j0} jobs")
      out
    }
    val seq = timed(s"sequential bpeTrain($nMerges)")(
      Vocab.bpeTrain(docs, col("text"), nMerges, CheckpointPolicy.Local))
    val bat = timed(s"batched bpeTrainBatched($nMerges, batch=$batch)")(
      Vocab.bpeTrainBatched(docs, col("text"), nMerges, batch,
        CheckpointPolicy.Local))
    require(seq == bat, "merge tables diverged — batched training is wrong")
    println(s"byte-identical merge tables: ${seq.size} merges")
    spark.stop()
  }
}
