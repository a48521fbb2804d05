package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Plan-shaping helpers. */
object PlanOps {

  /** Run independent driver-submitted Spark jobs as concurrent futures on a
    * DEDICATED bounded pool and await them with a FINITE deadline.
    *
    * Never `ExecutionContext.Implicits.global` + `Await(Inf)` for this: the
    * global pool is shared with everything else on the driver (wide column
    * lists would starve it), and an infinite await on a hung job blocks
    * query CONSTRUCTION forever. The deadline scales with how many pool
    * "waves" the task list needs (`perTask × ceil(n/parallelism)`), so a
    * 100-column exact profile gets a proportionally longer budget than a
    * 4-column one; a genuinely wedged job surfaces as a TimeoutException
    * with the task index instead of a silent hang. */
  def runJobs[T](tasks: Seq[() => T], parallelism: Int = 16,
                 perTask: scala.concurrent.duration.FiniteDuration =
                   scala.concurrent.duration.Duration(10, "min")): Seq[T] = {
    import java.util.concurrent.{Executors, TimeoutException}
    import scala.concurrent.{Await, ExecutionContext, Future}
    if (tasks.isEmpty) return Nil
    val threads = math.max(1, math.min(parallelism, tasks.size))
    val pool = Executors.newFixedThreadPool(threads)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
    try {
      val budget = perTask * math.ceil(tasks.size.toDouble / threads).toLong
      val futs = tasks.map(t => Future(t()))
      futs.zipWithIndex.map { case (f, i) =>
        try Await.result(f, budget)
        catch {
          case _: TimeoutException => throw new TimeoutException(
            s"concurrent job $i of ${tasks.size} exceeded $budget")
        }
      }
    } finally pool.shutdown()
  }

  /** Pin a computed per-pair score so a later threshold filter CANNOT be
    * pushed back into the join that produced the pairs.
    *
    * Catalyst's PushDownPredicate substitutes project aliases into filters
    * with no cost model, so `join → project(score = f(arrays)) →
    * filter(score ≥ t)` re-inlines `f` into the join CONDITION — every
    * reference of the alias becomes its own interpreted evaluation per
    * joined row (observed: a Jaccard threshold evaluating the full
    * array_intersect 3x per pair inside a BroadcastHashJoin condition,
    * ~50x slower). An always-true nondeterministic filter is NOT a reliable
    * barrier (Spark 4 folds rand() bound comparisons), but an Aggregate is:
    * predicates on an aggregate output never push below it. Pairs are
    * unique by (keys), so max(score) is the identity; the aggregate
    * shuffles only (keys, score) — a few dozen bytes per pair.
    */
  def pinPairScore(df: DataFrame, keys: Seq[String], scoreCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(max(col(scoreCol)).as(scoreCol))
}
