package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Plan-shaping helpers. */
object PlanOps {

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
