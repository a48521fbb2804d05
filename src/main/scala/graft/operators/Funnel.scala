package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-funnel analytics over an event log — the product-analytics
  * "view → click → purchase" question: per user, the earliest completion of
  * an ordered step sequence where each step's event is STRICTLY after the
  * previous step's, optionally within a conversion window of the first
  * step.
  *
  * Semantics (the k-pass definition): t₁ = min ts of a step-1 event;
  * tᵢ = min ts of a step-i event with ts > tᵢ₋₁ (and ts ≤ t₁ + window when
  * a window is set). Implemented as ONE pass: per-user sorted event fold —
  * a single shuffle keyed by user, then an O(events-per-user) left-to-right
  * `aggregate` over the sorted (ts, step) array. A scan over the sorted
  * array accepts exactly the k-pass times: when the frontier is step i, the
  * first qualifying step-i event in ascending order IS the minimum.
  *
  * Scale shape: events project to (user, ts_us, step_idx) — 20 bytes/row —
  * before the shuffle; non-funnel events are filtered at the scan. State is
  * three scalars per user. Skewed users (bots with millions of events) are
  * bounded by the same per-key limits as any groupBy; cap upstream with
  * [[Selection]] group limits if a key can exceed memory.
  *
  * Output per user (every user in `events`, funnel participant or not):
  * steps_completed, first_us (t₁, -1 if none), last_us (time of the
  * deepest completed step, -1), convert_us (last_us - first_us when the
  * WHOLE funnel completed, else -1).
  */
object Funnel {

  /** Retention cohort table — the other standing product-analytics query:
    * users cohorted by first-seen day; for each (cohort day, day offset),
    * how many of the cohort were active and what fraction that is.
    *
    * Scale shape: three partial-aggregatable groupBys — (user) for cohort
    * assignment, (user, day) to collapse activity before anything joins
    * (events never reach the join), then (cohort, offset) for the final
    * cells. The user→cohort join is keyed on user id over two
    * already-aggregated inputs. Output is cohort-days × horizon rows —
    * tiny at any corpus size. */
  def retention(events: DataFrame, user: Column, ts: Column): DataFrame = {
    val base = events.select(user.cast("long").as("user_id"),
      to_date(ts).as("day"))
    val cohorts = base.groupBy("user_id").agg(min("day").as("cohort_day"))
    val sizes = cohorts.groupBy("cohort_day")
      .agg(count(lit(1)).as("n_cohort"))
    val active = base.distinct()
      .join(cohorts, Seq("user_id"))
      .groupBy(col("cohort_day"), datediff(col("day"), col("cohort_day"))
        .cast("long").as("offset_days"))
      .agg(count(lit(1)).as("n_active"))
    active.join(sizes, Seq("cohort_day"))
      .select(col("cohort_day").cast("string").as("cohort_day"),
        col("offset_days"), col("n_active"), col("n_cohort"),
        round(col("n_active").cast("double") / col("n_cohort").cast("double"), 6)
          .as("retention"))
  }

  def funnel(events: DataFrame, user: Column, ts: Column, step: Column,
             steps: Seq[String], windowUs: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    require(steps.distinct.size == steps.size, "funnel steps must be distinct")
    require(windowUs.forall(_ > 0), "conversion window must be positive")
    val k = steps.size
    val idx = steps.zipWithIndex
      .foldRight(lit(-1): Column) { case ((s, i), acc) =>
        when(step === lit(s), lit(i)).otherwise(acc)
      }
    val base = events.select(user.cast("long").as("user_id"),
      unix_micros(ts).as("ts_us"), idx.as("step_idx"))
    val funnelEvents = base.filter(col("step_idx") >= 0)
      .groupBy("user_id")
      .agg(array_sort(collect_list(struct(col("ts_us"), col("step_idx"))))
        .as("__evs"))
    // fold state: (filled steps, t1, time of deepest step)
    val zero = struct(lit(0).as("filled"), lit(-1L).as("first"),
      lit(-1L).as("last"))
    val folded = funnelEvents.select(col("user_id"),
      aggregate(col("__evs"), zero, (st, e) => {
        val filled = st.getField("filled")
        val first = st.getField("first")
        val last = st.getField("last")
        val ets = e.getField("ts_us")
        val eidx = e.getField("step_idx")
        val inWindow = windowUs match {
          case Some(w) => filled === 0 || ets <= first + lit(w)
          case None => lit(true)
        }
        val advances = filled < k && eidx === filled &&
          (filled === 0 || ets > last) && inWindow
        when(advances,
          struct((filled + 1).as("filled"),
            when(filled === 0, ets).otherwise(first).as("first"),
            ets.as("last")))
          .otherwise(st)
      }).as("__st"))
    events.select(user.cast("long").as("user_id")).distinct()
      .join(folded, Seq("user_id"), "left")
      .select(col("user_id"),
        coalesce(col("__st.filled"), lit(0)).cast("long").as("steps_completed"),
        coalesce(col("__st.first"), lit(-1L)).as("first_us"),
        coalesce(col("__st.last"), lit(-1L)).as("last_us"),
        when(coalesce(col("__st.filled"), lit(0)) === k,
          col("__st.last") - col("__st.first")).otherwise(lit(-1L))
          .as("convert_us"))
  }
}
