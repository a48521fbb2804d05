package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality profiling and validation rules — the "quality assessment"
  * surface generalized to relational tables (BASELINE.json north star).
  *
  * `profile` computes per-column statistics in ONE aggregate pass over the
  * table (a single scan regardless of column count); `validate` evaluates a
  * rule set in one pass, emitting a violations count per rule.
  */
object Profiling {

  /** Per-column profile: rows, nulls, null_rate, distinct (exact),
    * min/max/mean as strings (type-erased for a uniform tall schema).
    * One wide aggregate → one scan + one 1-row result. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"__cnt_$c"),
          count_distinct(col(c)).as(s"__dst_$c"),
          min(col(c)).cast("string").as(s"__min_$c"),
          max(col(c)).cast("string").as(s"__max_$c"))
    }
    val total = count(lit(1)).as("__total")
    val wide = df.agg(total, aggs: _*)
    // pivot the single wide row to a tall (column, metric...) table
    val stacked = cols.map { c =>
      struct(lit(c).as("col_name"),
        col("__total").as("n_rows"),
        (col("__total") - col(s"__cnt_$c")).as("n_nulls"),
        round((col("__total") - col(s"__cnt_$c")).cast("double") / col("__total"), 6).as("null_rate"),
        col(s"__dst_$c").as("n_distinct"),
        col(s"__min_$c").as("min_value"),
        col(s"__max_$c").as("max_value"))
    }
    wide.select(explode(array(stacked: _*)).as("p")).select("p.*")
  }

  /** A validation rule: named boolean predicate that each row should pass. */
  case class Rule(name: String, predicate: Column)

  def notNull(c: String): Rule = Rule(s"not_null_$c", col(c).isNotNull)
  def inRange(c: String, lo: Double, hi: Double): Rule =
    Rule(s"range_$c", col(c).isNotNull && col(c) >= lo && col(c) <= hi)
  def matches(c: String, regex: String): Rule =
    Rule(s"regex_$c", col(c).isNotNull && col(c).rlike(regex))
  def nonNegative(c: String): Rule = Rule(s"non_negative_$c", col(c).isNotNull && col(c) >= 0)

  /** Evaluate all rules in ONE pass: each rule is a conditional-count
    * aggregate; output one row per rule (rule, violations, n_rows,
    * violation_rate). */
  def validate(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val aggs = rules.map(r =>
      count(when(!coalesce(r.predicate, lit(false)), 1)).as(s"__v_${r.name}"))
    val wide = df.agg(count(lit(1)).as("__total"), aggs: _*)
    val stacked = rules.map { r =>
      struct(lit(r.name).as("rule"),
        col(s"__v_${r.name}").as("violations"),
        col("__total").as("n_rows"),
        round(col(s"__v_${r.name}").cast("double") / col("__total"), 6).as("violation_rate"))
    }
    wide.select(explode(array(stacked: _*)).as("v")).select("v.*")
  }

  /** Key-uniqueness check: duplicate key values with their multiplicities.
    * Hash-aggregate on the key columns only. */
  def duplicateKeys(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("dups"))
      .filter(col("dups") > 1)

  /** Robust per-column outlier scan: median/MAD z-scores (Iglewicz-Hoaglin;
    * 1.4826·MAD estimates σ under normality), which — unlike mean/stddev
    * scoring — don't let the outliers drag their own threshold. Three full
    * passes, each ONE aggregate over all columns (exact medians via
    * `percentile`): medians → MADs (|x−median| medians) → outlier counts.
    * Tall output: (column, median, mad, n_outliers). At 100 TB swap the
    * exact percentiles for `percentile_approx` (q48 gates that the sketch
    * tracks the exact value). */
  def robustOutliers(df: DataFrame, cols: Seq[String],
                     z: Double = 3.5): DataFrame = {
    val medAggs = cols.map(c => expr(s"percentile($c, 0.5)"))
    val medRow = df.agg(medAggs.head, medAggs.tail: _*).head()
    val med = cols.indices.map(medRow.getDouble).toArray
    val madAggs = cols.zipWithIndex.map { case (c, i) =>
      expr(s"percentile(abs($c - ${med(i)}), 0.5)")
    }
    val madRow = df.agg(madAggs.head, madAggs.tail: _*).head()
    val mad = cols.indices.map(madRow.getDouble).toArray
    val cntAggs = cols.zipWithIndex.map { case (c, i) =>
      sum(when(abs(col(c) - med(i)) > z * 1.4826 * mad(i), 1L).otherwise(0L))
    }
    val cntRow = df.agg(cntAggs.head, cntAggs.tail: _*).head()
    val rows = cols.zipWithIndex.map { case (c, i) =>
      struct(lit(c).as("column"),
        round(lit(med(i)), 6).as("median"),
        round(lit(mad(i)), 6).as("mad"),
        lit(cntRow.getLong(i)).as("n_outliers"))
    }
    df.sparkSession.range(1)
      .select(explode(array(rows: _*)).as("v")).select("v.*")
  }
}
