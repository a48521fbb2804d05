package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Functional-chain resolution — the wiki REDIRECT pass ([[WikiXml]]
  * surfaces `<redirect>` targets; a corpus build must map every
  * redirect to its final content page), and the same shape covers alias
  * tables, canonical-URL chains, and merged-entity maps.
  *
  * The input is a FUNCTIONAL edge set (one `dst` per `src`). The naive
  * resolution walks one step per join — O(longest chain) shuffles,
  * which at 100 TB means a driver-scheduled loop as long as the worst
  * chain. This implementation uses POINTER DOUBLING instead: each round
  * composes the partial map with itself (`src→dst` ⋈ `dst→dst2` ⇒
  * `src→dst2`, depths adding), so chains of length ≤ 2^k resolve in k
  * self-joins — O(log maxDepth) shuffles total, each one a plain
  * long-keyed equi-join Catalyst plans as a shuffle hash join.
  *
  * Termination: a row is resolved when its current `dst` is not itself
  * a redirect source. Cycles (A→B→A) and chains longer than `maxDepth`
  * never reach such a `dst`; they report `terminated = 0` with
  * `final_dst`/`depth` masked to -1 (deterministic output, no infinite
  * loop — the doubling round count is fixed up front). Per-round
  * [[CheckpointPolicy]] pins keep the self-join lineage linear, the
  * iterative-operator house convention.
  *
  * q163 gates resolution over a planted chain grid (depths 1-3, a
  * 2-cycle class) against a closed-form oracle.
  */
object Redirects {

  /** Resolve every chain: (src, final_dst, depth, terminated). `edges`
    * must be functional on `src`; `maxDepth` bounds the resolvable
    * chain length (rounded up to the next power of two). */
  def resolve(edges: DataFrame, srcCol: String, dstCol: String,
              maxDepth: Int = 32,
              policy: CheckpointPolicy = CheckpointPolicy.Local): DataFrame = {
    require(maxDepth >= 1, s"maxDepth >= 1: $maxDepth")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    var m = policy.pin(e.withColumn("depth", lit(1L)))
    val rounds = 32 - Integer.numberOfLeadingZeros(math.max(1, maxDepth - 1))
    for (_ <- 0 until rounds) {
      val a = m.select(col("src"), col("dst"), col("depth"))
      val b = m.select(col("src").as("__bs"), col("dst").as("__bd"),
        col("depth").as("__bdep"))
      m = policy.pin(a.join(b, col("dst") === col("__bs"), "left")
        .select(col("src"),
          coalesce(col("__bd"), col("dst")).as("dst"),
          (col("depth") + coalesce(col("__bdep"), lit(0L))).as("depth")))
    }
    // resolved ⇔ the final dst is not itself a source
    val srcs = e.select(col("src").as("__s")).distinct()
    m.join(srcs, col("dst") === col("__s"), "left")
      .select(col("src"),
        when(col("__s").isNull, col("dst")).otherwise(lit(-1L))
          .as("final_dst"),
        when(col("__s").isNull, col("depth")).otherwise(lit(-1L))
          .as("depth"),
        col("__s").isNull.cast("long").as("terminated"))
  }
}
