package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss random projection with Rademacher (±1) entries
  * (Achlioptas 2003, "Database-friendly random projections" — public
  * method): `proj_j = Σ_i emb_i · s(i,j) / √d'` where each sign is a
  * deterministic md5 coin. The embedding-compression scale path: at
  * 100 TB an ANN / semantic-dedup pass over 64-float vectors pays 4× the
  * shuffle and memory of a 16-float projection whose pairwise distances
  * are preserved to JL distortion — project once at ingest, run the
  * bucketed passes ([[Dedup.embeddingNearDupPairs]], [[Ann]]) in the
  * compressed space, verify survivors in the original space.
  *
  * Everything is engine-portable: the sign matrix is md5 bits (no seeds,
  * no RNG state), elements widen float→double exactly, and each output
  * coordinate is ONE left-fold over the zipped (value, sign) array — the
  * identical association a SQL `list_reduce` replays, so projections
  * hash-match bit for bit cross-engine (q150).
  *
  * 100 TB shape: the sign matrix is (inDim × outDim) literals baked into
  * the projection expressions — no join, no broadcast, no shuffle; the
  * projection is a pure map inside whole-stage codegen, scan-speed. */
object RandomProjection {

  /** Deterministic Rademacher sign for matrix cell (i, j) under `salt`:
    * +1 iff the top bit of md5("i:j|salt") is set — the same bit the SQL
    * replay reads as `first hex digit >= 8`. */
  def sign(i: Int, j: Int, salt: String): Double = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$i:$j|$salt".getBytes("UTF-8"))
    if ((d(0) & 0x80) != 0) 1.0 else -1.0
  }

  /** The full (inDim × outDim) sign matrix, row i = input coordinate
    * (1-based in the hash key, matching SQL's 1-based list indexing). */
  def signMatrix(inDim: Int, outDim: Int, salt: String): Array[Array[Double]] =
    Array.tabulate(inDim, outDim)((i, j) => sign(i + 1, j + 1, salt))

  /** Project `emb` (array<float|double>, fixed length `inDim`) to
    * `outDim` coordinates. Output: (id, proj array<double>, norm_ratio)
    * where `norm_ratio = ‖proj‖² / ‖emb‖²` — the per-row JL distortion
    * witness (expectation 1 by construction; NULL when ‖emb‖² = 0).
    * Both the projection folds and the ratio folds are left-assoc
    * aggregates over the array order, replayable verbatim. */
  def project(df: DataFrame, id: Column, emb: Column,
              inDim: Int, outDim: Int, salt: String = "jl"): DataFrame = {
    require(inDim >= 1 && outDim >= 1, "dims must be >= 1")
    val s = signMatrix(inDim, outDim, salt)
    val e = emb.cast("array<double>")
    val scale = math.sqrt(outDim.toDouble)
    def fold(arr: Column): Column =
      aggregate(arr, lit(0.0), (acc, x) => acc + x)
    val projCols = (0 until outDim).map { j =>
      val signsJ = array((0 until inDim).map(i => lit(s(i)(j))): _*)
      (fold(zip_with(col("__e"), signsJ, (x, sg) => x * sg)) / lit(scale))
        .as(s"__p$j")
    }
    val base = df.select(id.as("id"), e.as("__e"))
      .withColumn("__en", fold(transform(col("__e"), x => x * x)))
      .select(col("id") +: col("__en") +: projCols: _*)
    val pn = fold(transform(array((0 until outDim).map(j => col(s"__p$j")): _*),
      x => x * x))
    base.select(col("id"),
      array((0 until outDim).map(j => col(s"__p$j")): _*).as("proj"),
      when(col("__en") > 0.0, pn / col("__en")).as("norm_ratio"))
  }
}
