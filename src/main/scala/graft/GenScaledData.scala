package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bench-only fixture scaler: synthesizes an N× replica of a driver fixture
  * dir for throughput runs beyond the largest shipped scale (there is no
  * sf1 fixture). NOT oracle data — results are never hash-compared, only
  * timed (`SPARK_GRAFT_SF_DIR=target/sf1 run_class.sh graft.Bench`).
  *
  * Replication preserves WORKLOAD SHAPE, which is what the bench measures:
  *  - join keys are replica-offset consistently, so the star-schema fan
  *    (orders↔lineitem↔part/supplier/customer) keeps its selectivities;
  *  - dims (region/nation) stay single-copy, as real dims would;
  *  - document texts are re-tokenized per replica (every word suffixed) so
  *    dedup/dup-cluster structure matches the per-replica original — naive
  *    copies would make every doc a 10-way exact dup, turning the
  *    output-sized pair family (q28/q44/q66) into a dup explosion no real
  *    10× corpus has;
  *  - embeddings for r>0 are regenerated from a hash-derived uniform so
  *    replicas don't add cross-replica high-cosine pairs (scaling or small
  *    perturbations would — cosine is scale-invariant);
  *  - event ids stay near-dense (the featurizer's index contract) and
  *    replica timestamps shift by 40-day strides so time-window counts
  *    grow linearly like a real longer ingest.
  *
  * Usage: scripts/run_class.sh graft.GenScaledData <srcDir> <outDir> <copies>
  */
object GenScaledData {
  def main(args: Array[String]): Unit = {
    val Array(src, out, copiesS) = args
    val copies = copiesS.toInt
    require(copies >= 1)
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")

    def write(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$out/$t.parquet")

    def rep(mk: Int => DataFrame): DataFrame =
      (0 until copies).map(mk).reduce(_ unionByName _)

    for (t <- Seq("region", "nation")) write(Tables.load(spark, src, t), t)

    def maxOf(t: String, c: String): Long =
      Tables.load(spark, src, t).agg(max(col(c))).head().getLong(0) + 1

    val (kc, ks, kp, ko) = (maxOf("customer", "c_custkey"),
      maxOf("supplier", "s_suppkey"), maxOf("part", "p_partkey"),
      maxOf("orders", "o_orderkey"))

    write(rep(r => Tables.load(spark, src, "customer")
      .withColumn("c_custkey", col("c_custkey") + lit(r * kc))), "customer")
    write(rep(r => Tables.load(spark, src, "supplier")
      .withColumn("s_suppkey", col("s_suppkey") + lit(r * ks))), "supplier")
    write(rep(r => Tables.load(spark, src, "part")
      .withColumn("p_partkey", col("p_partkey") + lit(r * kp))), "part")
    write(rep(r => Tables.load(spark, src, "orders")
      .withColumn("o_orderkey", col("o_orderkey") + lit(r * ko))
      .withColumn("o_custkey", col("o_custkey") + lit(r * kc))), "orders")
    write(rep(r => Tables.load(spark, src, "lineitem")
      .withColumn("l_orderkey", col("l_orderkey") + lit(r * ko))
      .withColumn("l_partkey", col("l_partkey") + lit(r * kp))
      .withColumn("l_suppkey", col("l_suppkey") + lit(r * ks))), "lineitem")

    val ke = maxOf("events", "event_id")
    val ku = maxOf("events", "user_id")
    write(rep(r => Tables.load(spark, src, "events")
      .withColumn("event_id", col("event_id") + lit(r * ke))
      .withColumn("user_id", col("user_id") + lit(r * ku))
      .withColumn("ts", col("ts") + expr(s"INTERVAL ${r * 40} DAYS"))), "events")

    // Replica documents, r > 0 (round-6 density fix): the old
    // every-word-"~r" suffix re-rolled ALL token hashes per replica, and the
    // fixture's background pair-distance mass sits on a rising cliff right
    // at the SimHash radius (measured: 648 of 1,141 true pairs at hamming
    // exactly 7 on a 2× sf0.01 replica) — so each re-roll re-sampled that
    // borderline mass and true-pair counts exploded ~superlinearly (611k vs
    // 168 at the 10× sf0.1 bench). A REAL 10× corpus is bimodal instead:
    // genuine near-dups at tiny edit distance, unrelated docs far away. So:
    //  - background separation: every token still gets the per-replica
    //    vocab salt "~r" (no cross-replica shingle sharing), and ~1/3 of
    //    token POSITIONS additionally get a TEXT-keyed salt — unrelated
    //    docs stop sharing enough hash votes to sit near the radius,
    //    pushing the background well outside. The salt is keyed on the
    //    text (one xxhash64 of the full text per doc, then per-position),
    //    NOT on doc_id: identical texts get identical salts, so the base
    //    fixture's exact-duplicate groups survive replication (a doc_id
    //    key would give two copies of the same text different salts and
    //    silently zero out exact-dup density in every replica);
    //  - planted near-dups: every 30th doc's text becomes its base
    //    neighbor's (local id − 15) salted text + one appended token — a
    //    genuine small edit, hamming ≤ ~2 ROBUSTLY (one vote among ~n
    //    tokens, immune to hash re-rolls) — so the true-pair count is
    //    ~ndocs/30 per replica: linear in scale, matching the original
    //    fixture's density (168 pairs ≈ 5000/30 at sf0.1).
    val kd = maxOf("documents", "doc_id")
    write(rep { r =>
      val d = Tables.load(spark, src, "documents")
      if (r == 0) d.withColumn("doc_id", col("doc_id") + lit(r * kd))
      else {
        // the salt value is (text-hash, position)-hashed and SHORT
        // (≤3 digits): decorrelation comes from the per-doc position
        // pattern + values, and short salts keep replica char volume near
        // the original's (q14/q15 are char-linear). Hashing a precomputed
        // whole-text hash (not the text per position) keeps the transform
        // O(chars + positions) per doc.
        val saltedText = array_join(
          transform(split(col("text"), " "), (w, i) =>
            concat(w, lit(s"~$r"),
              when(pmod(xxhash64(col("__tsalt"), i), lit(3)) === 0,
                concat(lit("~"),
                  pmod(xxhash64(col("__tsalt"), i, lit(1)), lit(997))))
                .otherwise(lit("")))), " ")
        val salted = d.withColumn("__tsalt", xxhash64(col("text")))
          .withColumn("text",
            when(length(trim(col("text"))) === 0, col("text"))
              .otherwise(saltedText))
          .drop("__tsalt")
        val bases = salted
          .select((col("doc_id") + lit(15L)).as("doc_id"),
            col("text").as("__basetext"))
        salted.join(bases, Seq("doc_id"), "left")
          .withColumn("text",
            when(pmod(col("doc_id"), lit(30)) === 15 &&
                col("__basetext").isNotNull &&
                length(trim(col("__basetext"))) > 0,
              concat(col("__basetext"), lit(s" twin~$r")))
              .otherwise(col("text")))
          .drop("__basetext")
          .withColumn("doc_id", col("doc_id") + lit(r * kd))
          .withColumn("n_chars", length(col("text")))
      }
    }, "documents")

    val kv = maxOf("embeddings", "vec_id")
    write(rep { r =>
      val e = Tables.load(spark, src, "embeddings")
        .withColumn("vec_id", col("vec_id") + lit(r * kv))
      if (r == 0) e
      else e.withColumn("embedding",
        transform(sequence(lit(0), size(col("embedding")) - 1), i =>
          ((pmod(xxhash64(concat_ws("|", col("vec_id"), i, lit(r))),
            lit(2000001L)) - lit(1000000L)).cast("double") / lit(1e6))
            .cast("float")))
    }, "embeddings")

    println(s"[gen] wrote ${copies}x replica of $src to $out")
    spark.stop()
  }
}
