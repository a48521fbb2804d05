package graft

import graft.functions.VectorExprs
import org.apache.spark.sql.functions._

class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  GraftExtensions.register(spark)

  test("SQL graft_cosine / graft_dot match the Column API on the embeddings fixture") {
    // filter, not limit: an unordered limit is partition-order dependent,
    // and the SQL/Column plans must read the SAME rows
    val emb = Tables.embeddings(spark, sf001).filter("vec_id < 50")
    emb.createOrReplaceTempView("__ext_emb")
    val viaSql = spark.sql(
      """SELECT a.vec_id AS qa, b.vec_id AS qb,
                graft_cosine(a.embedding, b.embedding) AS cos,
                graft_dot(a.embedding, b.embedding) AS dot
         FROM __ext_emb a JOIN __ext_emb b ON a.vec_id < b.vec_id
         ORDER BY qa, qb LIMIT 40""").collect()
    // Column callers cast once per scan (the kernel contract); the SQL
    // surface does the same coercion inside the builder
    val e2 = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val viaCol = e2.as("a").join(e2.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("qa"), col("b.vec_id").as("qb"),
        VectorExprs.cosine(col("a.embedding"), col("b.embedding")).as("cos"),
        VectorExprs.dot(col("a.embedding"), col("b.embedding")).as("dot"))
      .orderBy("qa", "qb").limit(40).collect()
    viaSql.zip(viaCol).foreach { case (s, c) =>
      assert(s.getLong(0) == c.getLong(0) && s.getLong(1) == c.getLong(1))
      assert(s.getDouble(2) == c.getDouble(2), "cosine must be bit-identical")
      assert(s.getDouble(3) == c.getDouble(3), "dot must be bit-identical")
    }
  }

  test("SQL graft_simhash64 and graft_token_stats match the Column API on documents") {
    Tables.documents(spark, sf001).filter("doc_id < 30").createOrReplaceTempView("__ext_docs")
    val viaSql = spark.sql(
      """SELECT doc_id, graft_simhash64(split(lower(text), '\\s+')) AS sh,
                graft_token_stats(split(lower(text), '\\s+')).n_tokens AS nt
         FROM __ext_docs ORDER BY doc_id""").collect()
    val toks = split(lower(col("text")), "\\s+")
    val viaCol = spark.table("__ext_docs")
      .select(col("doc_id"), VectorExprs.simhash64(toks).as("sh"),
        VectorExprs.tokenStats(toks, graft.functions.TextOps.EnglishStopwords)
          .getField("n_tokens").as("nt"))
      .orderBy("doc_id").collect()
    viaSql.zip(viaCol).foreach { case (s, c) =>
      assert(s.getLong(1) == c.getLong(1) && s.getLong(2) == c.getLong(2))
    }
  }

  test("SQL shingle/intersect kernels compose into a Jaccard expression") {
    val r = spark.sql(
      """SELECT graft_sorted_intersect_size(
                  graft_char_ngrams64('abcabc', 3),
                  graft_char_ngrams64('abcabd', 3)) AS isz,
                size(graft_char_ngrams64('abcabc', 3)) AS na,
                graft_word_shingles64(array('a','b','c','a','b','c'), 2) AS ws""").head()
    // distinct 3-grams of "abcabc": abc, bca, cab (abc repeats) -> 3
    assert(r.getInt(1) == 3)
    // "abcabd": abc, bca, cab, abd -> shares {abc, bca, cab} minus... exactly
    // the grams of the common prefix: abc, bca shared; cab vs cab shared
    assert(r.getInt(0) >= 2 && r.getInt(0) <= 3)
    // 2-shingles of a b c a b c: "a b","b c","c a" distinct -> 3
    assert(r.getSeq[Long](2).length == 3)
  }

  test("non-literal width arguments fail loudly at plan time") {
    Tables.documents(spark, sf001).limit(1).createOrReplaceTempView("__ext_bad")
    val e = intercept[Exception](
      spark.sql("SELECT graft_char_ngrams64(text, length(text)) FROM __ext_bad").head())
    assert(e.getMessage.contains("INT literal") ||
      e.getCause != null && e.getCause.getMessage.contains("INT literal"))
  }

  test("non-numeric array inputs are an analysis-time type error, not nulls") {
    // the kernels read doubles from array storage; ExpectsInputTypes must
    // reject array<string> at analysis (the old blind Cast nulled it out)
    val e = intercept[org.apache.spark.sql.AnalysisException](
      spark.sql("SELECT graft_dot(array('a','b'), array('c','d'))").head())
    assert(e.getMessage.contains("DATATYPE_MISMATCH") ||
      e.getMessage.toLowerCase.contains("type"))
  }

  test("registration is idempotent and visible in SHOW FUNCTIONS") {
    GraftExtensions.register(spark) // second time: overwrite, no throw
    val fns = spark.sql("SHOW USER FUNCTIONS LIKE 'graft_*'")
      .as[String].collect().toSet
    assert(GraftExtensions.descriptions.map(_._1.funcName).toSet
      .subsetOf(fns.map(_.stripPrefix("spark_catalog.default."))))
  }
}
