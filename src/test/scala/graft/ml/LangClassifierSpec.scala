package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LangClassifierSpec extends SparkSpec {
  import spark.implicits._

  test("charNgrams: exact sweep, short and null inputs empty") {
    val df = Seq(("abcd"), ("ab"), ("a"), ("")).toDF("t")
      .select(col("t"), LangClassifier.charNgrams(col("t"), 3).as("g"))
    val got = df.collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(got("abcd") == Seq("abc", "bcd"))
    assert(got("ab").isEmpty && got("a").isEmpty && got("").isEmpty)
    val withNull = Seq((1, null: String)).toDF("i", "t")
      .select(LangClassifier.charNgrams(col("t"), 2).as("g"))
      .collect()(0).getSeq[String](0)
    assert(withNull.isEmpty)
    // 2-grams over CJK count CHARACTERS, not bytes
    val cjk = Seq("中文字").toDF("t")
      .select(LangClassifier.charNgrams(col("t"), 2).as("g"))
      .collect()(0).getSeq[String](0)
    assert(cjk == Seq("中文", "文字"))
  }

  private def plantedCorpus(n: Int, mixFrac: Int = 0) = {
    val langs = LangPlant.langs
    val rnd = new scala.util.Random(11)
    // shared boilerplate + the planted phrase — the q137 shape in miniature
    val boiler = Vector("table scan join filter agg hash group order key",
      "batch stream window merge sort row column value query part")
    (0 until n).map { i =>
      val code = langs(i % langs.size)
      val noise = Seq.fill(3)(boiler(rnd.nextInt(boiler.size))).mkString(" ")
      (i.toLong, s"$noise ${LangPlant.planted(code)}", (i % langs.size).toDouble, code)
    }.toDF("doc_id", "ptext", "lidx", "code")
  }

  test("planted languages are recovered on a held-out fold, all classes") {
    val d = plantedCorpus(150)
    val gate = LangClassifier.holdoutGatePerClass(
      d, col("doc_id"), col("ptext"), col("lidx"), LangPlant.langs)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(gate.map(_._1).toSeq == LangPlant.langs, "one row per class, sorted")
    gate.foreach { case (code, nTrain, nTest, ok) =>
      assert(nTrain + nTest == 30L, s"$code fold sizes")
      assert(ok == 1L, s"$code recall flag")
    }
  }

  test("confidence separates clean from mixed-language docs") {
    val langs = LangPlant.langs
    val train = plantedCorpus(150)
    val feat = LangClassifier.featurize(
      train, col("doc_id"), col("ptext"), col("lidx"))
    val model = LangClassifier.train(feat.localCheckpoint(true))
    // clean eval docs vs 50/50 mixed-language docs (two phrases spliced)
    val clean = (0 until 40).map { i =>
      (i.toLong, LangPlant.planted(langs(i % langs.size)), 0.0) }
    val mixed = (0 until 40).map { i =>
      val a = langs(i % langs.size); val b = langs((i + 1) % langs.size)
      (100L + i, s"${LangPlant.phrases(a)} ${LangPlant.phrases(b)} " +
        s"${LangPlant.phrases(a)} ${LangPlant.phrases(b)}", 0.0)
    }
    def meanConf(rows: Seq[(Long, String, Double)]): Double = {
      val f = LangClassifier.featurize(rows.toDF("doc_id", "ptext", "lidx"),
        col("doc_id"), col("ptext"), col("lidx"))
      LangClassifier.score(model, f).agg(avg("confidence")).head().getDouble(0)
    }
    val (cc, mc) = (meanConf(clean), meanConf(mixed))
    assert(cc > 0.9, s"clean docs should be confidently classified: $cc")
    assert(cc - mc > 0.1,
      s"mixed-language docs must read less confident: clean $cc vs mixed $mc")
  }
}
