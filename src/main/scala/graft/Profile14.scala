package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Round-14 scratch stage profiler (guide §1: measure first, noop sink,
  * labeled jobs). Times named sub-stages of the heavy queries so the
  * optimization targets the operator that actually burns the seconds.
  * Usage: run_class.sh graft.Profile14 <sfDir> [stageSubstr...] */
object Profile14 {
  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val only = args.drop(1).toSeq
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")

    def stage(name: String)(body: => Unit): Unit = {
      if (only.nonEmpty && !only.exists(name.contains)) return
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime()
      body
      println(f"STAGE $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      spark.sparkContext.setJobDescription(null)
    }

    // warm the session like Bench does (parquet footers, codegen)
    Tables.load(spark, sfDir, "documents").count()
    Tables.load(spark, sfDir, "lineitem").count()
    Tables.load(spark, sfDir, "orders").count()
    Tables.load(spark, sfDir, "customer").count()

    stage("q131_full")(noop(SparkEntry.queries("q131_fuzzy_name_pairs")(spark, sfDir)))
    stage("q131_full_warm")(noop(SparkEntry.queries("q131_fuzzy_name_pairs")(spark, sfDir)))
    locally {
      import org.apache.spark.sql.functions._
      val w = Tables.customer(spark, sfDir)
        .select(col("c_name").cast("string").as("word"))
        .filter(col("word").isNotNull).distinct()
      val keyed = w.select(col("word"),
          posexplode(transform(sequence(lit(1), length(col("word"))), i =>
            concat(col("word").substr(lit(1), i - 1),
              col("word").substr(i + 1, length(col("word"))))))
            .as(Seq("pos", "key")))
        .distinct()
      stage("q131_keyed_only")(noop(keyed))
      locally {
        val keyed2 = w.select(col("word"), explode(concat(
            transform(sequence(lit(1), length(col("word")) + 1), i =>
              struct(i.as("pos"), col("word").as("key"))),
            transform(sequence(lit(1), length(col("word"))), i =>
              struct(i.as("pos"),
                concat(col("word").substr(lit(1), i - 1),
                  col("word").substr(i + 1, length(col("word")))).as("key")))))
            .as("pk"))
          .select(col("pk.pos").as("pos"), col("pk.key").as("key"), col("word"))
          .distinct()
        stage("q131_v2_keyed")(noop(keyed2))
        val buckets = keyed2.groupBy("pos", "key")
          .agg(sort_array(collect_list(col("word"))).as("ws"))
          .filter(size(col("ws")) > 1)
        stage("q131_v2_buckets")(noop(buckets))
        val pairs = buckets.select(explode(flatten(transform(col("ws"), (x, i) =>
            transform(slice(col("ws"), i + lit(2), size(col("ws")) - i - 1), y =>
              struct(x.as("a"), y.as("b")))))).as("p"))
          .select(col("p.a").as("word_a"), col("p.b").as("word_b"))
          .filter(levenshtein(col("word_a"), col("word_b")) <= 1)
          .distinct()
        stage("q131_v2_pairs")(noop(pairs))
        stage("q131_v2_sorted")(noop(pairs.orderBy("word_a", "word_b")))
      }
      val subs = keyed.select(col("pos"), col("key"), col("word").as("word_a"))
        .join(keyed.select(col("pos"), col("key"), col("word").as("word_b")),
          Seq("pos", "key"))
      stage("q131_subs_join")(noop(subs))
      val filt = subs.filter(col("word_a") < col("word_b") &&
        levenshtein(col("word_a"), col("word_b")) <= 1)
      stage("q131_subs_lev")(noop(filt))
      stage("q131_subs_distinct")(noop(filt.select("word_a", "word_b").distinct()))
    }

    stage("q137_full")(noop(SparkEntry.queries("q137_langid_trained")(spark, sfDir)))
    stage("q137_full_warm")(noop(SparkEntry.queries("q137_langid_trained")(spark, sfDir)))
    locally {
      import org.apache.spark.sql.functions._
      import graft.ml.{LangClassifier, LangPlant}
      val langs = LangPlant.langs
      val idx = pmod(col("doc_id"), lit(5)).cast("int")
      val phrase = langs.zipWithIndex
        .foldLeft(lit(""): org.apache.spark.sql.Column) { case (acc, (code, i)) =>
          when(idx === i, lit(LangPlant.planted(code))).otherwise(acc) }
      val planted = Tables.documents(spark, sfDir)
        .select(col("doc_id"),
          concat_ws(" ", substring(coalesce(col("text"), lit("")), 1, 256),
            phrase).as("ptext"),
          idx.cast("double").as("lidx"))
      val feat = LangClassifier.featurize(planted, col("doc_id"),
        col("ptext"), col("lidx"))
      stage("q137_featurize")(noop(feat))
      val bound = planted.select(col("doc_id"),
        lower(coalesce(col("ptext"), lit(""))).as("lctext"),
        col("lidx").cast("double").as("label"))
      stage("q137_bound")(noop(bound))
      val base = bound.select(col("doc_id"),
        concat(LangClassifier.charNgrams(col("lctext"), 2),
          LangClassifier.charNgrams(col("lctext"), 3)).as("cgrams"),
        col("label"))
      stage("q137_cgrams")(noop(base))
      stage("q137_hashtf") {
        noop(new org.apache.spark.ml.feature.HashingTF()
          .setInputCol("cgrams").setOutputCol("features")
          .setNumFeatures(4096).transform(base))
      }
      val split = graft.operators.Mixture.hashSplit(feat, col("doc_id"),
        Seq("train" -> 0.8, "test" -> 0.2))
      val fitParts = math.max(2, spark.sparkContext.defaultParallelism / 8)
      var train0: DataFrame = null
      var test0: DataFrame = null
      stage("q137_split_pin") {
        train0 = split.filter(col("split") === "train")
          .coalesce(fitParts).localCheckpoint(true)
        test0 = split.filter(col("split") === "test").localCheckpoint(true)
      }
      var model: org.apache.spark.ml.classification.LogisticRegressionModel = null
      stage("q137_fit") { model = LangClassifier.train(train0, maxIter = 20) }
      if (model != null)
        println("  q137 fit totalIterations=" + model.summary.totalIterations)
      stage("q137_score")(noop(LangClassifier.score(model, test0)))
      for (mi <- Seq(4, 6, 8, 10) if model != null) {
        var m2: org.apache.spark.ml.classification.LogisticRegressionModel = null
        stage(s"q137_fit_mi$mi") { m2 = LangClassifier.train(train0, maxIter = mi) }
        val acc = LangClassifier.score(m2, test0)
          .groupBy("label")
          .agg(avg(when(col("pred") === col("label").cast("long"), 1.0)
            .otherwise(0.0)).as("recall"))
          .orderBy("label").collect()
        println(s"  maxIter=$mi per-class recall: " +
          acc.map(r => f"${r.getDouble(1)}%.4f").mkString(" "))
      }
    }

    stage("q141_full")(noop(SparkEntry.queries("q141_exact_substring_dedup")(spark, sfDir)))
    stage("q141_full_warm")(noop(SparkEntry.queries("q141_exact_substring_dedup")(spark, sfDir)))

    stage("q123_graph_only") {
      noop(graft.operators.LinkAnalysis.purchaseGraph(
        Tables.lineitem(spark, sfDir), Tables.orders(spark, sfDir)))
    }
    stage("q123_full")(noop(SparkEntry.queries("q123_pagerank")(spark, sfDir)))
    stage("q123_full_warm")(noop(SparkEntry.queries("q123_pagerank")(spark, sfDir)))

    stage("q128_full")(noop(SparkEntry.queries("q128_triangle_count")(spark, sfDir)))
    stage("q128_full_warm")(noop(SparkEntry.queries("q128_triangle_count")(spark, sfDir)))

    stage("q133_full")(noop(SparkEntry.queries("q133_kcore")(spark, sfDir)))

    stage("q51_full")(noop(SparkEntry.queries("q51_robust_outliers")(spark, sfDir)))
    stage("q51_full_warm")(noop(SparkEntry.queries("q51_robust_outliers")(spark, sfDir)))

    stage("q160_full")(noop(SparkEntry.queries("q160_crawl_pipeline_v2")(spark, sfDir)))
    stage("q160_full_warm")(noop(SparkEntry.queries("q160_crawl_pipeline_v2")(spark, sfDir)))
    locally {
      import org.apache.spark.sql.functions._
      import graft.operators._
      val dir = graft.queries.Queries.profCrawlWarcDir(spark, sfDir)
      val recs = WarcSources.readWarc(spark, dir)
        .filter(col("error").isNull && col("record_type") === "response")
        .select(
          regexp_extract(col("url"), "/doc/(\\d+)$", 1).cast("long").as("id"),
          decode(col("content"), "UTF-8").as("html"))
      stage("q160_read_only")(noop(recs))
      val kept = recs // robots/decontam skipped: isolate the block stage
      val blocksNarrow = Boilerplate.blocks(
        kept.select(col("id"), col("html")), col("id"), col("html"))
      stage("q160_blocks_asis")(noop(blocksNarrow))
      val blocksWide = Boilerplate.blocks(
        kept.select(col("id"), col("html"))
          .repartition(spark.sparkContext.defaultParallelism, col("id")),
        col("id"), col("html"))
      stage("q160_blocks_wide")(noop(blocksWide))
      val clean0 = Boilerplate.cleanText(Boilerplate.classify(
        blocksNarrow, minWords = 5, maxLinkDensity = 0.33))
      stage("q160_clean_asis")(noop(clean0))
      val recsU = recs.withColumn("curl",
        graft.queries.Queries.profPlantedUrl(col("id")))
      val allowed = Robots.filterAllowed(recsU, col("id"), col("curl"),
        graft.queries.Queries.profPlantedRobots(spark), col("domain"),
        col("robots_txt"), agent = "GraftBot")
      stage("q160_robots")(noop(allowed))
      val kept2 = Urls.decontaminateByDomain(allowed, col("curl"),
        Seq("badsite.com"))
      stage("q160_kept")(noop(kept2))
      val cleanDocs2 = Boilerplate.cleanText(Boilerplate.classify(
        Boilerplate.blocks(kept2.select(col("id"), col("html")),
          col("id"), col("html")),
        minWords = 5, maxLinkDensity = 0.33))
      stage("q160_cleandocs")(noop(cleanDocs2))
      val clean2 = QualityRules.c4LineFilter(cleanDocs2, col("doc_id"),
        col("text_clean"), minWords = 3, banned = Seq.empty)
      stage("q160_c4")(noop(clean2))
      val keepers2 = clean2.groupBy("text_clean")
        .agg(min(col("doc_id")).as("keeper_id"))
      stage("q160_keepers")(noop(clean2.join(keepers2, Seq("text_clean"))))
      val cleanPinned = cleanDocs2.localCheckpoint()
      stage("q160_c4_pinned") {
        noop(QualityRules.c4LineFilter(cleanPinned, col("doc_id"),
          col("text_clean"), minWords = 3, banned = Seq.empty))
      }
      stage("q160_c4_pinned2") {
        noop(QualityRules.c4LineFilter(cleanPinned, col("doc_id"),
          col("text_clean"), minWords = 3, banned = Seq.empty))
      }
    }

    stage("q172_full")(noop(SparkEntry.queries("q172_crawl_pipeline_v3")(spark, sfDir)))
    stage("q172_full_warm")(noop(SparkEntry.queries("q172_crawl_pipeline_v3")(spark, sfDir)))

    stage("q165_full")(noop(SparkEntry.queries("q165_crawl_graph_centrality")(spark, sfDir)))
    stage("q165_full_warm")(noop(SparkEntry.queries("q165_crawl_graph_centrality")(spark, sfDir)))

    // q182 decomposition — artifact serving vs fresh extraction vs frontier
    stage("q182_full")(noop(SparkEntry.queries("q182_trust_frontier")(spark, sfDir)))
    stage("q182_full_warm")(noop(SparkEntry.queries("q182_trust_frontier")(spark, sfDir)))

    locally {
      import org.apache.spark.sql.functions._
      import spark.implicits._
      val seeds = Seq("site0.example", "site1.example").toDF("node")
      var served: DataFrame = null
      stage("q182_served_edges") {
        served = graft.queries.Queries.profServedQ165Edges(spark, sfDir)
        noop(served)
      }
      stage("q182_ppr") {
        noop(graft.operators.LinkAnalysis.personalizedPageRank(served,
          seeds, iters = 5,
          policy = graft.operators.CheckpointPolicy.fromSession(spark)))
      }
      stage("q182_persrc") {
        noop(graft.queries.Queries.profQ165EdgeRows(spark, sfDir)
          .filter(col("sd") =!= col("dd"))
          .groupBy(col("sd"), col("tgt"))
          .agg(count(lit(1)).cast("double").as("c")))
      }
      stage("q182_robots_parse") {
        noop(graft.queries.Queries.profQ182Robots(spark))
      }
    }
    stage("q185_full")(noop(SparkEntry.queries("q185_warm_rerank")(spark, sfDir)))
    stage("q185_full_warm")(noop(SparkEntry.queries("q185_warm_rerank")(spark, sfDir)))

    stage("q147_full")(noop(SparkEntry.queries("q147_personalized_pagerank")(spark, sfDir)))
    stage("q75_full")(noop(SparkEntry.queries("q75_active_sampling_trace")(spark, sfDir)))
    stage("q142_full")(noop(SparkEntry.queries("q142_triangles_doulion")(spark, sfDir)))

    spark.stop()
  }
}
