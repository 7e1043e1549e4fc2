package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.must.Matchers

import graft.TestSpark

/** Hand-computed fixtures for the round-14 batch ops: the Gopher rule
  * battery, the char-mass repetition battery, first-occurrence shingle
  * novelty, and fuzzy (Jaccard-threshold) decontamination.
  */
class Round14OpsSpec extends AnyFlatSpec with Matchers {
  private lazy val spark = TestSpark.spark

  private def docsDf(docs: Seq[(Long, String)]) = {
    val s = spark
    import s.implicits._
    docs.toDF("doc_id", "text")
  }

  behavior of "TextAnalysis.gopherRules"

  it must "evaluate each rule independently and conjoin them" in {
    val ok = "the " + Seq.fill(29)("data").mkString(" ") // 30 words, has 'the'
    val short = "the data table query row"               // 5 words
    val digits = Seq.tabulate(30)(i => s"x$i").mkString(" ") // no pure-alpha
    val noStop = Seq.fill(30)("data").mkString(" ")       // no gopher stopword
    val out = TextAnalysis.gopherRules(docsDf(Seq(
        1L -> ok, 2L -> short, 3L -> digits, 4L -> noStop)))
      .orderBy("doc_id").collect()
    def row(id: Long): Row = out.find(_.getLong(0) == id).get
    row(1L).getAs[Boolean]("gopher_ok") must be(true)
    row(1L).getAs[Double]("mean_word_len") must be(119.0 / 30 +- 1e-4)
    row(2L).getAs[Boolean]("r_word_count") must be(false)
    row(2L).getAs[Boolean]("r_stopwords") must be(true)
    row(3L).getAs[Boolean]("r_alpha") must be(false)
    row(3L).getAs[Double]("alpha_frac") must be(0.0)
    row(4L).getAs[Boolean]("r_stopwords") must be(false)
    Seq(2L, 3L, 4L).foreach(id =>
      row(id).getAs[Boolean]("gopher_ok") must be(false))
  }

  behavior of "TextAnalysis.gopherRepetition"

  it must "compute exact char-mass fractions (overlap counts multiply)" in {
    // tokens [aa bb aa bb aa], char mass 10:
    //   2-grams: "aa bb"×2, "bb aa"×2 → max w = 2×4 = 8      → 0.8
    //   3-grams: "aa bb aa"×2 → 2×6 = 12                     → 1.2
    //   4-grams: two singles of mass 8 → 8                   → 0.8
    //   5-grams: one single → no dup                         → 0.0
    val out = TextAnalysis.gopherRepetition(docsDf(Seq(
        1L -> "aa bb aa bb aa",
        2L -> Seq.fill(10)("cc").mkString(" "),
        3L -> "aa")))
      .orderBy("doc_id").collect()
    val d1 = out(0)
    d1.getAs[Long]("n_token_chars") must be(10L)
    d1.getAs[Double]("top_2gram_char_frac") must be(0.8)
    d1.getAs[Double]("top_3gram_char_frac") must be(1.2)
    d1.getAs[Double]("top_4gram_char_frac") must be(0.8)
    d1.getAs[Double]("dup_5gram_char_frac") must be(0.0)
    // 10×"cc", mass 20: 5-grams "cc…"×6 of mass 10 → 60/20 = 3.0
    val d2 = out(1)
    d2.getAs[Double]("dup_5gram_char_frac") must be(3.0)
    d2.getAs[Double]("dup_6gram_char_frac") must be(3.0)
    d2.getAs[Double]("top_2gram_char_frac") must be(1.8)
    // a 1-token doc keeps its row with all-zero fractions
    val d3 = out(2)
    d3.getAs[Long]("n_token_chars") must be(2L)
    d3.getAs[Double]("top_2gram_char_frac") must be(0.0)
    d3.getAs[Double]("dup_6gram_char_frac") must be(0.0)
  }

  behavior of "TextAnalysis.novelty"

  it must "score first-seen shingles as novel, copies as 0" in {
    val out = TextAnalysis.novelty(docsDf(Seq(
        1L -> "a b c d",       // both shingles first here → 1.0
        2L -> "a b c d",       // exact copy → 0.0
        3L -> "a b c x y z",   // 1 of 4 shingles seen before → 0.75
        4L -> "q r")))         // <3 tokens → no row
      .orderBy("doc_id").collect()
    out.map(_.getLong(0)).toSeq must be(Seq(1L, 2L, 3L))
    out(0).getAs[Double]("novelty") must be(1.0)
    out(1).getAs[Double]("novelty") must be(0.0)
    out(2).getAs[Long]("n_shingles") must be(4L)
    out(2).getAs[Long]("n_novel") must be(3L)
    out(2).getAs[Double]("novelty") must be(0.75)
  }

  behavior of "Decontaminate.fuzzyFlagged"

  it must "flag pairs at the exact Jaccard threshold and agree with Dedup.jaccard" in {
    val train = docsDf(Seq(1L -> "w1 w2 w3 w4",
      2L -> "totally different words here with nothing shared at all right"))
    val bench = docsDf(Seq(10L -> "w1 w2 w3 w4 w5"))
    // shingles: train d1 {w1w2w3, w2w3w4}, bench {.., .., w3w4w5}
    // shared 2 → jaccard 2/(2+3−2) = 2/3
    val out = Decontaminate.fuzzyFlagged(train, bench, n = 3,
      minJaccard = 0.5).collect()
    out.length must be(1)
    out(0).getLong(0) must be(1L)
    out(0).getLong(1) must be(10L)
    out(0).getLong(2) must be(2L)
    out(0).getDouble(3) must be(0.666667)
    val exact = Dedup.jaccard(
      docsDf(Seq(1L -> "w1 w2 w3 w4", 10L -> "w1 w2 w3 w4 w5")), 1L, 10L)
    math.abs(exact - 2.0 / 3.0) must be < 1e-12
    // a threshold just above the pair's jaccard drops it
    Decontaminate.fuzzyFlagged(train, bench, n = 3, minJaccard = 0.67)
      .count() must be(0L)
  }

  behavior of "Dedup.pagerankInt"

  it must "reproduce the hand-computed integer ladder on a triangle + pendant" in {
    val s = spark
    import s.implicits._
    // edges 1-2, 2-3, 1-3, 3-4; degrees 2,2,3,1; scale 100:
    //   shares 50,50,33,100 → incoming 83,83,200,33
    //   pr₁ = 15 + (85·m)//100 → 85, 85, 185, 43
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
      .toDF("id_a", "id_b")
    val pr1 = Dedup.pagerankInt(pairs, iters = 1, scale = 100L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    pr1 must be(Seq((1L, 85L), (2L, 85L), (3L, 185L), (4L, 43L)))
    // more iterations keep the hub on top and conserve boundedness
    val pr3 = Dedup.pagerankInt(pairs, iters = 3, scale = 100L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    pr3(3L) must be > pr3(1L)
    pr3(1L) must be(pr3(2L)) // symmetric positions stay exactly equal
    pr3(4L) must be < pr3(1L)
  }

  behavior of "TextAnalysis novelty index (save / pure-append / score)"

  it must "score an increment through the index identically to batch novelty" in {
    // history 0..7, first increment 8..9 (pure-append), scored
    // increment 10..11; d10 copies d1 (novelty 0), d11 is fresh (1.0)
    val texts = (0L until 8L).map(i => i -> s"h$i a$i b$i c$i d$i") ++
      Seq(8L -> "x8 y8 z8 w8", 9L -> "x9 y9 z9 w9",
        10L -> "h1 a1 b1 c1 d1", 11L -> "fresh words only here now")
    val all = docsDf(texts)
    val dir = java.nio.file.Files.createTempDirectory("graft-nov-idx-spec")
    try {
      TextAnalysis.saveNoveltyIndex(
        all.filter(col("doc_id") < 8), dir.toString, buckets = 4)
      TextAnalysis.appendToNoveltyIndex(
        all.filter(col("doc_id") >= 8 && col("doc_id") < 10),
        dir.toString, buckets = 4)
      val inc = TextAnalysis.noveltyWithIndex(spark, dir.toString,
          all.filter(col("doc_id") >= 10))
        .orderBy("doc_id").collect()
      val batch = TextAnalysis.novelty(all)
        .filter(col("doc_id") >= 10)
        .orderBy("doc_id").collect()
      inc.map(_.toSeq).toSeq must be(batch.map(_.toSeq).toSeq)
      inc.map(r => (r.getLong(0), r.getDouble(3))).toSeq must be(
        Seq((10L, 0.0), (11L, 1.0)))
      // a shingle APPENDED later than its first indexing min-folds: d10
      // also shares nothing with the appended 8..9 docs, while a copy
      // of an appended doc scores 0 through the merged generations
      TextAnalysis.noveltyWithIndex(spark, dir.toString,
          docsDf(Seq(12L -> "x9 y9 z9 w9")))
        .collect()(0).getDouble(3) must be(0.0)
    } finally {
      graft.PlanHygiene.deleteRecursively(dir)
    }
  }

  behavior of "round-14 plan shapes"

  it must "pin gopherRepetition to one scan and novelty to partial-agg-only exchanges" in {
    // the 100 TB shape claims, pinned from the EXECUTED plans:
    //  - gopherRepetition reads (doc_id, text) exactly ONCE (an earlier
    //    cut joined a second mass projection back in);
    //  - novelty's only windows are DOC-partitioned (the shingle
    //    pipeline's own lead window — partition size = doc length);
    //    no window partitions by shingle, so a boilerplate shingle in
    //    half the corpus map-side-combines through partial aggregates
    //    instead of landing whole on one window reducer (the Zipf
    //    straggler an earlier cut had). Scans stay ≤2 (both aggregation
    //    branches reuse the distinct's exchange — measured 1 here).
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.window.WindowExec
    def flat(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => flat(a.executedPlan)
      case q: QueryStageExec => q +: flat(q.plan)
      case other => other +: (other.children.flatMap(flat) ++
        other.subqueries.flatMap(flat))
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-r14-plan")
    try {
      docsDf((0L until 50L).map(i =>
          i -> s"tok${i % 7} tok${(i * 3) % 11} tok${(i * 5) % 13} tok$i end"))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val rep = TextAnalysis.gopherRepetition(docs)
      rep.collect()
      flat(rep.queryExecution.executedPlan)
        .count(_.isInstanceOf[FileSourceScanExec]) must be(1)
      val nov = TextAnalysis.novelty(docs)
      nov.collect()
      val nodes = flat(nov.queryExecution.executedPlan)
      nodes.count(_.isInstanceOf[FileSourceScanExec]) must be <= 2
      val winParts = nodes.collect { case w: WindowExec =>
        w.partitionSpec.flatMap(_.references.toSeq.map(_.name)).toSet }
      winParts.foreach(_ must be(Set("doc_id")))
    } finally {
      graft.PlanHygiene.deleteRecursively(dir)
    }
  }

  behavior of "Similarity.mmrTopK"

  private def vecsDf(vs: Seq[(Long, Seq[Float])]) = {
    val s = spark
    import s.implicits._
    vs.toDF("vec_id", "embedding")
  }

  it must "diversify: pick the off-cluster candidate over a near-copy of pick #1" in {
    // query along +x; candidate 1 leans +y (score .9487), 2 is a
    // near-copy of 1 with a hair MORE query-sim than 3 (.9479 > .9476),
    // 3 mirrors 1 across the x-axis (far from 1: pair sim ≈ .80).
    // Plain top-2 is (1, 2); MMR's second pick must be 3 because 2's
    // penalty (sim to 1 ≈ 1.0) crushes its margin while 3's doesn't.
    val q = vecsDf(Seq(100L -> Seq(1f, 0f)))
    val corpus = vecsDf(Seq(
      1L -> Seq(0.9f, 0.3f),
      2L -> Seq(0.9f, 0.302f),
      3L -> Seq(0.89f, -0.3f),
      100L -> Seq(1f, 0f)))
    val mmr = Similarity.mmrTopK(q, corpus, k = 2, cand = 3)
      .orderBy("mmr_rank").collect()
    mmr.map(r => (r.getLong(1), r.getInt(2))).toSeq must be(
      Seq((1L, 1), (3L, 2)))
    val brute = Similarity.bruteTopK(q, corpus, k = 2)
      .orderBy("rank").collect()
    brute.map(_.getLong(1)).toSeq must be(Seq(1L, 2L))
  }

  it must "emit min(k, candidates) rows with dense ranks per query" in {
    val q = vecsDf(Seq(100L -> Seq(1f, 0f), 101L -> Seq(0f, 1f)))
    val corpus = vecsDf(Seq(1L -> Seq(1f, 0.1f), 2L -> Seq(0.1f, 1f),
      100L -> Seq(1f, 0f), 101L -> Seq(0f, 1f)))
    // only 3 non-self candidates exist per query; k=5 must not pad
    val out = Similarity.mmrTopK(q, corpus, k = 5, cand = 5).collect()
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      rows.map(_.getInt(2)).sorted.toSeq must be(1 to rows.length)
    }
    out.length must be(6) // 3 candidates per query
  }
}
