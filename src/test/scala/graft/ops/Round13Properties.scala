package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.must.Matchers

import graft.TestSpark

/** Degenerate-input sweep over the text/pipeline operator families —
  * the r11 bm25 empty-corpus NPE was found by review, not by a test;
  * this pins the whole family's behavior over the four corpus shapes
  * a raw crawl actually delivers: an EMPTY corpus, all-empty-string
  * docs, null text, and single-token docs. The contract under test is
  * TOTALITY — every operator must return a well-formed frame (usually
  * empty) instead of throwing on a driver-side aggregate of nothing
  * (the avgdl class), a window over zero rows, or a null text column
  * reaching a regexp kernel.
  */
class Round13Properties extends AnyFlatSpec with Matchers {
  private lazy val spark = TestSpark.spark

  private def docsDf(rows: Seq[(Long, String)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.map { case (id, t) =>
      (id, t, if (id % 2 == 0) "en" else "de", s"src${id % 3}",
        if (t == null) 0L else t.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  private lazy val corpora: Seq[(String, DataFrame)] = Seq(
    "empty corpus" -> docsDf(Nil),
    "all-empty-string docs" -> docsDf(Seq(1L -> "", 2L -> "", 3L -> "")),
    "null text" -> docsDf(Seq(
      1L -> null, 2L -> "some ordinary words here", 3L -> null)),
    "single-token docs" -> docsDf(Seq(
      1L -> "hello", 2L -> "world", 3L -> "a", 4L -> "hello")))

  private def queriesDf(): DataFrame = {
    val s = spark
    import s.implicits._
    Seq((1L, Seq("hello", "words")), (2L, Seq.empty[String]))
      .toDF("query_id", "terms")
  }

  private def pairsDf(rows: Seq[(Long, Long)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("id_a", "id_b")
  }

  /** Force the frame; the contract is TOTALITY-OR-LOUDNESS: either a
    * well-formed result, or a DELIBERATE graft-raised contract error
    * that names the operator and the violated precondition (the
    * domainMix zero-token-mass class — refusing to emit undefined
    * mixture weights is correct curation semantics). What may never
    * happen is an anonymous engine crash: an ANSI DIVIDE_BY_ZERO, an
    * NPE on a null aggregate, a window over nothing. */
  private def total(what: String, df: => DataFrame): Unit =
    withClue(s"$what: ") {
      def msgs(e: Throwable): Seq[String] =
        if (e == null) Nil
        else Option(e.getMessage).toSeq ++ msgs(e.getCause)
      try { df.count() must be >= 0L; () }
      catch {
        case e: Throwable if msgs(e).exists(_.contains("graft ")) => ()
      }
    }

  behavior of "text/pipeline operators over degenerate corpora"

  for ((label, mk) <- Seq[(String, () => Seq[(String, DataFrame)])](
    "sweep" -> (() => corpora))) {
    it must s"stay total over every degenerate corpus ($label)" in {
      val qs = queriesDf()
      for ((shape, docs) <- mk()) {
        def c(op: String) = s"$shape / $op"
        total(c("tokenStats"), TextAnalysis.tokenStats(docs))
        total(c("quality"), TextAnalysis.quality(docs))
        total(c("langId"), TextAnalysis.langId(docs))
        total(c("repetition"), TextAnalysis.repetition(docs))
        total(c("tokenRarity"), TextAnalysis.tokenRarity(docs))
        total(c("tfidf"), TextAnalysis.tfidf(docs, k = 2))
        total(c("vocabZipf"), TextAnalysis.vocabZipf(docs))
        total(c("topNgrams"), TextAnalysis.topNgrams(docs, n = 2, k = 5))
        total(c("bpeMerges"), TextAnalysis.bpeMerges(docs, nMerges = 3))
        total(c("bpeEncode"),
          TextAnalysis.bpeEncode(docs, Seq("h" -> "e", "he" -> "l")))
        total(c("termSearch"),
          TextAnalysis.termSearch(docs, Seq("hello", "words"), k = 3))
        total(c("termSearchMany"),
          TextAnalysis.termSearchMany(docs, qs, k = 3))
        total(c("bm25"), TextAnalysis.bm25(docs, Seq("hello", "words")))
        total(c("bm25Many"), TextAnalysis.bm25Many(docs, qs))
        total(c("bigramFluency"), TextAnalysis.bigramFluency(docs))
        total(c("normalizeText"), TextAnalysis.normalizeText(docs))
        total(c("fingerprint"), TextAnalysis.fingerprint(docs))
        total(c("redactPii"), TextAnalysis.redactPii(docs))
        total(c("stratifiedEveryKth"), Curation.stratifiedEveryKth(
          docs, col("lang"), k = 2, orderKey = col("doc_id")))
        total(c("weightedSample"), Curation.weightedSample(
          docs, col("n_chars").cast("double") / lit(100.0)))
        total(c("assignSplits"), Curation.assignSplits(docs, 0.8, 0.1))
        total(c("chunkWithOverlap"),
          Curation.chunkWithOverlap(docs, chunkSize = 4, stride = 2))
        total(c("cdcChunks"), Curation.cdcChunks(docs))
        total(c("cdcSharedChunks"), Curation.cdcSharedChunks(docs))
        total(c("qualityFilter"), Curation.qualityFilter(docs))
        total(c("quantileGate"), Curation.quantileGate(
          docs, col("lang"), col("n_chars"), keepFrac = 0.5))
        total(c("domainCap"), Curation.domainCap(
          docs, col("source"), col("n_chars"), col("doc_id"), cap = 2))
        total(c("domainMix"), Curation.domainMix(docs, col("source")))
        total(c("applyMix"), Curation.applyMix(
          docs, col("source"), totalBudget = 10, orderKey = col("doc_id")))
        total(c("packSequences"), Curation.packSequences(
          docs, col("lang"), tokenBudget = 8, orderKey = col("doc_id")))
        total(c("materializePacks"), Curation.materializePacks(
          docs, col("lang"), tokenBudget = 8, orderKey = col("doc_id")))
        total(c("curriculumShards"),
          Curation.curriculumShards(docs, col("n_chars"), nShards = 3))
        total(c("groupedSplits (no pairs)"), Curation.groupedSplits(
          docs, pairsDf(Nil), 0.8, 0.1))
        total(c("groupedSplits (one pair)"), Curation.groupedSplits(
          docs, pairsDf(Seq(1L -> 2L)), 0.8, 0.1))
      }
    }
  }

  private def embDf(rows: Seq[(Long, Seq[Float])]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.map { case (id, v) => (id, v, (id % 3).toInt) }
      .toDF("vec_id", "embedding", "label")
  }

  it must "stay total over degenerate corpora for the dedup family" in {
    for ((shape, docs) <- corpora) {
      def c(op: String) = s"$shape / $op"
      total(c("exactStats"), Dedup.exactStats(docs))
      total(c("keepFirst"), Dedup.keepFirst(docs))
      total(c("stripBoilerplateLines"),
        Dedup.stripBoilerplateLines(docs, minDocs = 2))
      total(c("prefixContained"), Dedup.prefixContained(docs))
      total(c("simhash"), Dedup.simhash(docs))
      total(c("simhashPairs"), Dedup.simhashPairs(docs))
      total(c("minhashPairs"), Dedup.minhashPairs(docs))
      total(c("ngramJaccardPairs"), Dedup.ngramJaccardPairs(docs))
      total(c("exactSubstringOverlaps"),
        Dedup.exactSubstringOverlaps(docs))
      total(c("keepBest (no pairs)"),
        Dedup.keepBest(docs, pairsDf(Nil), col("n_chars")))
    }
  }

  it must "stay total over degenerate embeddings for the ANN family" in {
    val shapes: Seq[(String, DataFrame)] = Seq(
      "empty embeddings" -> embDf(Nil),
      // the ZERO vector: |v| = 0 — any cosine against it divides by a
      // zero norm unless the kernel guards it
      "zero vector in corpus" -> embDf(Seq(
        0L -> Seq.fill(8)(0.1f), 1L -> Seq.fill(8)(0f),
        2L -> Seq.fill(8)(0.2f))),
      "single row" -> embDf(Seq(0L -> Seq.fill(8)(0.5f))))
    for ((shape, emb) <- shapes) {
      def c(op: String) = s"$shape / $op"
      total(c("bruteTopK"),
        Similarity.bruteTopK(emb.filter(col("vec_id") < 2), emb, k = 3))
      total(c("bruteNearDups"), Similarity.bruteNearDups(emb, 0.9))
      total(c("sq8TopK"),
        Similarity.sq8TopK(emb.filter(col("vec_id") < 2), emb,
          k = 3, cand = 10))
    }
  }

  it must "emit EXACTLY zero rows from every corpus-shaped op on the empty corpus" in {
    val docs = corpora.head._2
    TextAnalysis.quality(docs).count() must be(0L)
    TextAnalysis.tfidf(docs).count() must be(0L)
    TextAnalysis.bm25(docs, Seq("x")).count() must be(0L)
    TextAnalysis.bm25Many(docs, queriesDf()).count() must be(0L)
    Curation.qualityFilter(docs).count() must be(0L)
    Curation.chunkWithOverlap(docs, 4, 2).count() must be(0L)
    Curation.curriculumShards(docs, col("n_chars"), 3).count() must be(0L)
    Curation.domainMix(docs, col("source")).count() must be(0L)
  }
}
