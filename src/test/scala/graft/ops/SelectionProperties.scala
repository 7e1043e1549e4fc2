package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.must.Matchers

import graft.TestSpark

/** Degenerate-corpus totality sweep for the round-14 data-selection ops
  * (the Round13Properties discipline, which found a real ANSI
  * divide-by-zero): every new operator must stay TOTAL — a well-formed
  * (possibly empty) result, or a deliberate graft-raised contract error
  * — over the corpus shapes a raw crawl actually delivers. Unlike the
  * r13 sweep this forces FULL rows (collect, not count): the bench-sink
  * lesson applies to error surfaces too — a divide-by-zero sitting in a
  * pruned output column never fires under a bare row count.
  */
class SelectionProperties extends AnyFlatSpec with Matchers {
  private lazy val spark = TestSpark.spark

  private def docsDf(rows: Seq[(Long, String)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.map { case (id, t) =>
      (id, t, if (id % 2 == 0) "en" else "de", s"src${id % 3}",
        if (t == null) 0L else t.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  private def embDf(rows: Seq[(Long, Seq[Float])]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.map { case (id, v) => (id, v, 0) }
      .toDF("vec_id", "embedding", "label")
  }

  private lazy val corpora: Seq[(String, DataFrame)] = Seq(
    "empty corpus" -> docsDf(Nil),
    "all-empty-string docs" -> docsDf(Seq(1L -> "", 2L -> "", 3L -> "")),
    "null text" -> docsDf(Seq(
      1L -> null, 2L -> "some ordinary words here", 3L -> null)),
    "single-token docs" -> docsDf(Seq(
      1L -> "hello", 2L -> "world", 3L -> "a", 4L -> "hello")),
    "identical docs" -> docsDf(Seq(
      1L -> "same words here", 2L -> "same words here",
      3L -> "same words here")))

  private def total(what: String, df: => DataFrame): Unit =
    withClue(s"$what: ") {
      def msgs(e: Throwable): Seq[String] =
        if (e == null) Nil
        else Option(e.getMessage).toSeq ++ msgs(e.getCause)
      try { df.collect().length must be >= 0; () }
      catch {
        case e: Throwable if msgs(e).exists(_.contains("graft ")) => ()
      }
    }

  behavior of "round-14 selection operators over degenerate corpora"

  it must "stay total for the text/curation selection family" in {
    for ((shape, docs) <- corpora) {
      def c(op: String) = s"$shape / $op"
      total(c("c4Filters"), TextAnalysis.c4Filters(docs))
      total(c("dsirScores"),
        Curation.dsirScores(docs, col("lang") === "en"))
      total(c("tokenBudgetSelect"), Curation.tokenBudgetSelect(
        docs.select(col("doc_id"), col("n_chars").as("s"),
          col("n_chars").as("ct")),
        col("s"), col("ct"), budget = 10L))
      total(c("ccnetBuckets"), Curation.ccnetBuckets(docs))
      total(c("dedupLinesWithinDoc"), Dedup.dedupLinesWithinDoc(docs))
      total(c("dupRates"), Dedup.dupRates(docs))
      total(c("clusterSizes (no pairs)"), Dedup.clusterSizes(docs, {
        val s = spark; import s.implicits._
        Seq.empty[(Long, Long)].toDF("id_a", "id_b")
      }))
      total(c("clusterSizes (lsh pairs)"),
        Dedup.clusterSizes(docs, Dedup.minhashPairs(docs)))
    }
  }

  it must "stay total for the range-search family over degenerate embeddings" in {
    val shapes: Seq[(String, DataFrame)] = Seq(
      "empty embeddings" -> embDf(Nil),
      "zero vector in corpus" -> embDf(Seq(
        0L -> Seq.fill(8)(0.1f), 1L -> Seq.fill(8)(0f),
        2L -> Seq.fill(8)(0.2f))),
      "single row" -> embDf(Seq(0L -> Seq.fill(8)(0.5f))))
    for ((shape, emb) <- shapes) {
      def c(op: String) = s"$shape / $op"
      val qs = emb.filter(col("vec_id") < 2)
      total(c("rangeSearch"), Similarity.rangeSearch(qs, emb, 0.5))
      total(c("ivfRangeSearch"),
        Similarity.ivfRangeSearch(qs, emb, 0.5, numCentroids = 2,
          nprobe = 2, corpusProbe = 2))
      total(c("rangeRecall"),
        Similarity.rangeRecall(qs, emb, 0.5, numCentroids = 2,
          floor = 0.5, nprobe = 2, corpusProbe = 2))
    }
  }

  it must "emit exactly zero rows from the selection ops on the empty corpus" in {
    val docs = corpora.head._2
    TextAnalysis.c4Filters(docs).count() must be(0L)
    Curation.dsirScores(docs, col("lang") === "en").count() must be(0L)
    Curation.ccnetBuckets(docs).count() must be(0L)
    Dedup.dedupLinesWithinDoc(docs).count() must be(0L)
    Dedup.dupRates(docs).count() must be(0L)
    Curation.tokenBudgetSelect(
      docs.select(col("doc_id"), col("n_chars").as("s"),
        col("n_chars").as("ct")),
      col("s"), col("ct"), budget = 10L).count() must be(0L)
    // clusterSizes on the empty corpus still emits its singleton
    // accounting row (1, 0) — the histogram is a REPORT, not a per-doc
    // projection
    Dedup.clusterSizes(docs, {
      val s = spark; import s.implicits._
      Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    }).collect().map(r => (r.getLong(0), r.getLong(1))) must be(
      Array((1L, 0L)))
  }
}
