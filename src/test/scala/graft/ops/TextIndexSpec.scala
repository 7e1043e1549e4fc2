package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.must.Matchers

import graft.TestSpark

/** The persisted lexical index (TextAnalysis.saveTextIndex /
  * appendToTextIndex / termSearchIndexed): bucket-partitioned postings
  * must (1) return BIT-IDENTICAL rankings to the direct corpus search,
  * (2) prune non-matching term buckets at the FILE level — the scan
  * touches at most |terms| of the partition directories — and (3)
  * absorb appended batches with indexed results identical to a fresh
  * full-corpus search (retrain-free ingest, the ann_incremental
  * contract on the lexical side).
  */
class TextIndexSpec extends AnyFlatSpec with Matchers {
  private lazy val spark = TestSpark.spark

  private def docsDf(): DataFrame = {
    val s = spark
    import s.implicits._
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu", "nu", "xi")
    (0L until 80L).map { i =>
      val r = new scala.util.Random(i * 7 + 1)
      val t = (0 until 12).map(_ => words(r.nextInt(words.length)))
        .mkString(" ")
      (i, t, "en", "web", t.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  behavior of "the persisted lexical index"

  it must "match the direct search bit for bit and prune to the terms' buckets" in {
    val s = spark
    import s.implicits._
    val docs = docsDf()
    val terms = Seq("alpha", "kappa")
    val dir = java.nio.file.Files.createTempDirectory("graft-tidx-spec")
    try {
      TextAnalysis.saveTextIndex(docs, dir.toString, buckets = 16)
      // on-disk layout: bucket-partitioned postings dirs
      val dirsTotal = {
        val ls = java.nio.file.Files.list(dir.resolve("postings"))
        try {
          import scala.jdk.CollectionConverters._
          ls.iterator().asScala
            .count(_.getFileName.toString.startsWith("wb="))
        } finally ls.close()
      }
      dirsTotal must be > 4 // the vocabulary really spreads over buckets
      val indexed = TextAnalysis.termSearchIndexed(
        spark, dir.toString, terms, k = 10, buckets = 16)
      val rows = indexed.collect()
      // (1) bit-identical to the direct corpus search
      rows.map(_.toString).toSeq must be(
        TextAnalysis.termSearch(docs, terms, k = 10)
          .collect().map(_.toString).toSeq)
      rows.length must be > 0
      // (2) file-level pruning: the postings scan read at most |terms|
      // partition dirs of the dirsTotal on disk
      import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
        case q: QueryStageExec => scans(q.plan)
        case f: FileSourceScanExec => Seq(f)
        case other =>
          other.children.flatMap(scans) ++ other.subqueries.flatMap(scans)
      }
      // re-run the pruned read standalone so the scan metric is this
      // query's own (termSearchIndexed checkpointed its tf)
      val probe = spark.read.parquet(s"$dir/postings")
        .filter(col("wb").isin(
          terms.toDF("w").select(
            pmod(xxhash64(col("w")), lit(16L)).as("wb"))
            .collect().map(_.getLong(0)).distinct.toSeq: _*)
          && col("w").isin(terms: _*))
      probe.count() must be > 0L
      val scan = scans(probe.queryExecution.executedPlan).head
      val read = scan.metrics("numPartitions").value.toInt
      withClue(s"read $read of $dirsTotal bucket dirs: ") {
        read must be <= terms.length
        read must be < dirsTotal
      }
    } finally graft.PlanHygiene.deleteRecursively(dir)
  }

  it must "skip a co-bucketed stopword's row groups when probing a rare term" in {
    // the r13 verdict #4 hole: bucket-dir pruning is blind INSIDE a
    // bucket, so a rare term co-bucketed with a stopword used to read
    // the stopword's entire postings file. With postings sorted by
    // (wb, w) at write time, each row group spans a narrow term range
    // and the rare-term probe skips the stopword mass via parquet
    // min/max stats. buckets = 1 makes EVERYTHING co-bucketed — the
    // worst case — and a small parquet.block.size forces many row
    // groups at spec scale.
    val s = spark
    import s.implicits._
    val docs = (0L until 3000L).map { i =>
      val stop = Seq.fill(8)("the").mkString(" ")
      val uniq = s"u${i}a u${i}b u${i}c"
      val rare = if (i == 1500L) " zzrare" else ""
      (i, s"$stop $uniq$rare", "en", "web", 0L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft-tidx-rg")
    try {
      TextAnalysis.saveTextIndex(docs, dir.toString, buckets = 1,
        writerOptions = Map("parquet.block.size" -> (32 * 1024).toString))
      val total = spark.read.parquet(s"$dir/postings").count()
      total must be > 10000L

      import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
        case q: QueryStageExec => scans(q.plan)
        case f: FileSourceScanExec => Seq(f)
        case other =>
          other.children.flatMap(scans) ++ other.subqueries.flatMap(scans)
      }
      // the exact pruned-read shape termSearchIndexed plans
      val probe = spark.read.parquet(s"$dir/postings")
        .filter(col("wb").isin(0L) && col("w").isin("zzrare"))
      probe.collect().length must be(1)
      val scan = scans(probe.queryExecution.executedPlan).head
      val emitted = scan.metrics("numOutputRows").value
      // without the write-time sort every row group spans the whole
      // vocabulary and nothing skips (emitted == total); with it the
      // probe touches only the rare term's row group(s)
      withClue(s"scan emitted $emitted of $total postings rows: ") {
        emitted must be < total / 4
      }
      // and the indexed search itself stays bit-identical on this corpus
      TextAnalysis.termSearchIndexed(spark, dir.toString,
          Seq("the", "zzrare"), k = 5, buckets = 1)
        .collect().map(_.toString).toSeq must be(
        TextAnalysis.termSearch(docs, Seq("the", "zzrare"), k = 5)
          .collect().map(_.toString).toSeq)
    } finally graft.PlanHygiene.deleteRecursively(dir)
  }

  it must "absorb appended batches: indexed search equals a fresh full search" in {
    val docs = docsDf()
    val hist = docs.filter(col("doc_id") % 3 =!= 0)
    val inc = docs.filter(col("doc_id") % 3 === 0)
    val terms = Seq("beta", "mu", "theta")
    val dir = java.nio.file.Files.createTempDirectory("graft-tidx-inc")
    try {
      TextAnalysis.saveTextIndex(hist, dir.toString, buckets = 16)
      TextAnalysis.appendToTextIndex(inc, dir.toString, buckets = 16)
      TextAnalysis.termSearchIndexed(spark, dir.toString, terms, k = 10,
          buckets = 16)
        .collect().map(_.toString).toSeq must be(
        TextAnalysis.termSearch(docs, terms, k = 10)
          .collect().map(_.toString).toSeq)
    } finally graft.PlanHygiene.deleteRecursively(dir)
  }

  behavior of "TextAnalysis.retrievalMetrics"

  it must "compute recall/MRR/DCG exactly on a hand-checkable fixture" in {
    val s = spark
    import s.implicits._
    // 5 docs; 'rare' appears in docs 1,2,3 (the relevant set for q1).
    // Doc 3 mentions it three times, doc 2 twice, doc 1 once, so the
    // tf ranking is 3, 2, 1 and every metric is hand-derivable.
    val docs = Seq(
      (1L, "rare word filler one"),
      (2L, "rare rare word filler two"),
      (3L, "rare rare rare word filler"),
      (4L, "nothing to see here"),
      (5L, "plain filler text row")).toDF("doc_id", "text")
    val qs = Seq(
      (1, Seq("rare")),
      (2, Seq("rare", "missingterm"))).toDF("query_id", "terms")
    val out = TextAnalysis.retrievalMetrics(docs, qs, k = 2)
      .orderBy("query_id").collect()

    val q1 = out(0)
    q1.getLong(1) must be(3L) // n_relevant: docs 1, 2, 3
    q1.getLong(2) must be(2L) // hits@2: top-2 = docs 3, 2 — both relevant
    q1.getLong(3) must be(1L) // first hit at rank 1
    q1.getLong(4) must be(1000000L) // mrr = 10^6 / 1
    // dcg = 8e6/fplog2(2) + 8e6/fplog2(3) = 1,000,000 + 666,666
    q1.getLong(5) must be(1000000L + 8000000L / 12L)
    // idcg over min(3, 2) = 2 ranks: identical sum (perfect ranking)
    q1.getLong(6) must be(q1.getLong(5))

    val q2 = out(1)
    // 'missingterm' is out of corpus: nothing can contain ALL terms
    q2.getLong(1) must be(0L)
    Seq(2, 3, 4, 5, 6).foreach(i => q2.getLong(i) must be(0L))
  }
}
