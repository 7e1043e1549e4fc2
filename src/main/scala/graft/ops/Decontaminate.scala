package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the training-data-pipeline op that keeps
  * eval sets out of the training corpus: flag (and drop) training
  * documents sharing at least `minShared` distinct word n-gram shingles
  * with any benchmark document. This is n-gram-overlap decontamination
  * (the shape used for public-benchmark leakage scrubbing), built on
  * the same shingle rows as the MinHash dedup path.
  *
  * Scale posture: the join key is the shingle, so the plan is
  * train-shingles ⨝ bench-shingles — the benchmark side is tiny
  * relative to a 100 TB corpus (thousands of eval docs), aggregates to
  * one row per distinct shingle, and broadcasts; the corpus side
  * streams through without ever pairing documents all-to-all. The
  * quadratic risk is a shingle common to MANY benchmark docs AND many
  * training docs (stop-phrase n-grams): `maxBenchDf` bounds it on the
  * bench side BY CONSTRUCTION — shingles above the document-frequency
  * cap are excluded LOUDLY through the same observe/listener channel
  * the LSH caps use (a stop-phrase shingle carries no contamination
  * signal; the cap documents, not hides, that judgment).
  */
object Decontaminate {

  /** The df-capped benchmark (shingle, bench_id) rows every
    * decontamination variant joins against, with drops shouted through
    * the LshGuard observe channel.
    */
  private def benchShingleRows(benchmark: DataFrame, n: Int,
                               maxBenchDf: Int): DataFrame = {
    val benchBuckets = Dedup.shingleRows(benchmark, n)
      .groupBy(col("shingle"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
    // capBuckets would also drop SINGLETON buckets (right for pair
    // generation, wrong here — df=1 is the common, signal-bearing
    // case), so the df cap applies directly with the same loud metrics
    val metrics = LshGuard.dropMetrics(size(col("ids")), maxBenchDf)
    benchBuckets
      .observe(LshGuard.observationName("decontam"), metrics.head, metrics.tail: _*)
      .filter(size(col("ids")) <= maxBenchDf)
      .select(col("shingle"), explode(col("ids")).as("bench_id"))
  }

  /** Shared tail: count distinct shared shingles per (train, bench)
    * document pair and keep pairs at or above the overlap floor.
    */
  private def sharedPairs(trainShingles: DataFrame, benchShingles: DataFrame,
                          minShared: Int): DataFrame =
    trainShingles
      .join(benchShingles, "shingle")
      .groupBy(col("doc_id"), col("bench_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)

  /** Streaming-shaped decontamination: same (doc_id, bench_id, n_shared)
    * contract and semantics as [[flagged]], but as a PER-ROW probe of a
    * broadcast benchmark shingle index — no shuffle, no aggregation, no
    * state store — so it runs under Structured Streaming's append mode
    * (stream aggregations need an event-time watermark documents don't
    * have, and window-based shingling is illegal on a stream). The
    * index is batch-built from the static benchmark side with the SAME
    * df cap as the join path; the benchmark is bounded by design
    * (thousands of eval docs), which is exactly what makes broadcasting
    * it the right 100 TB shape — each streamed row probes locally and
    * emits only its flagged pairs. Works identically on batch frames
    * (it is a pure projection), which is how the oracle pins it.
    */
  def flaggedStream(stream: DataFrame, benchmark: DataFrame,
                    n: Int = 3, minShared: Int = 3,
                    maxBenchDf: Int = 100): DataFrame =
    flaggedStreamIndexed(stream,
      benchmark.sparkSession.sparkContext.broadcast(
        streamIndex(benchmark, n, maxBenchDf)), n, minShared)

  /** The shingle → sorted bench-doc-ids probe map [[flaggedStreamIndexed]]
    * consumes, batch-built from the static benchmark side with the same
    * df cap as the join path. Split out of [[flaggedStream]] so a
    * long-lived stream builds it ONCE at stream start (the production
    * shape — the eval set changes on release cadence, the corpus
    * streams forever); rebuilding per micro-batch or per query would
    * pay the two benchmark shuffles and the driver collect every time
    * for an index that didn't change.
    */
  def streamIndex(benchmark: DataFrame, n: Int = 3,
                  maxBenchDf: Int = 100): Map[String, Array[Long]] = {
    val spark = benchmark.sparkSession
    import spark.implicits._
    benchShingleRows(benchmark, n, maxBenchDf)
      .groupBy(col("shingle"))
      .agg(sort_array(collect_list(col("bench_id"))).as("ids"))
      .as[(String, Array[Long])]
      .collect().toMap
  }

  /** [[flaggedStream]] against an already-broadcast index — the per-row
    * probe only, no batch work at plan time.
    */
  def flaggedStreamIndexed(stream: DataFrame,
                           bc: org.apache.spark.broadcast.Broadcast[
                             Map[String, Array[Long]]],
                           n: Int, minShared: Int): DataFrame = {
    val tokenRe = java.util.regex.Pattern.compile("\\w+")
    // tokenization MUST mirror Dedup.positionedGrams'
    // regexp_extract_all(lower(text), '\w+'): Java regex, ROOT-locale
    // lowercase — a locale-sensitive toLowerCase would diverge from
    // UTF8String's on dotted-I alphabets
    val probe = udf { (text: String) =>
      val m = tokenRe.matcher(
        Option(text).getOrElse("").toLowerCase(java.util.Locale.ROOT))
      val toks = scala.collection.mutable.ArrayBuffer.empty[String]
      while (m.find()) toks += m.group()
      val hits = scala.collection.mutable.HashMap.empty[Long, Long]
      if (toks.length >= n) {
        val seen = scala.collection.mutable.HashSet.empty[String]
        toks.sliding(n).foreach { gram =>
          val s = gram.mkString(" ")
          if (seen.add(s))
            bc.value.getOrElse(s, Array.empty[Long])
              .foreach(id => hits(id) = hits.getOrElse(id, 0L) + 1L)
        }
      }
      hits.iterator.filter(_._2 >= minShared).toArray.sortBy(_._1)
    }
    stream
      .select(col("doc_id"), explode(probe(col("text"))).as("hit"))
      .select(col("doc_id"), col("hit._1").as("bench_id"),
        col("hit._2").as("n_shared"))
  }

  /** Contaminated (doc_id, bench_id, n_shared) pairs: training docs
    * sharing ≥ `minShared` distinct `n`-gram shingles with a benchmark
    * doc. `train` and `benchmark` both need (doc_id, text).
    */
  def flagged(train: DataFrame, benchmark: DataFrame,
              n: Int = 3, minShared: Int = 3,
              maxBenchDf: Int = 100): DataFrame = {
    LshGuard.ensureListener(train.sparkSession)
    sharedPairs(Dedup.shingleRows(train, n),
      benchShingleRows(benchmark, n, maxBenchDf), minShared)
  }

  /** `flagged` with a Bloom-filter pre-prune — identical output (the
    * Bloom filter admits no false negatives and an exact confirm join
    * removes its false positives), different 100 TB shape: `flagged`
    * shuffles EVERY corpus shingle into the bench join, while this
    * variant probes a fixed-size filter map-side and shuffles only the
    * ~matching sliver. At bench sets large enough that the exact
    * shingle rows stop auto-broadcasting (1e8 shingles ≈ GBs), the
    * Bloom stays `numBits/8` bytes by construction — the filter is
    * built once by `graft_bloom_agg` (Spark's own runtime-filter
    * sketch, see GraftFunctions.register) and reaches every probe task
    * as a scalar-subquery literal, the same delivery the optimizer's
    * InjectRuntimeFilter uses.
    *
    * `expectedItems`/`numBits` size the sketch; at the default 1 M
    * items / 8 Mbit the false-positive rate is < 1% up to capacity and
    * degrades gracefully (FPs cost confirm-join work, never
    * correctness).
    */
  def flaggedBloom(train: DataFrame, benchmark: DataFrame,
                   n: Int = 3, minShared: Int = 3,
                   maxBenchDf: Int = 100,
                   expectedItems: Long = 1L << 20,
                   numBits: Long = 1L << 23): DataFrame = {
    val spark = train.sparkSession
    LshGuard.ensureListener(spark)
    graft.functions.GraftFunctions.register(spark)
    val benchShingles = benchShingleRows(benchmark, n, maxBenchDf)
    val view = s"graft_bloom_bench_${bloomViewSeq.incrementAndGet()}"
    benchShingles
      .select(col("shingle")).distinct()
      .agg(expr(s"graft_bloom_agg(xxhash64(shingle), ${expectedItems}L, ${numBits}L)")
        .as("bf"))
      .createOrReplaceTempView(view)
    val pruned = Dedup.shingleRows(train, n)
      .filter(expr(s"graft_might_contain((SELECT bf FROM $view), xxhash64(shingle))"))
    sharedPairs(pruned, benchShingles, minShared)
  }

  /** Temp-view names must be unique per call: ScalaTest suites share
    * one session and run in parallel, and a rebound view under a live
    * lazy plan would silently swap the filter.
    */
  private val bloomViewSeq = new java.util.concurrent.atomic.AtomicLong(0)

  /** Verbatim-substring decontamination — the ExactSubstr form of
    * benchmark leakage scrubbing: flag (doc_id, bench_id) pairs where a
    * training doc shares a CONTIGUOUS verbatim run of at least
    * `minOverlap` tokens with a benchmark doc, reporting the maximal
    * run length. `flagged` counts distinct shared shingles scattered
    * anywhere in the doc; this detects contiguous quotation — the
    * stricter signal an eval-answer leak actually leaves, and the
    * corpus-vs-eval counterpart of `Dedup.exactSubstringOverlaps`
    * (whose anchor → diagonal → gaps-and-islands algebra it reuses
    * unchanged, via the same positionedGrams tokenizer).
    *
    * Asymmetric 100 TB shape: every bench token position anchors a
    * hashed k-gram; anchor hashes occurring at more than
    * `maxBenchPositions` bench positions are dropped LOUDLY through the
    * shared LshGuard observe channel (a k-gram that frequent across an
    * eval set is boilerplate, not an answer — and each surviving hash
    * bounds the per-match fan-out). The surviving bench anchor table —
    * thousands of eval docs × their token counts — broadcasts; the
    * corpus side is one linear positioned-gram pass that joins
    * map-side, so nothing all-to-all and nothing corpus-sized ever
    * shuffles. Matched anchors land on (train_pos − bench_pos)
    * diagonals where consecutive-anchor arithmetic reads the maximal
    * shared run, bounded per (pair, diagonal) by the overlap itself.
    */
  def substringFlagged(train: DataFrame, benchmark: DataFrame,
                       k: Int = 8, minOverlap: Int = 8,
                       maxBenchPositions: Int = 64): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    require(minOverlap >= k,
      s"minOverlap ($minOverlap) below the anchor width k ($k) is undetectable")
    LshGuard.ensureListener(train.sparkSession)
    val trainAnchors = Dedup.positionedGrams(train, k)
      .select(col("doc_id"), col("pos"), md5(col("gram")).as("h"))
    // df-cap applies directly (not capBuckets, which also drops the
    // singleton buckets that are the common, signal-bearing case here)
    val benchBuckets = Dedup.positionedGrams(benchmark, k)
      .select(col("doc_id").as("bench_id"), col("pos").as("bpos"),
        md5(col("gram")).as("h"))
      .groupBy(col("h"))
      .agg(collect_list(struct(col("bench_id"), col("bpos"))).as("members"))
    val metrics = LshGuard.dropMetrics(size(col("members")), maxBenchPositions)
    val benchAnchors = benchBuckets
      .observe(LshGuard.observationName("decontam_substr"),
        metrics.head, metrics.tail: _*)
      .filter(size(col("members")) <= maxBenchPositions)
      .select(col("h"), explode(col("members")).as("m"))
      .select(col("h"), col("m.bench_id"), col("m.bpos"))
    // within one (doc_id, bench_id, diag) partition pos ↔ bpos is a
    // bijection (bpos = pos − diag, both sides' positions unique), so
    // row_number over pos is duplicate-free and the island arithmetic
    // is exactly the symmetric op's
    trainAnchors
      .join(broadcast(benchAnchors), "h")
      .select(col("doc_id"), col("bench_id"), col("pos"),
        (col("pos") - col("bpos")).as("diag"))
      .withColumn("island",
        col("pos") - row_number().over(
          Window.partitionBy(col("doc_id"), col("bench_id"), col("diag"))
            .orderBy(col("pos"))))
      .groupBy(col("doc_id"), col("bench_id"), col("diag"), col("island"))
      .agg((count(lit(1)) + (k - 1)).as("run"))
      .groupBy(col("doc_id"), col("bench_id"))
      .agg(max(col("run")).cast("long").as("overlap_tokens"))
      .filter(col("overlap_tokens") >= minOverlap)
  }

  /** Training docs surviving substring decontamination: anti-join on
    * the flagged id set (orders smaller than the corpus, broadcasts).
    */
  def substringClean(train: DataFrame, benchmark: DataFrame,
                     k: Int = 8, minOverlap: Int = 8,
                     maxBenchPositions: Int = 64): DataFrame =
    train.join(
      substringFlagged(train, benchmark, k, minOverlap, maxBenchPositions)
        .select(col("doc_id")).distinct(),
      Seq("doc_id"), "left_anti")

  /** Training docs that survive decontamination: anti-join on the
    * flagged ids — the id set is orders smaller than the corpus and
    * broadcasts, so the corpus never shuffles.
    */
  def clean(train: DataFrame, benchmark: DataFrame,
            n: Int = 3, minShared: Int = 3,
            maxBenchDf: Int = 100): DataFrame =
    train.join(
      flagged(train, benchmark, n, minShared, maxBenchDf)
        .select(col("doc_id")).distinct(),
      Seq("doc_id"), "left_anti")

  /** FUZZY decontamination — the near-duplicate form of [[flagged]]:
    * flag (train, bench) pairs whose exact n-gram-shingle JACCARD
    * meets `minJaccard`, not just an absolute shared count. An
    * absolute floor misses a short eval doc paraphrase-embedded in a
    * long training doc differently than a relative one; production
    * leakage scrubs run both (this is the relative gate).
    *
    * Exactness over capping: unlike [[flagged]], no bench-df cap
    * applies — Jaccard is a RATIO over full distinct-shingle sets, and
    * dropping high-df shingles would silently deflate it. The bench
    * side is bounded by design (an eval set, thousands of docs), so
    * its shingle rows broadcast; the corpus side streams through the
    * shingle-keyed join exactly once. Per-train-doc shingle sizes
    * attach to the matched PAIR SLIVER (bounded by |bench| × matching
    * docs), not the other way around, and AQE re-plans that join as a
    * broadcast at runtime when the sliver is small.
    *
    * jaccard = shared / (n_a + n_b − shared): one double division of
    * exact Longs — bit-identical cross-engine, threshold-stable.
    * Returns (doc_id, bench_id, n_shared, jaccard) ordered by pair.
    */
  def fuzzyFlagged(train: DataFrame, benchmark: DataFrame,
                   n: Int = 3, minJaccard: Double = 0.02): DataFrame = {
    val tr = Dedup.shingleRows(train, n)
    val be = Dedup.shingleRows(benchmark, n)
      .withColumnRenamed("doc_id", "bench_id")
    val trSize = tr.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_a"))
    val beSize = be.groupBy(col("bench_id"))
      .agg(count(lit(1)).as("n_b"))
    tr.join(broadcast(be), "shingle")
      .groupBy(col("doc_id"), col("bench_id"))
      .agg(count(lit(1)).as("n_shared"))
      .join(broadcast(beSize), "bench_id")
      .join(trSize, "doc_id")
      .withColumn("jaccard",
        col("n_shared").cast("double") /
          (col("n_a") + col("n_b") - col("n_shared")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select(col("doc_id"), col("bench_id"),
        col("n_shared").cast("long").as("n_shared"),
        round(col("jaccard"), 6).as("jaccard"))
  }
}
