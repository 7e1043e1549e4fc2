package graft.ops

import org.apache.spark.sql.DataFrame
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

  /** Contaminated (doc_id, bench_id, n_shared) pairs: training docs
    * sharing ≥ `minShared` distinct `n`-gram shingles with a benchmark
    * doc. `train` and `benchmark` both need (doc_id, text).
    */
  def flagged(train: DataFrame, benchmark: DataFrame,
              n: Int = 3, minShared: Int = 3,
              maxBenchDf: Int = 100): DataFrame = {
    LshGuard.ensureListener(train.sparkSession)
    val benchBuckets = Dedup.shingleRows(benchmark, n)
      .groupBy(col("shingle"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
    // capBuckets would also drop SINGLETON buckets (right for pair
    // generation, wrong here — df=1 is the common, signal-bearing
    // case), so the df cap applies directly with the same loud metrics
    val metrics = LshGuard.dropMetrics(size(col("ids")), maxBenchDf)
    val benchShingles = benchBuckets
      .observe(LshGuard.observationName("decontam"), metrics.head, metrics.tail: _*)
      .filter(size(col("ids")) <= maxBenchDf)
      .select(col("shingle"), explode(col("ids")).as("bench_id"))
    Dedup.shingleRows(train, n)
      .join(benchShingles, "shingle")
      .groupBy(col("doc_id"), col("bench_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

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
}
