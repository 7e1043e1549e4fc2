package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.must.Matchers

import graft.{Tables, TestSpark}

/** IVF at REALISTIC centroid counts — the r14 verdict's stretch #10:
  * every shipped ANN channel trains toy codebooks (numCentroids = 16)
  * and the √N scale rule was stated, not exercised. This spec builds a
  * generated 100k-vector corpus (50 perturbed replicas of the sf0.1
  * embeddings — the ScalingSpec sf1 recipe), trains K = ⌈√N⌉ = 317
  * centroids ONCE, and holds the SAME per-query recall gate the oracle
  * channels use (≥4 of the true top-5) while probing 10% of the
  * buckets. The bucket-mass assertion pins that the larger K actually
  * PRUNES — it is derived from the real index frame (sum of the nprobe
  * largest buckets), so a degenerate clustering that funnels the corpus
  * into few buckets fails even if recall passes by near-brute scanning.
  * Measured numbers print for the PLANS.md table row.
  */
class IvfScaleSpec extends AnyFlatSpec with Matchers {
  private lazy val spark = TestSpark.spark

  private val Replicas = 50

  /** 100k generated vectors: each replica rotates/shifts the base
    * embeddings deterministically so replicas don't collapse onto one
    * another (a naive clone would make every true neighbor list 50
    * exact twins and trivialize recall).
    */
  private lazy val bigEmb: DataFrame = {
    val base = Tables.embeddings(spark, "/root/testdata/sf0.1")
    (0 until Replicas).map { k =>
      base.select(
        (col("vec_id") + lit(k * 1000000L)).as("vec_id"),
        transform(col("embedding"),
          x => x * lit(1.0f + (k % 7) * 0.011f) + lit((k % 5) * 0.004f))
          .as("embedding"),
        col("label"))
    }.reduce(_ unionByName _).localCheckpoint(true)
  }

  it must "hold the recall gate at K = sqrt(N) centroids with 10% probes" taggedAs graft.SlowTest in {
    val n = bigEmb.count()
    val k = math.ceil(math.sqrt(n.toDouble)).toInt // 317 at 100k
    val nprobe = math.max(1, k / 10)
    val queries = bigEmb.filter(col("vec_id") < 20).localCheckpoint(true)

    val t0 = System.nanoTime()
    val cents = Similarity.kmeansCentroids(bigEmb, k, iters = 3)
      .localCheckpoint(true)
    val tTrain = (System.nanoTime() - t0) / 1e9
    val index = Similarity.assignBuckets(bigEmb, cents).localCheckpoint(true)

    val t1 = System.nanoTime()
    val approx = Similarity.ivfTopKIndexed(queries, index, cents,
        nprobe = nprobe, k = 5)
      .select(col("q_id"), col("neighbor_id"))
    val brute = Similarity.bruteTopK(queries, bigEmb, 5)
      .select(col("q_id").as("bq"), col("neighbor_id").as("bn"))
    val hits = approx
      .join(brute, col("q_id") === col("bq") &&
        col("neighbor_id") === col("bn"), "left_semi")
      .groupBy(col("q_id")).agg(count(lit(1)).as("n_hits"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val tSearch = (System.nanoTime() - t1) / 1e9

    // probed mass upper bound: the nprobe LARGEST buckets, from the
    // real index frame
    val probedMass = index.groupBy(col("bucket")).count()
      .orderBy(col("count").desc).limit(nprobe)
      .agg(sum(col("count"))).head.getLong(0)

    info(f"N=$n K=$k nprobe=$nprobe: train ${tTrain}%.1f s, " +
      f"search+brute ${tSearch}%.1f s, worst-case probed mass " +
      f"$probedMass/${n} (${100.0 * probedMass / n}%.1f%%), " +
      f"recall hits ${hits.values.sum}/100")
    (0L until 20L).foreach { q =>
      withClue(s"query $q recall@5 (floor 4): ") {
        hits.getOrElse(q, 0L) must be >= 4L
      }
    }
    // pruning is real: even the heaviest nprobe buckets hold a bounded
    // corpus share (10% of buckets -> well under a third of the mass)
    probedMass.toDouble must be < n * 0.34
  }

  it must "hold the IVF-PQ recall gate at REALISTIC (m=8, ksub=256) with sample-bounded training" taggedAs graft.SlowTest in {
    // The r15 verdict's missing half of the √N proof: PQ/IVF-PQ
    // codebooks shipped proven only at toy (m=4, ksub=16), and the
    // 48 s k-means build left training cost O(corpus). This trains the
    // classic 8-byte PQ shape (m=8 subspaces × 256 centroids over
    // dim=64) on the 100k corpus TWICE — full-corpus vs the bounded
    // hash sample (pqCodebooksSampled: ONE corpus pass builds the
    // sample, every k-means iteration runs in-memory) — and pins that
    // sample training (a) is materially cheaper and (b) LOSES NOTHING:
    // same recall floor, sampled-vs-full hit totals within noise of
    // each other, under the same √N coarse quantizer at 10% probes.
    val n = bigEmb.count()
    val kCoarse = math.ceil(math.sqrt(n.toDouble)).toInt
    val nprobe = math.max(1, kCoarse / 10)
    val queries = bigEmb.filter(col("vec_id") < 20).localCheckpoint(true)
    val brute = Similarity.bruteTopK(queries, bigEmb, 5)
      .select(col("q_id").as("bq"), col("neighbor_id").as("bn"))
      .localCheckpoint(true)

    val tc0 = System.nanoTime()
    val coarse = Similarity.kmeansCentroidsSampled(bigEmb, kCoarse,
      iters = 3).localCheckpoint(true)
    val tCoarse = (System.nanoTime() - tc0) / 1e9

    val t0 = System.nanoTime()
    val booksSampled = Similarity.pqCodebooksSampled(bigEmb, m = 8,
      ksub = 256, iters = 2, dim = 64).localCheckpoint(true)
    val tSampled = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val booksFull = Similarity.pqCodebooks(bigEmb, m = 8, ksub = 256,
      iters = 2, dim = 64).localCheckpoint(true)
    val tFull = (System.nanoTime() - t1) / 1e9
    booksSampled.count() must be(8L * 256L)
    booksFull.count() must be(8L * 256L)

    def hitsOf(books: DataFrame): Long =
      Similarity.ivfpqTopKWith(queries, bigEmb, coarse, books,
          nprobe = nprobe, k = 5, cand = 50)
        .select(col("q_id"), col("neighbor_id"))
        .join(brute, col("q_id") === col("bq") &&
          col("neighbor_id") === col("bn"), "left_semi")
        .count()
    val ts0 = System.nanoTime()
    val hitsSampled = hitsOf(booksSampled)
    val tSearch = (System.nanoTime() - ts0) / 1e9
    val hitsFull = hitsOf(booksFull)

    info(f"N=$n m=8 ksub=256 K=$kCoarse nprobe=$nprobe: coarse(sampled) " +
      f"${tCoarse}%.1f s, codebooks sampled ${tSampled}%.1f s vs full " +
      f"${tFull}%.1f s (${tFull / tSampled}%.1fx), search ${tSearch}%.1f s, " +
      f"recall sampled $hitsSampled/100 vs full $hitsFull/100")
    // sample training must not cost recall: same floor as the IVF gate
    // in aggregate, and within noise of the full-corpus training
    hitsSampled must be >= 80L
    hitsFull must be >= 80L
    (hitsSampled - hitsFull).abs must be <= 10L
    // and must be the materially cheaper build (the 100 TB argument:
    // full-corpus training pays m·iters corpus scans, the sample pays
    // one corpus pass + in-memory iterations)
    tSampled must be < tFull
  }

  behavior of "Similarity.pcaProject"

  it must "keep the embedding contract and neighbor sets on low-rank data" in {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    // rank-4 re-embedding (first 4 components through a fixed basis):
    // an 8-dim PCA must capture the geometry whole
    val lowRank = emb.select(col("vec_id"),
      expr("""transform(sequence(0, 63), j ->
        CAST(aggregate(sequence(0, 3), 0.0D, (acc, b) ->
          acc + embedding[b] *
            (CAST((b * 73 + j * 37) % 19 AS DOUBLE) - 9.0D) / 9.0D)
          AS FLOAT))""").as("embedding"))
    val proj = Similarity.pcaProject(lowRank, 8)
    // output keeps the (vec_id, array<float> embedding) contract
    proj.schema("embedding").dataType.simpleString must be("array<float>")
    proj.select(org.apache.spark.sql.functions.size(col("embedding")))
      .distinct().collect().map(_.getInt(0)).toSeq must be(Seq(8))
    // every query keeps >=4 of its true top-5 through the projection
    Similarity.pcaRecall(lowRank.filter(col("vec_id") < 10), lowRank,
        dims = 8, k = 5, floor = 4)
      .collect().forall(_.getBoolean(1)) must be(true)
  }
}
