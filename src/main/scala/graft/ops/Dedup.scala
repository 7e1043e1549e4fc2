package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators for a training-data pipeline.
  *
  * Scale posture: exact dedup is a single hash-shuffle on a 32-byte key;
  * MinHash-LSH is the banded form — shingle → k minhashes → b band
  * hashes → equi-join WITHIN band buckets. Candidate generation is a
  * self-equi-join on (band_idx, band_hash), never an all-pairs cross
  * join: at 100 TB the join keys hash-partition and each bucket is tiny.
  * All hashing is Spark's murmur3/xxhash64 (deterministic, seedable) —
  * no RNG state to ship to executors.
  */
object Dedup {

  /** Exact dedup stats over sha256(text). */
  def exactStats(docs: DataFrame): DataFrame =
    docs.agg(
      count(lit(1)).as("n_docs"),
      countDistinct(sha2(col("text"), 256)).as("n_unique"))

  /** Exact dedup, keep-first: survivors = min doc_id per content hash. */
  def keepFirst(docs: DataFrame): DataFrame =
    docs
      .groupBy(sha2(col("text"), 256).as("sha"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))

  /** Word n-gram shingle set (distinct). */
  def shingles(n: Int = 3) =
    expr(s"""array_distinct(
              transform(sequence(0, greatest(size(regexp_extract_all(lower(text), '\\\\w+', 0)) - $n, 0)),
                        i -> concat_ws(' ', slice(regexp_extract_all(lower(text), '\\\\w+', 0), i + 1, $n))))""")

  /** MinHash signature: k independent hash functions via murmur3 with the
    * function index mixed in; sig[j] = min over shingles.
    */
  def minhashSig(k: Int) =
    expr(s"transform(sequence(0, ${k - 1}), j -> array_min(transform(shingles, s -> hash(s, j))))")

  /** Banded LSH: b band hashes over r-row slices of the signature. */
  def bandHashes(b: Int, r: Int) =
    expr(s"transform(sequence(0, ${b - 1}), bi -> xxhash64(slice(sig, bi * $r + 1, $r), bi))")

  /** Candidate pairs from banded MinHash-LSH, exact-Jaccard-verified.
    *
    * Returns (id_a, id_b, jaccard) with id_a < id_b for every candidate
    * pair sharing ≥1 band bucket; `threshold` filters verified near-dups.
    * k = b*r hash functions; the (b, r) choice tunes the S-curve.
    */
  def minhashPairs(docs: DataFrame,
                   shingleN: Int = 3,
                   b: Int = 8,
                   r: Int = 4,
                   threshold: Double = 0.5): DataFrame = {
    val k = b * r
    val sigs = docs
      .select(col("doc_id"), shingles(shingleN).as("shingles"))
      .filter(size(col("shingles")) > 0)
      .withColumn("sig", minhashSig(k))
      .withColumn("bands", bandHashes(b, r))

    val bandRows = sigs.select(
      col("doc_id"), col("shingles"),
      posexplode(col("bands")).as(Seq("band_idx", "band_hash")))

    val a = bandRows.select(
      col("band_idx"), col("band_hash"),
      col("doc_id").as("id_a"), col("shingles").as("sh_a"))
    val bSide = bandRows.select(
      col("band_idx").as("band_idx_b"), col("band_hash").as("band_hash_b"),
      col("doc_id").as("id_b"), col("shingles").as("sh_b"))

    a.join(bSide,
        col("band_idx") === col("band_idx_b") &&
        col("band_hash") === col("band_hash_b") &&
        col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** SimHash: 64-bit signature = sign of per-bit vote sums over token
    * xxhash64 values. Near-dup candidates = equal signature (or banded
    * by 16-bit quarters for hamming ≤ tolerance at scale).
    */
  def simhash(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        expr("array_distinct(regexp_extract_all(lower(text), '\\\\w+', 0))").as("toks"))
      .filter(size(col("toks")) > 0)
      .withColumn("hashes", expr("transform(toks, t -> xxhash64(t))"))
      // bit b of the signature = 1 iff #tokens with bit b set > #tokens/2
      .withColumn("sig",
        expr("""aggregate(sequence(0, 63), CAST(0 AS BIGINT),
                 (acc, b) -> acc | CAST(
                   IF(size(filter(hashes, h -> ((h >> b) & 1) = 1)) * 2 > size(hashes),
                      shiftleft(CAST(1 AS BIGINT), b), 0) AS BIGINT))"""))
      .select(col("doc_id"), col("sig").as("simhash"))

  /** Exact n-gram Jaccard for an explicit candidate set — the
    * verification stage shared by LSH (already folded into
    * minhashPairs) exposed standalone for spec use.
    */
  def jaccard(docs: DataFrame, idA: Long, idB: Long, n: Int = 3): Double = {
    val sh = docs.filter(col("doc_id").isin(idA, idB))
      .select(col("doc_id"), shingles(n).as("sh"))
    val rows = sh.collect().map(r => r.getLong(0) ->
      r.getSeq[String](1).toSet).toMap
    val (x, y) = (rows(idA), rows(idB))
    if (x.isEmpty && y.isEmpty) 1.0
    else x.intersect(y).size.toDouble / x.union(y).size
  }
}
