package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Relational Count-Min sketch — the frequency-sketch family beside
  * HLL (q22's approx_count_distinct), built AS A DATAFRAME instead of
  * a driver-held sketch object: the d×w counter table is one
  * map-side-combined aggregation (mergeable by construction — counters
  * from two corpus halves simply add, the property that makes CMS the
  * streaming/distributed frequency sketch), and probing is a broadcast
  * join + min-over-depth. No UDF, no driver object: the previous
  * implementation probed `ev.stat.countMinSketch`'s driver-merged
  * sketch through a Scala udf — the one non-codegen call site left in
  * the engine (r8 VERDICT #8).
  *
  * Estimate contract (the classical CMS bounds): est ≥ exact always —
  * structural here, every counter counts a superset of its key's rows —
  * and est ≤ exact + eps·N with probability ≥ confidence, from
  * w = ⌈e/eps⌉ buckets × d = ⌈ln 1/(1−confidence)⌉ independent rows
  * (Cormode & Muthukrishnan sizing). Hashing is xxhash64(key, row) —
  * deterministic, so runs reproduce.
  */
object Sketches {

  /** (depth d, width w) from the standard CMS sizing. */
  def cmsDims(eps: Double, confidence: Double): (Int, Int) = {
    require(eps > 0 && eps < 1 && confidence > 0 && confidence < 1,
      "need 0 < eps < 1 and 0 < confidence < 1")
    val d = math.max(1, math.ceil(math.log(1.0 / (1.0 - confidence))).toInt)
    val w = math.max(1, math.ceil(math.E / eps).toInt)
    (d, w)
  }

  /** The sketch itself: (i, bucket, cnt) counter rows — at most d×w,
    * in practice d × |observed buckets|. One explode (d rows per input
    * row, each a 16-byte (i, bucket) pair — the key string never
    * rides) into one map-side-combined count; at 100 TB this is a
    * scan-speed pass whose shuffle carries ≤ d×w rows per map
    * partition.
    */
  def countMinTable(rows: DataFrame, key: Column,
                    eps: Double, confidence: Double): DataFrame = {
    val (d, w) = cmsDims(eps, confidence)
    rows
      .select(key.cast("string").as("k"))
      .select(explode(expr(s"sequence(0, ${d - 1})")).as("i"), col("k"))
      .select(col("i"), pmod(xxhash64(col("k"), col("i")), lit(w.toLong))
        .as("bucket"))
      .groupBy(col("i"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Probe: each key's estimate is the MIN over its d counters. The
    * sketch broadcasts (≤ d×w rows by construction); a bucket no row
    * ever hashed to reads as 0 through the outer join, so unseen keys
    * estimate 0 like a real CMS.
    */
  def countMinEstimates(keys: DataFrame, key: Column, sketch: DataFrame,
                        eps: Double, confidence: Double): DataFrame = {
    val (d, w) = cmsDims(eps, confidence)
    keys
      .select(key.cast("string").as("k"))
      .distinct()
      .select(col("k"), explode(expr(s"sequence(0, ${d - 1})")).as("i"))
      .select(col("k"), col("i"),
        pmod(xxhash64(col("k"), col("i")), lit(w.toLong)).as("bucket"))
      .join(broadcast(sketch), Seq("i", "bucket"), "left_outer")
      .groupBy(col("k"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }
}
