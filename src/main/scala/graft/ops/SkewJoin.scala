package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-robust equi-join via key salting — the manual fallback for the
  * cases AQE's skew-join splitting can't reach (e.g. a build side too
  * large to broadcast joined on a power-law key).
  *
  * The probe side gets a deterministic salt in [0, saltFactor) derived
  * from caller-chosen columns (NOT the join key — the point is to spread
  * one hot key); the build side is replicated once per salt value. The
  * join key becomes (key, salt), so one hot key's rows fan out across
  * saltFactor reducers instead of one. Result set is EXACTLY the plain
  * join's — replication on one side × deterministic assignment on the
  * other neither drops nor duplicates matches.
  */
object SkewJoin {

  def saltedJoin(probe: DataFrame, build: DataFrame,
                 key: String, saltFactor: Int,
                 probeSaltCols: Seq[String]): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    val salted = probe.withColumn("__salt",
      pmod(hash(probeSaltCols.map(col): _*), lit(saltFactor)))
    val replicated = build.withColumn("__salt",
      explode(expr(s"sequence(0, ${saltFactor - 1})")))
    salted
      .join(replicated, Seq(key, "__salt"))
      .drop("__salt")
  }

  /** Two-path skew join: salt ONLY the hot keys.
    *
    * `saltedJoin` above pays the saltFactor× build-side replication on
    * EVERY key — at 100 TB that is a self-inflicted 8× I/O tax when the
    * skew lives in a handful of keys. Here a first cheap aggregation
    * (map-side-combined count per key, tiny result) finds keys whose
    * probe-side row count exceeds `hotThreshold`; that key set broadcasts
    * into semi/anti filters splitting both inputs. The hot slice takes
    * the salted path, the (vastly larger, but skew-free) cold slice takes
    * the plain shuffle join, and the union is EXACTLY the plain join's
    * result set — the split is a partition of the key space.
    *
    * With no hot keys the overhead is one count-aggregate over the probe
    * side and two broadcast filters — the plan degenerates to the plain
    * join, which is the right default posture.
    */
  def twoPathJoin(probe: DataFrame, build: DataFrame,
                  key: String, saltFactor: Int,
                  probeSaltCols: Seq[String],
                  hotThreshold: Long = 100000L): DataFrame = {
    require(hotThreshold > 0, "hotThreshold must be positive")
    val hotKeys = broadcast(
      probe.groupBy(col(key)).agg(count(lit(1)).as("__cnt"))
        .filter(col("__cnt") > hotThreshold)
        .select(col(key)))
    val hotOut = saltedJoin(
      probe.join(hotKeys, Seq(key), "left_semi"),
      build.join(hotKeys, Seq(key), "left_semi"),
      key, saltFactor, probeSaltCols)
    val coldOut = probe.join(hotKeys, Seq(key), "left_anti")
      .join(build.join(hotKeys, Seq(key), "left_anti"), Seq(key))
    hotOut.unionByName(coldOut)
  }
}
