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
}
