package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // absorb JVM/codegen/file-listing warmup so it isn't charged to
    // whichever query happens to run first
    try spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    catch { case _: Throwable => () }
    // focused A/B runs: SPARK_GRAFT_ONLY=q1,q2 restricts the query set,
    // SPARK_GRAFT_REPS=N overrides the repetition count (default 3).
    // Two channels ride one JSON line: "queries"/"value" keep the
    // single-shot (first-run) semantics every prior round recorded, and
    // "queries_min"/"value_min" carry the min-over-reps numbers — this
    // box's run-to-run variance band is ~2x for identical code, so the
    // min channel is the one to read for regressions (single-shot
    // charges each plan family's codegen warmup to its alphabetically
    // first member).
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").toSet).getOrElse(Set.empty[String])
    val reps = sys.env.get("SPARK_GRAFT_REPS")
      .flatMap(_.toIntOption).filter(_ >= 1).getOrElse(3)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only.contains(n) }
    // a failed query must LOOK failed: named on stderr, timed as -1 —
    // never a plausible wall-time that reads as "slow but fine"
    val results = selected.map { case (name, fn) =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).count()
          (System.nanoTime() - t0) / 1e9
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            -1.0
        }
      }
      name -> (if (times.contains(-1.0)) Seq(-1.0) else times)
    }
    def channel(f: Seq[Double] => Double): (String, Double) = {
      val per = results.map { case (k, ts) => k -> f(ts) }
      (per.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}"),
        per.map(_._2).sum)
    }
    val (qsFirst, totalFirst) = channel(_.head)
    val (qsMin, totalMin) = channel(_.min)
    println(s"""{"metric":"total","value":$totalFirst,"unit":"sec","queries":$qsFirst,""" +
      s""""value_min":$totalMin,"queries_min":$qsMin,"reps":$reps,"sf":"$sfDir"}""")
    spark.stop()
  }
}
