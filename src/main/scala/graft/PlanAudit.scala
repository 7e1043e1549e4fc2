package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints the formatted physical plan of selected driver
  * queries so scan pruning (`PushedFilters`/`ReadSchema`), join strategy
  * (BroadcastHashJoin vs SortMergeJoin), and WholeStageCodegen spans can
  * be inspected after every change.
  *
  *   sbt "runMain graft.PlanAudit [sfDir] [query ...]"
  *
  * With SPARK_GRAFT_EXEC=1 each query is executed first and the FINAL
  * adaptive plan is printed instead of the static one — this is the only
  * view that shows AQE's runtime stage reuse (ReusedExchange nodes),
  * which the pre-execution `explain` cannot.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q01_flagship", "q03_filter_scan", "q04_join_region",
        "dedup_minhash", "ann_brute_topk", "fs_du")
    val exec = sys.env.get("SPARK_GRAFT_EXEC").contains("1")
    val spark = GraftSession.getOrCreate("graft-plan-audit",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      println(s"\n===== $name =====")
      val df = SparkEntry.queries(name)(spark, sfDir)
      if (exec) {
        // collect() (not count()) so THIS plan executes — count() derives
        // a new Dataset and would leave the audited plan un-finalized
        df.collect()
        println(df.queryExecution.executedPlan.toString)
      } else df.explain("formatted")
    }
    spark.stop()
  }
}
