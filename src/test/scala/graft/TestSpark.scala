package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all specs (Spark sessions are expensive;
  * ScalaTest suites here run in a single forked JVM — build.sbt).
  */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      // the declarative cluster path — every suite runs through it, and
      // the extensions spec asserts it resolves graft_* with NO
      // imperative register call
      .config("spark.sql.extensions", "graft.GraftSessionExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
