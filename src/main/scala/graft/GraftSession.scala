package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions

import graft.functions.GraftFunctions

/** A1/A11/A12 analog: engine bootstrap and session bookkeeping.
  *
  * The reference's `initialize` wires config + store + cwd
  * (SnackFS.scala:51-73); here the equivalent is a tuned SparkSession —
  * AQE on (runtime re-plan + skew-join handling), shuffle partitions
  * sized to the machine instead of the 200 default, 128 MB split size
  * matching the reference's block size (SnackFSConfiguration.scala:42) —
  * plus registration of graft's native expressions.
  */
object GraftSession {

  def builder(appName: String = "graft", cores: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (128 * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Static conf, must be set before the first session: the default
      // 100-entry Janino class cache thrashes the moment a session runs
      // more than ~a dozen distinct query shapes, and every re-run then
      // recompiles all its generated classes (~100-300 ms each, on the
      // driver, serialized) and executes them cold. A long-lived engine
      // session re-running a query mix is the expected deployment —
      // size the cache for it.
      .config("spark.sql.codegen.cache.maxEntries", "5000")

  def getOrCreate(appName: String = "graft", cores: Int = 32): SparkSession = {
    val spark = builder(appName, cores).getOrCreate()
    GraftFunctions.register(spark)
    spark
  }
}

/** `spark.sql.extensions`-style injection for clusters that configure
  * extensions declaratively:
  * `--conf spark.sql.extensions=graft.GraftSessionExtensions`.
  */
class GraftSessionExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_cosine"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[graft.functions.CosineSimilarity].getName, "graft_cosine"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          graft.functions.CosineSimilarity(exprs(0), exprs(1))))
    ext.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_int_dot"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[graft.functions.IntDot].getName, "graft_int_dot"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          graft.functions.IntDot(exprs(0), exprs(1))))
    ext.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_topk"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[graft.functions.TopKByScore].getName, "graft_topk"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          graft.functions.TopKByScore(exprs(0), exprs(1), exprs(2))))
    ext.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_nfc"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[graft.functions.NfcNormalize].getName, "graft_nfc"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          graft.functions.NfcNormalize(exprs(0))))
    ext.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_entity_decode"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[graft.functions.HtmlEntityDecode].getName,
          "graft_entity_decode"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          graft.functions.HtmlEntityDecode(exprs(0))))
  }
}
