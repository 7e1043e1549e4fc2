package graft.fs

import org.apache.spark.sql.SparkSession

/** Session-level block-geometry configuration — the `core-site.xml`
  * surface of the reference (`snackfs.block.size` /
  * `snackfs.subblock.size`, core-site.xml:37-44, read by
  * SnackFSConfiguration.scala:35-43) re-expressed as Spark conf keys,
  * so a user tunes the filesystem the same way they tune every other
  * knob of a Spark job: `--conf spark.graft.block.size=…`, a
  * `spark-defaults.conf` entry, or `spark.conf.set` at runtime.
  *
  * Precedence, most specific wins: an explicit Hadoop `Configuration`
  * key (`graft.block.size` — the direct core-site.xml analog, used by
  * the `GraftFileSystem` facade) overrides the Spark conf key, which
  * overrides the built-in 8 MB/128 MB defaults mirroring the
  * reference's.
  */
object GraftConfig {

  val BlockSizeKey = "spark.graft.block.size"
  val SubBlockSizeKey = "spark.graft.subblock.size"

  /** (subBlockSize, blockSize) from the session conf, validated with
    * the same invariant every chunking entry point requires: block a
    * positive multiple of subblock (DataPlane.chunk's `require`, the
    * reference's implicit layout contract).
    */
  // a malformed conf value must name its key — a bare
  // NumberFormatException("for input string: ...") tells the operator
  // nothing about WHICH of the two size confs to fix
  private def intConf(spark: SparkSession, key: String, dflt: Int): Int =
    spark.conf.getOption(key).map { v =>
      v.trim.toIntOption.getOrElse(throw new IllegalArgumentException(
        s"$key must be an integer, got '$v'"))
    }.getOrElse(dflt)

  def geometry(spark: SparkSession): (Int, Int) = {
    val sub = intConf(spark, SubBlockSizeKey, DataPlane.DefaultSubBlock)
    val block = intConf(spark, BlockSizeKey, DataPlane.DefaultBlock)
    require(sub > 0 && block > 0 && block % sub == 0,
      s"$BlockSizeKey ($block) must be a positive multiple of " +
        s"$SubBlockSizeKey ($sub)")
    (sub, block)
  }

  def subBlockSize(spark: SparkSession): Int = geometry(spark)._1
  def blockSize(spark: SparkSession): Int = geometry(spark)._2
}
