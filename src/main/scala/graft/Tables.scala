package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish parquet tables (TESTDATA.md).
  *
  * All queries take the scale-factor directory as a parameter so the same
  * code runs at sf0.001 (smoke), sf0.01 (DuckDB oracle) and sf0.1 (bench) —
  * and, unchanged, against a 100 TB warehouse directory on a real cluster:
  * nothing below ever collects a table to the driver.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** events.ts has shipped in two physical forms across driver refreshes:
    * parquet TIMESTAMP(NANOS) (read as a long via nanosAsLong, then ns → µs
    * with integer division — double division would lose precision at 1.7e18
    * ns epochs) and plain timestamp[us] without UTC adjustment (Spark reads
    * it as TIMESTAMP_NTZ). Normalize both to session-zoned TIMESTAMP so
    * every downstream window/watermark/epoch computation — and the DuckDB
    * oracle, which reads the same file as a naive timestamp under the UTC
    * session zone — sees identical wall-clock instants.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampType}
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampType => raw
      case _ => raw.withColumn("ts", col("ts").cast(TimestampType))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Row-group counts per parquet file, memoized on (path, size, mtime)
    * — one driver-side footer read, no Spark job. */
  private val rowGroupMemo =
    new java.util.concurrent.ConcurrentHashMap[(String, Long, Long), Int]()

  private def rowGroups(s: SparkSession, path: String): Int =
    // memo keyed on the Hadoop FileStatus of the SAME Path the footer
    // read uses (r17 ADVICE: java.io.File length/mtime are 0 for
    // non-local URIs, so a replaced hdfs://-style file never
    // invalidated); a footer-read failure returns the "wide enough"
    // sentinel WITHOUT memoizing, so a transient error cannot
    // permanently disable the guard for that file
    try {
      val p = new org.apache.hadoop.fs.Path(path)
      val conf = s.sparkContext.hadoopConfiguration
      val st = p.getFileSystem(conf).getFileStatus(p)
      rowGroupMemo.computeIfAbsent(
        (path, st.getLen, st.getModificationTime), _ => {
          val in =
            org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, conf)
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try r.getFooter.getBlocks.size()
          finally r.close()
        })
    } catch { case _: Throwable => Int.MaxValue }

  /** Map-phase width guard for CPU-heavy aggregations over one table: a
    * parquet ROW GROUP is the scan's split atom, so a file with fewer
    * row groups than cores serializes the whole scan+partial-aggregate
    * phase into that many tasks no matter how the split planner sizes
    * byte ranges (the driver testdata ships one row group per table —
    * every heavy relational aggregation ran single-threaded). When the
    * footer says the layout cannot keep the session busy, insert ONE
    * deterministic hash repartition on `key` immediately after the read
    * (guide §2.5: "input skew — one huge unsplittable file …
    * repartition immediately after the read"; hash on a real column,
    * never round-robin, so retried tasks reproduce their assignment and
    * no pre-shuffle sort is paid). On a production layout with ≥ cores
    * row groups this is a NO-OP — the gate is one memoized driver-side
    * footer read. Callers are aggregations whose measured cost is the
    * serial map phase, all of whose aggregates are order-independent
    * (DECIMAL sums / counts / min-max / HLL), so results are unchanged.
    */
  def widenedForAgg(s: SparkSession, d: String, name: String,
                    key: org.apache.spark.sql.Column): DataFrame = {
    val df = table(s, d, name)
    val cores = s.sparkContext.defaultParallelism
    if (rowGroups(s, s"$d/$name.parquet") >= math.max(2, cores / 2)) df
    else df.repartition(key)
  }
}
