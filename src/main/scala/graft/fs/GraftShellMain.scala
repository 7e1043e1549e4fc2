package graft.fs

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types.{BinaryType, StringType, StructField, StructType}

import graft.catalog.FsCatalog

/** Process-boundary entry point for the shell — the JVM class the
  * `bin/graftfs` wrapper execs, mirroring the reference's executable
  * script layer (`src/main/scripts/snackfs:35` execs
  * `org.apache.hadoop.fs.SnackFSShell "$@"`). One invocation = one
  * verb: build (or load) the filesystem state, dispatch through
  * [[GraftShell.run]], print stdout/stderr, exit with the shell's
  * code (-1 surfaces as 255, the reference's `System.exit(-1)`
  * behavior).
  *
  * State across invocations: the reference shell is ephemeral per
  * process because Cassandra holds the filesystem; here the persisted
  * catalog + chunk parquet tables play that role. `GRAFT_FS_STATE=dir`
  * loads `dir/catalog` + `dir/chunks` before the verb and saves both
  * back after it, so consecutive CLI invocations see each other's
  * writes. Unset, each invocation starts from an empty root — enough
  * for -help and smoke use.
  */
object GraftShellMain {

  private val chunkSchema = StructType(Seq(
    StructField("path", StringType), StructField("data", BinaryType)))

  def emptyFs(spark: SparkSession): GraftFs = {
    val root = FsCatalog.dirInode("/", "graft")
    val emptyChunks = DataPlane.chunk(
      spark.createDataFrame(
        java.util.Collections.emptyList[Row](), chunkSchema))
    GraftFs(FsCatalog(spark.createDataset(Seq(root))(
      FsCatalog.inodeEncoder)), emptyChunks)
  }

  def loadFs(spark: SparkSession, dir: String): GraftFs =
    GraftFs(FsCatalog.load(spark, s"$dir/catalog"),
      spark.read.parquet(s"$dir/chunks"))

  /** Verbs that change filesystem state — only these re-persist it
    * (a read verb's plan still READS from the state parquet; writing
    * the same path it scans is an overwrite-while-reading error).
    */
  val MutatingVerbs: Set[String] = Set(
    "-put", "-copyFromLocal", "-moveFromLocal",
    "-mv", "-cp", "-rm", "-rmr", "-mkdir", "-touchz")

  def saveFs(fs: GraftFs, dir: String): Unit = {
    // compact() flattens both planes to materialized LogicalRDD leaves,
    // so the writes below never overwrite a path their own plan scans
    // (the loaded state's chunks frame still points at dir/chunks)
    val flat = fs.compact()
    flat.catalog.save(s"$dir/catalog")
    flat.chunks.write.mode("overwrite").parquet(s"$dir/chunks")
  }

  def main(argv: Array[String]): Unit = {
    // -help and usage errors must not pay a session boot: answer from
    // the static help tables exactly like the dispatcher would
    if (argv.isEmpty) {
      System.err.println(ShellHelp.helpAll)
      sys.exit(255)
    }
    if (argv(0) == "-help") {
      val topic = argv.drop(1).headOption
      println(topic.flatMap(t => ShellHelp.help(t).headOption)
        .getOrElse(ShellHelp.helpAll))
      sys.exit(0)
    }
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("GRAFT_MASTER", "local[*]"))
      .appName("graftfs")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions",
        Runtime.getRuntime.availableProcessors().toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val stateDir = sys.env.get("GRAFT_FS_STATE")
    val initial = stateDir
      .filter(d => java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$d/catalog")))
      .map(loadFs(spark, _))
      .getOrElse(emptyFs(spark))
    val shell = new GraftShell(initial,
      FsContext.initialize("graftfs://graft",
        Option(System.getProperty("user.name")).getOrElse("graft")))
    val code =
      try {
        val res = shell.run(argv)
        res.out.foreach(println)
        res.err.foreach(System.err.println)
        if (res.code == 0 && MutatingVerbs.contains(argv(0)))
          stateDir.foreach { d =>
            val snap = shell.fs
            try saveFs(snap, d) finally shell.releaseSnapshot(snap)
          }
        res.code
      } finally shell.close()
    spark.stop()
    sys.exit(if (code == 0) 0 else 255)
  }
}
