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

  /** Pointer file naming the current complete version subdirectory.
    * State is persisted write-new-then-flip: saveFs writes BOTH planes
    * into a fresh `v<stamp>/` dir and only then atomically moves a tmp
    * pointer over `CURRENT` — so a crash anywhere mid-save leaves
    * `CURRENT` naming the previous COMPLETE version, never a state dir
    * with a catalog but no chunks (which would make every subsequent
    * CLI invocation die on the missing chunks path).
    */
  private val CurrentPtr = "CURRENT"

  /** The directory holding the current complete version's
    * catalog/ + chunks/, or None when no complete state exists.
    */
  def currentStateDir(dir: String): Option[String] = {
    import java.nio.file.{Files, Paths}
    val ptr = Paths.get(dir, CurrentPtr)
    val root =
      if (Files.exists(ptr))
        Some(Paths.get(dir, new String(Files.readAllBytes(ptr),
          "UTF-8").trim))
      else Some(Paths.get(dir)) // pre-pointer flat layout
    root.filter(r => Files.exists(r.resolve("catalog")) &&
      Files.exists(r.resolve("chunks"))).map(_.toString)
  }

  def loadFs(spark: SparkSession, dir: String): GraftFs = {
    val root = currentStateDir(dir).getOrElse(sys.error(
      s"no complete persisted state under $dir"))
    val baseCat = FsCatalog.load(spark, s"$root/catalog")
    val baseChunks = spark.read.parquet(s"$root/chunks")
    // WAL overlay fold (r17): the persisted format is ONE format —
    // deltas other writers committed (SharedStateStore mutations, the
    // facade's write-through of post-mount creates) must be visible to
    // every loader, not only to overlay-aware readers. Bounded by the
    // wal tail; superseded base rows filter out, upserts and payload
    // files union in as their own leaves.
    val (oInodes, oPayloads) =
      new SharedStateStore(dir).overlaySnapshot()
    if (oInodes.isEmpty && oPayloads.isEmpty) GraftFs(baseCat, baseChunks)
    else {
      import org.apache.spark.sql.functions.col
      val affected = (oInodes.keys ++ oPayloads.keys).toSeq.distinct
      val upserts = oInodes.collect { case (_, Some(n)) => n }.toSeq
      val cat = FsCatalog(
        baseCat.inodes.filter(!col("path").isin(affected: _*))
          .unionByName(spark.createDataset(upserts)(FsCatalog.inodeEncoder)))
      val payloadAffected = oPayloads.keys.toSeq
      val payloadFiles = oPayloads.values.flatten
        .map(_.toString).toSeq.distinct.sorted
      val chunkCols = baseChunks.columns
      val chunks = (baseChunks.filter(
          if (payloadAffected.isEmpty) org.apache.spark.sql.functions.lit(true)
          else !col("path").isin(payloadAffected: _*)) +:
        payloadFiles.map(f => spark.read.parquet(f)
          .select(chunkCols.map(col).toIndexedSeq: _*)))
        .reduce(_ unionByName _)
      GraftFs(cat, chunks)
    }
  }

  /** Verbs that change filesystem state — only these re-persist it
    * (a read verb's plan still READS from the state parquet; writing
    * the same path it scans is an overwrite-while-reading error).
    */
  val MutatingVerbs: Set[String] = Set(
    "-put", "-copyFromLocal", "-moveFromLocal",
    "-mv", "-cp", "-rm", "-rmr", "-mkdir", "-touchz")

  def saveFs(fs: GraftFs, dir: String): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    // normalized() flattens both planes to materialized LogicalRDD
    // leaves AND rewrites chunk rows to CURRENT paths (the alias map is
    // driver metadata — persisted state must be self-describing
    // parquet), so the writes below never depend on the previous
    // version's files (the loaded state's chunks frame still points at
    // the old dir)
    val flat = fs.normalized()
    val base = Paths.get(dir)
    Files.createDirectories(base)
    val prev = currentStateDir(dir)
    val version = s"v${System.nanoTime()}"
    flat.catalog.save(s"$dir/$version/catalog")
    // range-partitioned + sorted on the (path, block_id) lookup key:
    // parquet row-group min/max statistics then prune a one-block
    // fetch (SavedState.readBlock, the mount's executor-side read
    // path) to one row group of one file instead of a corpus scan —
    // the same stats-anchoring FsCatalog.save applies to the catalog
    flat.chunks
      .repartitionByRange(8, org.apache.spark.sql.functions.col("path"),
        org.apache.spark.sql.functions.col("block_id"))
      .sortWithinPartitions("path", "block_id", "sub_id")
      .write.mode("overwrite").parquet(s"$dir/$version/chunks")
    // flip the pointer atomically — the only visible commit point
    val tmp = base.resolve(s".$CurrentPtr.tmp")
    Files.write(tmp, version.getBytes("UTF-8"))
    Files.move(tmp, base.resolve(CurrentPtr),
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
    // best-effort prune: EVERY v* dir except the one CURRENT now names
    // (not just the immediately-previous version — a save that crashed
    // after writing its planes but before the pointer flip leaves an
    // orphan dir no pointer ever names, and repeated torn saves must
    // not grow the state dir unboundedly) plus the legacy flat layout's
    // planes when superseded
    val keep = Paths.get(dir, version)
    val l = Files.list(base)
    try {
      import scala.jdk.CollectionConverters._
      l.iterator().asScala
        .filter(p => p.getFileName.toString.startsWith("v") &&
          Files.isDirectory(p) && p != keep)
        .foreach(graft.PlanHygiene.deleteRecursively)
    } finally l.close()
    prev.map(Paths.get(_)).filter(_ == base).foreach { flat =>
      graft.PlanHygiene.deleteRecursively(flat.resolve("catalog"))
      graft.PlanHygiene.deleteRecursively(flat.resolve("chunks"))
    }
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
    val mutating = MutatingVerbs.contains(argv(0))
    // CONCURRENT CLI invocations (r17 — supersedes the single-driver
    // documented contract for mutations): a mutating invocation
    // brackets its whole load → verb → save cycle under the SHARED
    // namespace lock (SharedStateStore.NamespaceKey — the same key
    // every writer of this layout uses), so two processes can no
    // longer interleave their cycles and silently drop each other's
    // committed state. Read verbs stay lock-free: they see the
    // committed prefix (version flips and wal-delta renames are both
    // atomic). A crashed holder is operator-recovered with
    // SharedFileLocks.breakStale.
    val heldLock: Option[(String, java.util.UUID)] =
      stateDir.filter(_ => mutating).map { d =>
        val root = s"$d/locks"
        graft.catalog.SharedFileLocks.acquireBlocking(root,
            SharedStateStore.NamespaceKey, timeoutMs = 120000) match {
          case Some(tok) => (root, tok)
          case None =>
            System.err.println(
              "graftfs: timed out acquiring the shared state lock " +
                s"under $root — another invocation holds it, or a " +
                "crashed one leaked it (SharedFileLocks.breakStale " +
                "is the operator recovery verb)")
            spark.stop()
            sys.exit(253)
            throw new IllegalStateException("unreachable")
        }
      }
    // wal deltas committed BEFORE this invocation's load are folded
    // into the version this invocation saves (loadFs applies them), so
    // a successful save prunes exactly those — never deltas a later
    // writer might append (impossible while the lock is held anyway)
    def walDeltas(d: String): Seq[java.nio.file.Path] = {
      import scala.jdk.CollectionConverters._
      val w = java.nio.file.Paths.get(d, "wal")
      if (!java.nio.file.Files.isDirectory(w)) Seq.empty
      else {
        val l = java.nio.file.Files.list(w)
        try l.iterator().asScala
          .filter(_.getFileName.toString.startsWith("d")).toSeq
        finally l.close()
      }
    }
    val foldedDeltas: Seq[java.nio.file.Path] =
      if (mutating) stateDir.map(walDeltas).getOrElse(Seq.empty)
      else Seq.empty
    // Three distinguishable states, two of them safe:
    //  * complete persisted state → load it;
    //  * NO pointer (fresh dir, or the legacy flat layout's torn save
    //    — catalog alone with no chunks) → start empty: nothing
    //    committed has ever been visible here;
    //  * a CURRENT pointer naming a MISSING/incomplete version dir →
    //    die LOUDLY. A pointer only ever appears after a committed
    //    save, so this state means committed data vanished (disk
    //    damage, manual deletion, or a pre-r17 unlocked writer racing
    //    — mutating invocations now serialize under the namespace
    //    lock, so concurrent CLIs no longer prune each other).
    //    Falling back to empty here would let the next mutating verb
    //    re-save and PERMANENTLY discard the committed filesystem
    //    with no error anywhere.
    val initial = stateDir match {
      case Some(d) if currentStateDir(d).isDefined => loadFs(spark, d)
      case Some(d) if java.nio.file.Files.exists(
            java.nio.file.Paths.get(d, CurrentPtr)) =>
        System.err.println(
          s"graftfs: state pointer $d/$CurrentPtr names a version " +
            "directory that is missing or incomplete — committed state " +
            "is damaged (disk damage? manual deletion?). " +
            "Refusing to start from an empty filesystem; restore the " +
            s"version directory or remove $d/$CurrentPtr to explicitly " +
            "reset.")
        spark.stop()
        sys.exit(254)
        throw new IllegalStateException("unreachable")
      case _ => emptyFs(spark)
    }
    val shell = new GraftShell(initial,
      FsContext.initialize("graftfs://graft",
        Option(System.getProperty("user.name")).getOrElse("graft")))
    val code =
      try {
        val res = shell.run(argv)
        res.out.foreach(println)
        res.err.foreach(System.err.println)
        if (res.code == 0 && mutating)
          stateDir.foreach { d =>
            val snap = shell.fs
            try saveFs(snap, d) finally shell.releaseSnapshot(snap)
            // the saved version FOLDED the pre-load wal tail (loadFs
            // overlay): prune exactly those deltas, after the flip
            foldedDeltas.foreach(graft.PlanHygiene.deleteRecursively)
          }
        res.code
      } finally {
        shell.close()
        heldLock.foreach { case (root, tok) =>
          graft.catalog.SharedFileLocks.release(root,
            SharedStateStore.NamespaceKey, tok)
        }
      }
    spark.stop()
    sys.exit(if (code == 0) 0 else 255)
  }
}
