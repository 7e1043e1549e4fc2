package graft.fs

import java.io.{FileNotFoundException, IOException, OutputStream}
import java.net.URI
import java.sql.Timestamp

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{BlockLocation, FSDataInputStream, FSDataOutputStream, FileStatus, FileSystem, Path}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, IntegerType, LongType, StringType, StructField, StructType}

import graft.catalog.{BlockMeta, FsCatalog, Inode, PathOps}

/** The reference's entire public API *is* `org.apache.hadoop.fs
  * .FileSystem` (SnackFS.scala:51-153; mounted via core-site.xml:29-32) —
  * this facade closes that last fidelity gap: a stock Hadoop/Spark job
  * can mount the engine unchanged. Every verb delegates to the existing
  * distributed machinery (`FsCatalog` metadata transitions, `DataPlane`
  * chunking, `GraftFs` cross-plane cascades); the facade itself only
  * holds the current (catalog, chunks) snapshot — the same single-driver
  * narrowing documented for FileLocks (SURVEY.md §1.3).
  *
  * Both byte paths stream with the reference's own cadence: writes
  * buffer one subblock at a time with per-block inode commits
  * (FileSystemOutputStream.scala:55-143), reads keep one ≤blockSize
  * block resident (FileSystemInputStream.scala:60-76) — neither path
  * holds a whole file in driver memory. Analytics reads still belong on
  * the DSv2 connector, which never touches the driver at all.
  */
class GraftFileSystem extends FileSystem {

  private var ctx: FsContext = _
  private var cell: FsState = _
  private var subBlockSize: Int = _
  private var blockSize: Int = _

  private def state: GraftFs = cell.get
  // every mutation routes through the compacting state cell, so a
  // long-lived mount never accumulates an unbounded lazy plan — but a
  // due compaction (an eager localCheckpoint = a Spark ACTION) must
  // NEVER run inline in a verb: verbs arrive on write-task threads
  // (core starvation if all slots are held — PLANS.md r10) AND on AQE
  // stage-execution threads (the committer's job commit/abort runs
  // there; a nested action wedges the stage's own event loop —
  // observed r11, thread-dump in PLANS.md). All facade compactions
  // run on the dedicated [[compactor]] thread via the non-blocking
  // snapshot-compact-swap (FsState.compactOpportunistic).
  private def setState(next: GraftFs): Unit =
    cell.set(next, allowCompact = false)

  /** Dedicated compaction thread — the only place a facade-owned
    * Spark action may originate (see setState). Polls cheaply; the
    * opportunistic swap never blocks verbs.
    */
  private var compactor: Thread = _

  private def startCompactor(): Unit = {
    compactor = new Thread(() => {
      try {
        while (!Thread.currentThread().isInterrupted) {
          if (cell.compactionDue) {
            // two-phase: the checkpoint action runs lock-free, but the
            // SWAP takes mutLock — FsState's `current eq snapshot`
            // check alone cannot see a verb between its state read and
            // its setState, and swapping in that window would sweep
            // the checkpoint generation the verb's successor plan is
            // rooted in (trySwap scaladoc). Verb lock holds are pure
            // memory now, so the compactor waits microseconds.
            try {
              cell.prepareCompaction().foreach { case (snap, compacted) =>
                try { withMutLock(cell.trySwap(snap, compacted)); () }
                catch {
                  case scala.util.control.NonFatal(_) =>
                    cell.releasePrepared(compacted)
                }
              }
            } catch { case scala.util.control.NonFatal(_) => () }
          }
          Thread.sleep(250)
        }
      } catch { case _: InterruptedException => () }
    }, "graftfs-compactor")
    compactor.setDaemon(true)
    compactor.start()
  }

  /** Driver-JVM mirror of the catalog plane — ONE entry per inode,
    * kept exactly in step with the catalog frames under [[mutLock]].
    * This is what makes the mount's whole METADATA surface (existence
    * checks, status, listings, the committer's mkdirs/rename dance)
    * action-free: a write task consults and updates this map in pure
    * memory while the DataFrame planes accumulate the SAME transitions
    * lazily, so no Spark job ever has to schedule inside a task slot —
    * the NameNode shape (metadata answers from memory, data scans run
    * distributed), and the fix that lets a stock committer job write
    * at FULL parallelism on local[N] instead of deadlocking on core
    * starvation. Consistency is pinned by spec: after any verb mix,
    * the cache equals the collected catalog row for row. The catalog
    * frames stay authoritative for analytics (DSv2, shell, du/count)
    * and for persistence; a mount starts empty (root only) at
    * initialize and the cache is seeded the same way — the facade's
    * lifecycle is mount-scoped, like the reference's in-memory client
    * view (persistence across mounts is the CLI/FsCatalog.save
    * surface, not the facade's).
    */
  private val inodeCache =
    new java.util.concurrent.ConcurrentHashMap[String, Inode]()

  /** Driver-memory posture of the cache — the NameNode trade, made
    * LOUD like every other cap in this engine (LshGuard precedent): an
    * inode row is a few hundred bytes (path + block metas), so 10 M
    * files ≈ low-GB driver heap — metadata-scale, the same class of
    * object a NameNode holds, and fine for the mount's job (stock
    * committer-protocol writes + fresh-data reads). A workload growing
    * past `graft.mount.max.inodes` (default 10 M) gets ONE stderr
    * shout per mount naming the knob and the DSv2 connector as the
    * analytics-scale alternative — never a silent OOM march.
    */
  private var maxInodes = 10_000_000L
  private val inodeCapShouted = new java.util.concurrent.atomic.AtomicBoolean

  private def noteInodeGrowth(): Unit =
    if (inodeCache.size() > maxInodes &&
        inodeCapShouted.compareAndSet(false, true))
      System.err.println(
        s"graftfs: mount at ${ctx.uri} exceeds graft.mount.max.inodes " +
          s"($maxInodes) — driver-heap metadata growing unbounded; raise " +
          "the cap or move analytics to the graft.sources DSv2 connector")

  private def cached(p: String): Option[Inode] = Option(inodeCache.get(p))

  /** Parent → child-paths index over [[inodeCache]] — the
    * NameNode-correct directory shape. Before this existed, every
    * listStatus/rename/recursive-delete/empty-check scanned the WHOLE
    * cache (O(N) per verb at up to the 10M-inode cap — a per-task-
    * commit driver cost under a committer job); each verb now touches
    * only the child set / subtree it names. Maintained in lock-step
    * with the cache under [[mutLock]] via [[cachePut]]/[[cacheDrop]]
    * (parentPath is a pure function of path — PathOps.parent — so a
    * same-path overwrite never moves an index entry); the consistency
    * spec asserts index ≡ groupBy(parentPath) of the cache after any
    * verb mix.
    */
  private val childIndex =
    new java.util.HashMap[String, java.util.HashSet[String]]()

  /** Insert/overwrite one inode, keeping [[childIndex]] exact.
    * Caller holds [[mutLock]] (or is single-threaded initialize). */
  private def cachePut(n: Inode): Unit = {
    val prior = inodeCache.put(n.path, n)
    if (prior == null && n.parentPath != null)
      childIndex.computeIfAbsent(n.parentPath,
        _ => new java.util.HashSet[String]()).add(n.path)
  }

  /** Remove one inode, keeping [[childIndex]] exact (empty child sets
    * are dropped so the index never outgrows the live tree). Caller
    * holds [[mutLock]]. */
  private def cacheDrop(p: String): Unit = {
    val prior = inodeCache.remove(p)
    if (prior != null && prior.parentPath != null) {
      val kids = childIndex.get(prior.parentPath)
      if (kids != null) {
        kids.remove(p)
        if (kids.isEmpty) childIndex.remove(prior.parentPath)
      }
    }
  }

  /** The subtree rooted at `p`, walked through [[childIndex]] —
    * O(subtree), never O(cache). Fully materialized before any caller
    * mutates (rename/remove iterate the result, not the live sets). */
  private def subtreePaths(p: String): Seq[String] = {
    // Explicit-stack iteration: a pathologically deep chain (mkdirs
    // with tens of thousands of components) must not blow the JVM
    // stack while holding mutLock.
    val out = Seq.newBuilder[String]
    val stack = new java.util.ArrayDeque[String]()
    stack.push(p)
    while (!stack.isEmpty) {
      val q = stack.pop()
      out += q
      val kids = childIndex.get(q)
      if (kids != null) {
        val it = kids.iterator()
        while (it.hasNext) stack.push(it.next())
      }
    }
    out.result()
  }

  /** Index snapshot for the consistency spec. */
  private[fs] def childIndexSnapshot: Map[String, Set[String]] =
    withMutLock {
      val b = Map.newBuilder[String, Set[String]]
      childIndex.forEach { (k, v) =>
        val s = Set.newBuilder[String]
        v.forEach(s += _)
        b += k -> s.result()
      }
      b.result()
    }

  /** Chunk rows written since the last fold, kept OUT of the plan.
    *
    * The first action-free write path threaded one filter+union plan
    * node per persisted subblock plus one store per inode commit; a
    * stock 8-task committer job accumulated a plan whose EAGER Dataset
    * analysis went superlinear (thread-dump: 61 s inside
    * ResolveReferences on a write task, 79 s of BooleanSimplification
    * over the chained NOT-conjunctions in the compactor) and the job
    * wedged on the 120 s lock timeout. So mutations no longer grow
    * the plan at all on the hot path: appended rows buffer here and
    * fold into the base plan as ONE union per [[FoldBytes]] (or at a
    * read/pin boundary), and the CATALOG plane is not threaded through
    * mutations anywhere — it derives from [[inodeCache]] on demand
    * (see refreshedState), a depth-1 createDataset. Structural chunk
    * ops (overwrite, delete, rename) rewrite this buffer in memory
    * and add one filter to the base — committer-frequency, not
    * per-subblock. Memory contract: ≤ [[FoldBytes]] of pending
    * payload plus one subblock per open stream.
    */
  private val pendingChunks = scala.collection.mutable.ArrayBuffer.empty[Row]
  private var pendingBytes = 0L
  // conf-overridable (graft.mount.fold.bytes) so specs can force the
  // fold machinery — base-plan reads, post-fold rename/delete/
  // overwrite — at test-sized payloads; production default 64 MB
  private var FoldBytes = 64L << 20

  /** Files whose rows have been FOLDED into the base plan, mapped
    * CURRENT path → BIRTH name. Rows fold under an IMMUTABLE birth
    * name (usually the path at first fold) and never change identity
    * again: rename is pure map re-keying — ZERO plan nodes — where the
    * old design's per-rename filter∪rewrite DOUBLED the plan tree and
    * went exponential the moment a committer renamed a fold's worth of
    * files (measured r13 storm: 13-44 s verbs; at production geometry
    * a 32-core committer stacks 32 doublings per fold — 2^32). Reads
    * and structural filters translate current → birth at the boundary
    * (one map lookup under [[mutLock]]). A birth name that would
    * collide with a LIVE file's birth (re-created path after a rename
    * moved the original away) gets a NUL-suffixed alias — NUL never
    * appears in a real Hadoop path, so aliases cannot shadow data.
    *
    * SORTED maps, not hash sets: [[baseHasSubtree]] runs on the block-
    * miss READ path (blockAt) and per structural op; prefix membership
    * is one floor lookup, subtree enumeration one range walk, and the
    * delete path range-scans [[birthIndex]] for foreign births under
    * the prefix. All access under [[mutLock]].
    */
  private val baseFiles = new java.util.TreeMap[String, String]()

  /** Birth name → CURRENT path (live folded files only). */
  private val birthIndex = new java.util.TreeMap[String, String]()

  /** Birth names whose payload still lives UNCHANGED in the mounted
    * saved state's `chunks/` parquet — the set [[BlockCachedStream]]
    * may serve with a SESSION-FREE pruned parquet read (SavedState
    * .readBlock: no driver job, callable from any executor thread).
    * Saved files seed here (and into baseFiles/birthIndex as
    * path→path, so every structural op targets the right rows);
    * overwrite and delete PRUNE the birth (its parquet rows are now
    * stale), while rename is a no-op (births are immutable — the
    * saved rows stay valid under the old name). Guarded by [[mutLock]].
    */
  private val savedBirths = new java.util.HashSet[String]()

  /** The mounted saved state's chunks dir (null when the mount started
    * empty). Versioned save dirs are immutable by construction (saveFs
    * writes a fresh version dir and flips `CURRENT`), so direct reads
    * serve a consistent generation for the mount's lifetime.
    */
  private var savedChunksDir: String = _

  // ── WRITE-THROUGH of post-mount writes (r17, the §8 facade notch):
  //    a state-dir mount used to serve executors only the bytes saved
  //    BEFORE the mount; anything a driver wrote after it lived solely
  //    in driver frames. Now a closed create stream (and the rename/
  //    delete mirrors that keep committer flows coherent) also commits
  //    the payload as a SharedStateStore wal delta in the mounted state
  //    dir — cross-process-locked, atomically-renamed, session-free —
  //    so ANY mount of the same state (executor-mode JVMs live via
  //    per-access refresh; fresh mounts via init-time overlay
  //    application) serves the post-mount bytes with zero driver
  //    involvement. Residue, loud and documented: a file whose pending
  //    rows folded (> FoldBytes) before close skips write-through. ────
  private var mountParent: String = _
  private var writeThroughEnabled = true
  private var mountStoreCache: SharedStateStore = _
  private def mountStore: SharedStateStore = synchronized {
    if (mountStoreCache == null)
      mountStoreCache =
        new SharedStateStore(mountParent, subBlockSize, blockSize)
    mountStoreCache
  }

  /** CURRENT path → wal delta chunks file for overlay-served payloads
    * (post-mount writes visible through the persisted state). Guarded
    * by [[mutLock]].
    */
  private val overlayBirths = new java.util.HashMap[String, String]()

  /** Base-chunk paths the frame plane must EXCLUDE (superseded or
    * tombstoned by wal deltas) — fixed at initialize.
    */
  private var overlayExcluded: Seq[String] = Nil

  /** Apply one wal-overlay inode entry to the metadata cache (missing
    * ancestors synthesized — mkdirs is driver-local and not mirrored).
    * Caller holds [[mutLock]] or is single-threaded initialize.
    */
  private def applyOverlayInode(p: String, entry: Option[Inode]): Unit =
    entry match {
      case Some(n) =>
        PathOps.ancestors(Option(n.parentPath).getOrElse("/"))
          .reverse.foreach { a =>
            if (inodeCache.get(a) == null)
              cachePut(FsCatalog.dirInode(a, "graft"))
          }
        cachePut(n)
        if (n.isFile) { baseFiles.put(p, p); birthIndex.put(p, p); () }
      case None =>
        cacheDrop(p)
        savedBirths.remove(p)
        baseFiles.remove(p)
        birthIndex.remove(p)
        ()
    }

  /** Executor-mode freshness: before a stat/open/listing answers, fold
    * the CURRENT wal overlay into the cache — this is what lets a
    * long-lived executor JVM see files the driver wrote
    * (write-through) AFTER the executor's mount initialized. The WHOLE
    * overlay applies (bounded by the wal tail, OP parses cached), not
    * just one path, so listings of directories that gained children
    * post-mount stay consistent with stats. Driver mounts skip it
    * (their own pending/frame planes are authoritative).
    */
  private def executorRefresh(): Unit =
    if (executorMode && mountParent != null)
      try {
        val (inodes, payloads) = mountStore.overlaySnapshot()
        withMutLock {
          inodes.toSeq.sortBy(_._1).foreach { case (p, e) =>
            applyOverlayInode(p, e)
          }
          payloads.foreach {
            case (p, Some(f)) =>
              savedBirths.remove(p)
              overlayBirths.put(p, f.toString)
              ()
            case (p, None) =>
              savedBirths.remove(p)
              overlayBirths.remove(p)
              ()
          }
        }
      } catch {
        case e: Throwable =>
          System.err.println(s"[graftfs] wal overlay refresh " +
            s"failed: ${e.getMessage} — serving the mounted snapshot")
      }

  /** Driver-side write-through of a freshly-closed create stream: the
    * file's pending rows (all still in memory for ≤ FoldBytes files)
    * commit as one storeFileData wal delta so executor mounts serve
    * them session-free. Runs OUTSIDE [[mutLock]] (cross-process lock +
    * parquet I/O must not block verb threads).
    */
  private def writeThroughOnClose(p: String, written: Long): Unit =
    if (!executorMode && mountParent != null && writeThroughEnabled) {
      val bytes = withMutLock {
        val rows = pendingChunks.filter(_.getString(0) == p)
          .sortBy(r => (r.getInt(1), r.getInt(2)))
        val total = rows.iterator.map(_.getLong(6)).sum
        if (total == written) {
          val out = new Array[Byte](total.toInt)
          var at = 0
          rows.foreach { r =>
            val d = r.getAs[Array[Byte]](5)
            System.arraycopy(d, 0, out, at, d.length); at += d.length
          }
          Some(out)
        } else None
      }
      bytes match {
        case Some(b) =>
          try mountStore.storeFileData(p, b, ctx.cwd.split("/").last,
            new Timestamp(1704067200000L))
          catch {
            case e: Throwable => System.err.println(
              s"[graftfs] write-through of $p failed: ${e.getMessage} — " +
                "executor-side reads of this file need the driver")
          }
        case None => System.err.println(
          s"[graftfs] $p folded past the pending buffer before close — " +
            "write-through skipped; executor-side reads of this file " +
            "need the driver")
      }
    }

  /** Mirror a successful rename into the wal for every OVERLAY entry
    * under `src` (post-mount writes only — saved base births are
    * immutable, the documented §8 residue): payloads re-commit under
    * the destination, sources tombstone, all under ONE namespace lock.
    * The committer's temp-dir rename is the designed-for case — after
    * it, executor mounts see the FINAL paths, and a later compaction
    * folds no phantom temp files.
    */
  private def mirrorRename(src: String, dst: String): Unit =
    if (!executorMode && mountParent != null && writeThroughEnabled)
      try {
        val (inodes, _) = mountStore.overlaySnapshot()
        val pre = src + "/"
        val moved = inodes.collect {
          case (p, Some(n)) if p == src || p.startsWith(pre) => (p, n)
        }.toSeq.sortBy(_._1)
        if (moved.nonEmpty) mountStore.atomically {
          moved.foreach { case (p, n) =>
            val np = dst + p.stripPrefix(src)
            if (n.isFile)
              mountStore.storeFileData(np, mountStore.retrieveBlock(p),
                n.user, n.mtime)
            else
              mountStore.storeINode(n.copy(path = np,
                parentPath = PathOps.parent(np)))
            mountStore.deleteBlocks(p)
            mountStore.deleteINode(p)
          }
        }
      } catch {
        case e: Throwable => System.err.println(
          s"[graftfs] wal rename mirror $src -> $dst failed: " +
            s"${e.getMessage} — executor views of these files are stale")
      }

  /** Mirror a successful delete into the wal for every overlay entry
    * under `p` (see [[mirrorRename]]).
    */
  private def mirrorDelete(p: String): Unit =
    if (!executorMode && mountParent != null && writeThroughEnabled)
      try {
        val (inodes, _) = mountStore.overlaySnapshot()
        val pre = p + "/"
        val doomed = inodes.collect {
          case (q, Some(_)) if q == p || q.startsWith(pre) => q
        }.toSeq.sorted
        if (doomed.nonEmpty) mountStore.atomically {
          doomed.foreach { q =>
            mountStore.deleteBlocks(q)
            mountStore.deleteINode(q)
          }
        }
      } catch {
        case e: Throwable => System.err.println(
          s"[graftfs] wal delete mirror of $p failed: ${e.getMessage} — " +
            "executor views of these files are stale")
      }

  /** READ-ONLY executor mode: no SparkSession in this JVM (or forced
    * via `graft.mount.executor.mode`) — metadata answers from the
    * saved catalog, payload reads go through [[SavedState]], and every
    * mutation fails loudly. This closes the SURVEY §8 narrowing one
    * notch: a REMOTE executor can now open() and read saved payloads
    * with zero driver involvement; only bytes written after the save
    * (driver pending/folded state) still require the driver path.
    */
  private var executorMode = false

  /** True when `graft.mount.executor.mode` was SET at initialize —
    * such a mount never lazily upgrades (the conf is the contract);
    * only the implicit no-session-at-initialize case does.
    */
  private var executorForced = false

  private var birthGen = 0L

  private def baseHasSubtree(p: String): Boolean = {
    if (baseFiles.containsKey(p)) return true
    val c = baseFiles.ceilingKey(subtreePrefix(p))
    c != null && c.startsWith(subtreePrefix(p))
  }

  /** All folded (currentPath, birthName) under `p` (inclusive), via one
    * sorted-range walk. */
  private def baseSubtree(p: String): Seq[(String, String)] = {
    val out = Seq.newBuilder[(String, String)]
    val self = baseFiles.get(p)
    if (self != null) out += (p -> self)
    val pre = subtreePrefix(p)
    val it = baseFiles.tailMap(pre).entrySet().iterator()
    var go = true
    while (go && it.hasNext) {
      val e = it.next()
      if (e.getKey.startsWith(pre)) out += (e.getKey -> e.getValue)
      else go = false
    }
    out.result()
  }

  /** Birth name for `p`'s next folded rows: the existing assignment if
    * p folded before (mid-stream folds reuse it), else p itself unless
    * some LIVE file elsewhere already owns that birth name (p was
    * re-created after a rename moved the original away) — then a fresh
    * NUL-suffixed alias. Caller holds [[mutLock]].
    */
  private def birthFor(p: String): String = {
    val existing = baseFiles.get(p)
    if (existing != null) existing
    else {
      val b =
        if (birthIndex.containsKey(p)) { birthGen += 1; p + "\u0000" + birthGen }
        else p
      baseFiles.put(p, b)
      birthIndex.put(b, p)
      b
    }
  }

  private val chunkRowSchema = StructType(Seq(
    StructField("path", StringType),
    StructField("block_id", IntegerType),
    StructField("sub_id", IntegerType),
    StructField("block_offset", LongType),
    StructField("offset", LongType),
    StructField("data", BinaryType),
    StructField("length", LongType)))

  /** Fold pending rows into the base plan (caller holds [[mutLock]]).
    * Lazy — one createDataFrame + one union, never an action.
    */
  private def foldPending(): Unit =
    if (pendingChunks.nonEmpty) {
      val rows = new java.util.ArrayList[Row](pendingChunks.size)
      pendingChunks.foreach { r =>
        val birth = birthFor(r.getString(0))
        rows.add(
          if (birth == r.getString(0)) r
          else Row(birth, r.getInt(1), r.getInt(2), r.getLong(3),
            r.getLong(4), r.get(5), r.getLong(6)))
      }
      val df = spark.createDataFrame(rows, chunkRowSchema)
      setState(GraftFs(state.catalog, state.chunks.unionByName(df)))
      pendingChunks.clear()
      pendingBytes = 0L
    }

  /** Drop pending rows matching `pred`, keeping the byte count true. */
  private def dropPending(pred: Row => Boolean): Unit = {
    var i = 0
    while (i < pendingChunks.length) {
      if (pred(pendingChunks(i))) {
        pendingBytes -= pendingChunks(i).getLong(6)
        pendingChunks.remove(i)
      } else i += 1
    }
  }

  private def rowInSubtree(r: Row, path: String): Boolean =
    r.getString(0) == path || r.getString(0).startsWith(subtreePrefix(path))

  // children / emptiness / subtree ops answer from [[childIndex]] —
  // O(children) / O(1) / O(subtree), never a full-cache scan
  private def cacheChildren(p: String): Seq[Inode] = {
    val kids = childIndex.get(p)
    if (kids == null) Seq.empty
    else {
      val out = Seq.newBuilder[Inode]
      val it = kids.iterator()
      while (it.hasNext) cached(it.next()).foreach(out += _)
      out.result()
    }
  }

  private def cacheHasChildren(p: String): Boolean = {
    val kids = childIndex.get(p)
    kids != null && !kids.isEmpty
  }

  private def subtreePrefix(p: String): String =
    if (p == "/") "/" else p + "/"

  private def cacheRemoveSubtree(p: String): Unit =
    subtreePaths(p).foreach(cacheDrop)

  private def cacheRename(src: String, dst: String): Unit = {
    val paths = subtreePaths(src)
    val moved = paths.flatMap(k => cached(k).map { n =>
      val np = dst + k.substring(src.length)
      n.copy(path = np, parentPath = PathOps.parent(np))
    })
    paths.foreach(cacheDrop)
    moved.foreach(cachePut)
  }

  /** Serializes each verb's read-modify-write state transition.
    * Hadoop's FileSystem cache hands EVERY thread in the JVM this one
    * instance — under a drop-in mount (`fs.graftfs.impl` +
    * `spark.read`/`df.write` on a `graftfs://` URI), local-mode write
    * tasks and the output committer call create/mkdirs/rename
    * concurrently, and two interleaved state.get → transform →
    * setState sequences would silently lose one task's update.
    * FsState synchronizes the individual get/set calls; this lock
    * makes the whole transition atomic. Cross-JVM coordination stays
    * the documented single-driver narrowing (SURVEY §1.3).
    */
  private val mutLock = new java.util.concurrent.locks.ReentrantLock()

  /** Mutation-lock acquisition timeout (ms), settable via the Hadoop
    * conf key `graft.mount.lock.timeout.ms`. */
  private def lockTimeoutMs: Long =
    Option(getConf).map(_.getLong("graft.mount.lock.timeout.ms", 120000L))
      .getOrElse(120000L)

  /** Acquire the mutation lock with a TIMEOUT instead of blocking
    * forever: the mount's one true failure mode in local mode is core
    * starvation — N outer tasks fill every slot, one holds this lock
    * while its nested engine job waits for a core the lock-blocked
    * tasks can never free (thread-dump-verified, PLANS.md r10). A
    * metadata verb that cannot take the lock inside the timeout is in
    * that deadlock (or something equally pathological), and a LOUD
    * IOException naming the fix beats an infinite hang.
    */
  private def withMutLock[T](f: => T): T = {
    // an interrupt while waiting (Spark killing a task mid-verb) must
    // surface through the FileSystem contract's IOException channel —
    // a raw InterruptedException would skip IOException handlers and
    // lose the interrupt flag
    val acquired =
      try mutLock.tryLock(lockTimeoutMs,
        java.util.concurrent.TimeUnit.MILLISECONDS)
      catch {
        case _: InterruptedException =>
          Thread.currentThread().interrupt()
          throw new java.io.InterruptedIOException(
            "graftfs mount: interrupted while waiting for the mutation lock")
      }
    if (!acquired)
      throw new IOException(
        s"graftfs mount: mutation lock not acquired within ${lockTimeoutMs} ms" +
          " — likely core starvation (every local core held by a task" +
          " blocked on this lock while the holder's nested engine job" +
          " waits for a slot). Lower the job's parallelism below the" +
          " core count, or use the DSv2 connector for analytics.")
    try f finally mutLock.unlock()
  }

  private def spark: SparkSession = {
    val s = SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession)
      .getOrElse(throw new IllegalStateException(
        "GraftFileSystem needs an active SparkSession"))
    // Under a drop-in mount every verb can arrive on an executor pool
    // thread (a local-mode task reading `graftfs://` calls open/
    // getFileStatus from inside the task). Spark 4 captures the
    // THREAD-LOCAL active session when it plans an action
    // (SparkPlan.session) and worker pool threads don't inherit it, so
    // an engine action from such a thread NPEs unless the session is
    // seated first. Idempotent on driver threads.
    if (SparkSession.getActiveSession.isEmpty)
      SparkSession.setActiveSession(s)
    s
  }

  /** Bracket for any verb that executes engine actions from a
    * possibly-foreign thread. Two thread-local obstacles stand between
    * a local-mode task and a nested engine action: (1) worker pool
    * threads don't inherit the active-session thread-local ([[spark]]
    * seats it), and (2) Spark HIDES the seated session while a
    * TaskContext is set — `getActiveSession` answers None inside a
    * running task by design, so a nested plan would capture a null
    * session and NPE at `SparkPlan.sparkContext`. The bracket unsets
    * the TaskContext for the duration of the engine op and restores it
    * in a finally, making the drop-in mount's byte paths runnable from
    * read/write tasks (see SchemeMountSpec; nested jobs need a free
    * core — the documented local-mode caveat).
    */
  private def engineOp[T](f: => T): T =
    GraftFileSystem.withoutTaskContext { spark; f }

  /** SnackFS.initialize:51-72 — derive scheme://authority, seat cwd at
    * /user/<user>, bootstrap the keyspace (here: an empty catalog with a
    * root inode + an empty chunk table), read the block geometry from
    * the Configuration (SnackFSConfiguration.scala:41-42 analog).
    */
  override def initialize(uri: URI, conf: Configuration): Unit = {
    super.initialize(uri, conf)
    setConf(conf)
    ctx = FsContext.initialize(uri.toString,
      Option(System.getProperty("user.name")).getOrElse("graft"))
    // precedence: explicit Hadoop conf key (the core-site.xml analog) →
    // session-level spark.graft.* key (GraftConfig) → built-in default
    val (sparkSub, sparkBlock) = GraftConfig.geometry(spark)
    subBlockSize = conf.getInt("graft.subblock.size", sparkSub)
    blockSize = conf.getInt("graft.block.size", sparkBlock)
    require(subBlockSize > 0 && blockSize % subBlockSize == 0,
      "graft.block.size must be a positive multiple of graft.subblock.size")
    FoldBytes = conf.getLong("graft.mount.fold.bytes", 64L << 20)
    require(FoldBytes > 0, "graft.mount.fold.bytes must be positive")
    maxInodes = conf.getLong("graft.mount.max.inodes", 10_000_000L)
    require(maxInodes > 0, "graft.mount.max.inodes must be positive")
    // executor mode: forced by conf (tests, explicit read-only
    // consumers) or implied by a JVM with no session to plan with —
    // the remote-executor situation the §8 narrowing documents
    executorForced = conf.getBoolean("graft.mount.executor.mode", false)
    executorMode = executorForced ||
      (SparkSession.getActiveSession.isEmpty &&
        SparkSession.getDefaultSession.isEmpty)
    val stateDir = Option(conf.get("graft.mount.state.dir"))
      .flatMap(GraftShellMain.currentStateDir)
    if (executorMode && stateDir.isEmpty)
      throw new IOException(
        "graftfs executor-mode mount (no SparkSession in this JVM) needs " +
          "graft.mount.state.dir pointing at a persisted state — an empty " +
          "mount has nothing an executor could read without the driver")
    inodeCache.clear()
    childIndex.clear()
    savedChunksDir = null
    // saved-state bootstrap is SESSION-FREE (plain parquet readers):
    // metadata seeds the cache, file births seed the direct-read set,
    // executor JVMs stop here (read-only — no frames, no compactor)
    stateDir.foreach { root =>
      savedChunksDir = s"$root/chunks"
      SavedState.readCatalog(s"$root/catalog").foreach { n =>
        cachePut(n)
        if (n.isFile) {
          savedBirths.add(n.path)
          baseFiles.put(n.path, n.path)
          birthIndex.put(n.path, n.path)
        }
      }
    }
    // wal-overlay application (write-through scaladoc): post-mount
    // writes committed by ANY driver of this state — earlier sessions,
    // concurrent drivers — fold into the metadata snapshot, the
    // direct-read routing, and (below) the frame plane, so a fresh
    // mount sees the complete namespace, not only the last compaction
    mountParent = Option(conf.get("graft.mount.state.dir"))
      .filter(_ => stateDir.isDefined).orNull
    writeThroughEnabled = conf.getBoolean("graft.mount.write.through", true)
    mountStoreCache = null
    overlayBirths.clear()
    overlayExcluded = Nil
    if (mountParent != null) {
      val (oInodes, oPayloads) = mountStore.overlaySnapshot()
      oInodes.toSeq.sortBy(_._1).foreach { case (p, e) =>
        applyOverlayInode(p, e)
      }
      oPayloads.toSeq.sortBy(_._1).foreach {
        case (p, Some(f)) =>
          savedBirths.remove(p)
          overlayBirths.put(p, f.toString)
        case (p, None) =>
          savedBirths.remove(p)
      }
      // stale base rows (superseded or tombstoned paths) must not
      // reach the frame plane's saved-chunk scan
      overlayExcluded = (oPayloads.keys ++
        oInodes.collect { case (p, None) => p }).toSeq.distinct.sorted
    }
    if (!executorMode) bootDriverPlanes()
    else if (inodeCache.get("/") == null)
      cachePut(FsCatalog.dirInode("/", ctx.cwd.split("/").last))
  }

  /** Driver-side plane boot: the frame planes + compactor an executor
    * mount never builds. Called from initialize on driver mounts, and
    * LAZILY from [[mutGuard]] when an implicitly-executor mount later
    * sees a session (the mount-before-session caveat: Hadoop's
    * FileSystem cache decides the mode once at initialize, so a driver
    * JVM touching a graftfs:// URI before creating its SparkSession
    * used to stay permanently read-only — r16 ADVICE).
    */
  private def bootDriverPlanes(): Unit = {
    val s = spark
    val root = FsCatalog.dirInode("/", ctx.cwd.split("/").last)
    if (inodeCache.get("/") == null) cachePut(root)
    val emptyChunks = DataPlane.chunk(
      s.createDataFrame(java.util.Collections.emptyList[Row](),
        StructType(Seq(StructField("path", StringType),
          StructField("data", BinaryType)))),
      subBlockSize, blockSize)
    // the saved chunk rows enter the BASE PLAN too (one parquet scan
    // leaf), so every frame consumer — snapshots, structural filters,
    // analytic verbs — sees saved payloads; the direct-read set just
    // short-circuits byte fetches around it. Wal-overlay rows join the
    // plan as their own parquet leaves (superseded base paths filtered
    // out), so the frame plane shows post-mount writes too.
    val initialChunks = Option(savedChunksDir)
      .map { dir =>
        val base = s.read.parquet(dir)
        val filtered =
          if (overlayExcluded.isEmpty) base
          else base.filter(!col("path").isin(overlayExcluded: _*))
        val overlayFiles = {
          val b = Seq.newBuilder[String]
          overlayBirths.values.forEach(b += _)
          b.result().distinct.sorted
        }
        (filtered +: overlayFiles.map(f =>
          s.read.parquet(f).select(base.columns.map(col).toIndexedSeq: _*)))
          .reduce(_ unionByName _)
          .unionByName(emptyChunks)
      }
      .getOrElse(emptyChunks)
    // compactEvery 8, not the default 64: facade sets are RARE now
    // (one per fold or base-touching structural op, never per
    // subblock/inode), and the base-touching rename doubles the tree
    // — 8 sets bounds the worst pre-compaction plan at ~2^8 nodes
    val values = Seq.newBuilder[Inode]
    inodeCache.values.forEach(values += _)
    cell = new FsState(GraftFs(FsCatalog(s.createDataset(values.result())(
      FsCatalog.inodeEncoder)), initialChunks), compactEvery = 8)
    startCompactor()
  }

  /** Loud single-sided failure for mutations on a read-only
    * executor-mode mount (the supported side is reads — see
    * [[executorMode]]) — unless the mode was IMPLICIT (no session at
    * initialize, not forced by conf) and a session has since appeared:
    * then the mount upgrades in place (boot the driver planes, clear
    * the flag) and the mutation proceeds. Callers hold [[mutLock]], so
    * the one-time boot is race-free; the flag flips only after the
    * planes exist, so concurrent readers never see a half-built driver
    * mount.
    */
  private def mutGuard(): Unit =
    if (executorMode) {
      // forced-at-initialize is the contract (a later conf mutation on
      // the shared Configuration object must not flip a read-only
      // mount); only the IMPLICIT no-session-yet case upgrades
      val session = SparkSession.getActiveSession
        .orElse(SparkSession.getDefaultSession)
      if (!executorForced && session.isDefined) {
        bootDriverPlanes()
        executorMode = false
      } else
        throw new IOException(
          "graftfs executor-mode mount is READ-ONLY — mutations must run " +
            "on the driver (this JVM has no SparkSession; it serves the " +
            "mounted saved generation). If this JVM IS meant to be the " +
            "driver: the mode is decided at initialize and cached by " +
            "Hadoop's FileSystem cache, so create the SparkSession " +
            "BEFORE first touching a graftfs:// URI — or simply retry " +
            "this mutation after creating it (the mount upgrades lazily " +
            "once a session exists)")
    }

  /** The metadata cache, for consistency specs. */
  private[fs] def metadataSnapshot: Map[String, Inode] = {
    val b = Map.newBuilder[String, Inode]
    inodeCache.forEach((k, v) => b += k -> v)
    b.result()
  }

  override def getUri: URI = ctx.uri

  override def getWorkingDirectory: Path = new Path(ctx.cwd)

  override def setWorkingDirectory(dir: Path): Unit =
    // strip the scheme like every other entry point — qualified paths
    // (the norm from getHomeDirectory/listStatus) must not join under cwd
    ctx = ctx.withWorkingDir(stripScheme(dir))

  override def getDefaultBlockSize: Long = blockSize.toLong

  private def abs(p: Path): String = ctx.makeAbsolute(stripScheme(p))

  private def stripScheme(p: Path): String = {
    val u = p.toUri
    if (u.getPath == null || u.getPath.isEmpty) "/" else u.getPath
  }

  // status paths must come back FULLY QUALIFIED (scheme + authority) —
  // the FileSystem contract Spark's file index depends on: an
  // unqualified "/csv/f" from listStatus would be re-resolved against
  // the DEFAULT filesystem and a drop-in `spark.read` would silently
  // look for the file on file:// instead of back through this mount
  private def statusRow(n: Inode): FileStatus =
    new FileStatus(n.length, n.isDir, 3, blockSize.toLong,
      n.mtime.getTime, makeQualified(new Path(n.path)))

  // ── A6: getFileStatus (FileStatusCommand; spec message verbatim) ──────
  //    Answered from the metadata cache — ACTION-FREE, callable from
  //    any task thread without a nested job (the committer calls this
  //    constantly during task commit). Reads take mutLock too: rename/
  //    recursive-delete rewrite the cache entry by entry, and a
  //    lock-free reader could catch a mid-rename state where a live
  //    file exists at NEITHER path (spurious FileNotFound under the
  //    committer's concurrent task commits). Every lock hold is pure
  //    memory, so readers wait microseconds.
  override def getFileStatus(path: Path): FileStatus = {
    executorRefresh() // live wal view for executor mounts
    withMutLock {
      cached(abs(path))
        .map(statusRow)
        .getOrElse(throw new FileNotFoundException("No such file exists"))
    }
  }

  // ── A9: listStatus — dir lists children, file lists itself (cache;
  //    locked against mid-rename partial states, see getFileStatus) ─────
  override def listStatus(path: Path): Array[FileStatus] = {
    executorRefresh() // live wal view for executor mounts
    withMutLock {
      val p = abs(path)
      val node = cached(p)
        .getOrElse(throw new FileNotFoundException("No such file exists"))
      if (node.isFile) Array(statusRow(node))
      else cacheChildren(p).sortBy(_.path).map(statusRow).toArray
    }
  }

  // ── A5: mkdirs — ancestor AND-fold; exists-as-file → false. The
  //    existence map comes from the cache; the frame half is the SAME
  //    fold (FsCatalog.mkdirsWith) minus its collect — action-free. ─────
  override def mkdirs(path: Path, permission: FsPermission): Boolean =
    withMutLock { mutGuard(); cachedMkdirs(abs(path)) }

  /** The mkdirs ancestor AND-fold against the cache alone (the catalog
    * frame derives from the cache, so there is no frame half to build
    * here — FsCatalog.mkdirsWith documents the shared semantics:
    * exists-as-file → false without overwrite, missing → create, no
    * short-circuit). `createOnFailure = true` is the A5 verb's
    * reference semantics (missing levels are created even when the
    * fold answers false — MakeDirectoryCommand.scala:74); create()
    * passes false so a FAILED create leaves no trace in the cache
    * (the replaced frame-based code discarded its partial catalog on
    * throw; a cache that kept the phantom dirs would corrupt state on
    * a reported failure). Caller holds [[mutLock]].
    */
  private def cachedMkdirs(p: String,
                           createOnFailure: Boolean = true): Boolean = {
    val levels = PathOps.ancestors(p)
    val ok = levels.forall(l => cached(l).forall(_.isDir))
    if (ok || createOnFailure) {
      levels.filter(l => cached(l).isEmpty)
        .foreach(l => cachePut(FsCatalog.dirInode(l, "graft")))
      noteInodeGrowth()
    }
    ok
  }

  // ── A3: create — the reference's streaming cadence (CreateFileCommand
  //    + FileSystemOutputStream.scala:55-143): parents made up front,
  //    an empty inode stored immediately, then each filled subblock
  //    flushes as ONE chunk row (endSubBlock :89-101) and every closed
  //    block re-commits the inode (endBlock :103-120). At most one
  //    subblock (8 MB default) is ever buffered in the driver — no
  //    whole-file ByteArrayOutputStream, no driver-heap ceiling. ────────
  override def create(path: Path, permission: FsPermission,
                      overwrite: Boolean, bufferSize: Int,
                      replication: Short, blkSize: Long,
                      progress: Progressable): FSDataOutputStream = withMutLock {
    mutGuard()
    // the whole create transition is cache-checked and frame-lazy:
    // NO Spark action runs on this (possibly task) thread
    val p = abs(path)
    val prior = cached(p)
    prior.foreach { existing =>
      if (existing.isDir) throw new IOException(s"$p is a directory")
      if (!overwrite) throw new IOException(s"File exists: $p")
    }
    // Hadoop create() makes missing parents; reuse the mkdirs fold —
    // and honor its verdict: a file on the ancestor chain means the
    // parent cannot be a directory (Hadoop throws here too)
    val parent = PathOps.parent(p)
    if (parent != null && !cachedMkdirs(parent, createOnFailure = false))
      throw new IOException(s"Parent path is not a directory: $parent")
    // store the empty inode NOW (CreateFileCommand.scala:79-83) and drop
    // any prior payload once — overwrite is settled before the first byte
    cachePut(inodeFor(p, parent, 0L))
    noteInodeGrowth()
    // overwrite drops prior payload: pending rows in memory; one base
    // filter ONLY if this path ever folded (baseFiles) — targeting the
    // BIRTH name, and freeing it for the replacement's next fold
    if (overwrite && prior.isDefined) {
      dropPending(_.getString(0) == p)
      val birth = baseFiles.remove(p)
      if (birth != null) {
        birthIndex.remove(birth)
        savedBirths.remove(birth) // saved parquet rows are now stale
        overlayBirths.remove(birth) // wal rows likewise (close re-commits)
        setState(GraftFs(state.catalog,
          state.chunks.filter(col("path") =!= birth)))
      }
    }
    new FSDataOutputStream(new SubBlockStream(p, parent), statistics, 0L)
  }

  private def inodeFor(p: String, parent: String, len: Long): Inode =
    Inode(p, parent, ctx.cwd.split("/").last, "graft", 420,
      isDir = false, new Timestamp(1704067200000L),
      BlockMeta.forLength(p, len, subBlockSize, blockSize))

  /** The write path: buffers at most ONE subblock; a filled (or final
    * partial) buffer becomes one `(path, block_id, sub_id, …)` row in
    * the chunk table — the same geometry `DataPlane.chunk` produces, so
    * catalog folds and reassembly agree byte-for-byte. Mirrors the
    * reference's write/endSubBlock/endBlock/flush/close state machine,
    * including write-after-close and double-close behavior
    * (FileSystemOutputStream.scala:55-143: close is isClosed-guarded, a
    * second close is a no-op; writes after close throw "Stream closed").
    */
  private final class SubBlockStream(p: String, parent: String)
    extends OutputStream {
    private val buf = new Array[Byte](subBlockSize)
    private var used = 0
    private var written = 0L
    private var isClosed = false
    // true while a flush()-persisted PARTIAL copy of the current
    // subblock sits in the chunk table; the next persist of the same
    // (block_id, sub_id) cell must replace it, not union beside it
    private var partialFlushed = false

    override def write(b: Int): Unit = {
      ensureOpen()
      buf(used) = b.toByte
      used += 1
      if (used == subBlockSize) endSubBlock()
    }

    override def write(b: Array[Byte], off: Int, len: Int): Unit = {
      ensureOpen()
      var o = off
      var rem = len
      while (rem > 0) {
        val n = math.min(rem, subBlockSize - used)
        System.arraycopy(b, o, buf, used, n)
        used += n; o += n; rem -= n
        if (used == subBlockSize) endSubBlock()
      }
    }

    private def ensureOpen(): Unit =
      if (isClosed) throw new IOException("Stream closed")

    // endSubBlock: every flushed subblock before the final one is FULL,
    // so the running byte count determines the global subblock index and
    // with it the (block_id, sub_id, offsets) cell — no per-stream
    // metadata accumulators needed beyond `written`
    // persist the CURRENT (possibly partial) buffer as one chunk row at
    // its (block_id, sub_id) cell; a previously flush()-persisted
    // partial copy of the same cell is filtered out first so the table
    // never holds two rows for one subblock
    // the hot path allocates NO plan nodes: the row lands in the
    // pending buffer (folded as one union per FoldBytes); a
    // flush()-persisted partial copy of the same cell is replaced in
    // the buffer — only if a fold landed it in the base first does
    // one filter enter the plan
    private def persistSubBlock(): Unit = withMutLock {
      val idx = written / subBlockSize
      val sbPerBlock = blockSize / subBlockSize
      val blockId = (idx / sbPerBlock).toInt
      val subId = (idx % sbPerBlock).toInt
      if (partialFlushed) {
        val before = pendingChunks.length
        dropPending(r => r.getString(0) == p &&
          r.getInt(1) == blockId && r.getInt(2) == subId)
        if (pendingChunks.length == before) {
          // the folded partial copy sits under the BIRTH name
          val birth = Option(baseFiles.get(p)).getOrElse(p)
          setState(GraftFs(state.catalog,
            state.chunks.filter(!(col("path") === birth &&
              col("block_id") === blockId && col("sub_id") === subId))))
        }
      }
      pendingChunks += Row(p, blockId, subId,
        blockId.toLong * blockSize, subId.toLong * subBlockSize,
        java.util.Arrays.copyOf(buf, used), used.toLong)
      pendingBytes += used
      if (pendingBytes >= FoldBytes) foldPending()
    }

    private def endSubBlock(): Unit = {
      if (used == 0) return
      persistSubBlock()
      partialFlushed = false
      written += used
      used = 0
      // endBlock: a block boundary just closed → re-commit the inode
      // with every block written so far (the reference re-stores the
      // whole INode per block, FileSystemOutputStream.scala:103-120)
      if (written % blockSize == 0) commitInode()
    }

    // metadata is the cache (the catalog frame derives from it), so an
    // inode commit is a pure map write — no plan growth, no action
    private def commitInode(): Unit = withMutLock {
      cachePut(inodeFor(p, parent, written + used))
    }

    /** Flush persists the buffered partial subblock so flushed bytes
      * are durable before close. DELIBERATE DIVERGENCE from the
      * reference (FileSystemOutputStream.scala:122-130), not a mirror:
      * the reference SEALS the subblock on flush (subsequent bytes
      * start a new subblock), defers the inode store to a block
      * boundary/close (so flushed bytes are durable but not yet
      * reader-visible via metadata), and throws IOException("Stream
      * closed") on a closed stream. Graft instead keeps filling the
      * same subblock (the next persist replaces the partial copy —
      * chunk geometry stays self-consistent instead of fragmenting per
      * flush), re-commits the inode at the flushed length
      * (HDFS-hflush-like read visibility), and no-ops when closed
      * (FilterOutputStream wrappers call flush() from a second close(),
      * which must stay harmless). Spec-pinned in the facade suite.
      */
    override def flush(): Unit = {
      if (isClosed || used == 0) return
      persistSubBlock()
      partialFlushed = true
      commitInode()
    }

    override def close(): Unit = {
      if (isClosed) return
      endSubBlock()
      commitInode()
      isClosed = true
      // post-mount bytes become executor-servable the moment the
      // stream commits (write-through scaladoc); outside mutLock
      writeThroughOnClose(p, written)
    }
  }

  // ── A2: open — error matrix verbatim (OpenFileCommand.scala:27-37 via
  //    SnackFSSpec:82-97). Reads are BLOCK-cached, not whole-file: the
  //    stream fetches only the ≤blockSize block covering the current
  //    position (pruned at the chunk scan by (path, block_id)) and keeps
  //    exactly one block resident — the reference's own read shape
  //    (FileSystemInputStream loads one BlockInputStream at a time,
  //    :60-76), so a file larger than driver heap still reads. ─────────
  override def open(path: Path, bufferSize: Int): FSDataInputStream = {
    // metadata from the cache (action-free, locked against mid-rename
    // partial states — see getFileStatus); only the PAYLOAD fetches
    // inside BlockCachedStream still run engine actions — the mount's
    // remaining local-mode read caveat (see the class scaladoc)
    val p = abs(path)
    executorRefresh() // live wal view for executor mounts
    val node = withMutLock(cached(p))
      .getOrElse(throw new IOException("No such file."))
    if (node.isDir) throw new IOException(s"Path $path is a directory.")
    new FSDataInputStream(new BlockCachedStream(p, node.length))
  }

  /** Seekable + positioned-readable view that materializes ONE block at
    * a time. Geometry is fixed per filesystem instance, so the block
    * covering a position is `pos / blockSize` — a (path, block_id)
    * equality filter the planner prunes before any payload moves.
    *
    * The block map (fileLen) snapshots at open; payload fetches read
    * the LIVE chunk table — the reference's exact split
    * (FileSystemInputStream loads the INode once at open, then pulls
    * each block from the store on demand). A file deleted or truncated
    * under an open stream therefore fails the next block fetch with
    * IOException, the analog of the reference's store NotFoundException
    * — never a silent wrong read, an index crash, or a stuck loop.
    * One documented divergence: block keys here are path-stable (the
    * reference keys blocks by fresh UUIDs), so an overwrite that keeps
    * a block at least as long serves the NEW bytes to an already-open
    * stream instead of failing.
    */
  private final class BlockCachedStream(p: String, fileLen: Long)
    extends java.io.InputStream
    with org.apache.hadoop.fs.Seekable
    with org.apache.hadoop.fs.PositionedReadable {

    private var pos = 0L
    private var cachedId = -1L
    private var cached: Array[Byte] = Array.emptyByteArray

    // ALL public entry points below synchronize on the stream: Hadoop's
    // PositionedReadable contract allows CONCURRENT preads on one open
    // stream (vectored IO does exactly that), and the one-block cache
    // (cached/cachedId) plus pos are shared state — an unsynchronized
    // interleaving could copy block B's bytes at block A's offsets into
    // a caller's buffer. One block cache per stream stays the memory
    // contract; concurrent preads serialize (correctness first — a
    // parallel-read client opens multiple streams).
    private def blockAt(id: Long, needUpTo: Long): Array[Byte] = {
      // engineOp brackets ONLY a BASE-plan block-miss fetch: read()
      // calls this per byte, and a cache hit must stay a plain field
      // read — not a reflection round-trip through the TaskContext
      // bridge. The miss path splits on where the bytes live:
      //  - path never folded to base → assemble from the pending
      //    buffer in PURE MEMORY. This is what lets a stock job READ
      //    BACK what it just wrote at full outer parallelism: parquet
      //    footer/page reads arrive on scan-task threads (schema
      //    inference runs footer reads as a distributed job — observed
      //    r11, 4 footer tasks on local[4] each starving a nested
      //    collect), and fresh data must not need a nested job.
      //  - path folded → the payload is in the lazy base plan; fold
      //    any still-pending rows so the scan sees everything, then
      //    one pruned engine collect. Reading FOLDED (> FoldBytes)
      //    data from inside a core-saturating outer job remains the
      //    mount's documented local-mode caveat.
      if (id != cachedId) {
        val (memRows, birth, direct, overlayFile) = withMutLock {
          val rs = pendingChunks.filter(r =>
            r.getString(0) == p && r.getInt(1) == id.toInt)
          val b = baseFiles.get(p)
          (rs.sortBy(_.getLong(4)).map(_.getAs[Array[Byte]](5)).toArray,
            b, b != null && savedBirths.contains(b),
            if (b != null) overlayBirths.get(b) else null)
        }
        if (overlayFile != null && memRows.isEmpty) {
          // post-mount WRITE-THROUGH payload: one session-free read of
          // the wal delta file (≤ FoldBytes by construction), sliced
          // to the requested block — the executor-side path for bytes
          // written AFTER the mount (write-through scaladoc)
          val whole = SavedStateWriter.readPayload(overlayFile, birth)
          val from = math.min(whole.length.toLong, id * blockSize).toInt
          val until = math.min(whole.length.toLong,
            (id + 1) * blockSize).toInt
          cached = java.util.Arrays.copyOfRange(whole, from, until)
          cachedId = id
        } else if (direct && memRows.isEmpty) {
          // SAVED payload, untouched since the mount: a session-free
          // pruned parquet read — no driver job, no nested action, no
          // lock held across I/O. THE executor-side read path (and the
          // fastest driver-side one); see savedBirths/SavedState.
          cached = SavedState.readBlock(savedChunksDir, birth, id)
          cachedId = id
        } else if (birth == null) {
          val total = memRows.iterator.map(_.length).sum
          val out = new Array[Byte](total)
          var at = 0
          memRows.foreach { d =>
            System.arraycopy(d, 0, out, at, d.length); at += d.length
          }
          cached = out
          cachedId = id
        } else {
          // PIN the snapshot for the collect's duration: the plan read
          // here is rooted in the current checkpoint generation, and
          // the compactor's trySwap (which runs under mutLock but NOT
          // for the whole collect) retires-and-sweeps that generation
          // on success — a swap landing mid-collect would free the
          // blocks this job is reading (checkpoint-block-not-found).
          // trySwap's contract covers verb read-modify-write; in-flight
          // READERS protect themselves with the pin, which sweepRetired
          // honors.
          val snap = withMutLock { foldPending(); cell.pinCurrent() }
          try engineOp {
            // base rows live under the file's BIRTH name (renames never
            // rewrite the plan — baseFiles scaladoc)
            val rows = DataPlane.reassembleBlocks(
                snap.chunks.filter(col("path") === birth && col("block_id") === id))
              .select(col("data")).collect()
            cached = if (rows.isEmpty) Array.emptyByteArray
              else rows(0).getAs[Array[Byte]](0)
            cachedId = id
          } finally cell.unpin(snap)
        }
      }
      if (cached.length < needUpTo)
        throw new IOException(
          s"Block $id of $p no longer holds byte ${id * blockSize + needUpTo - 1}" +
            " — file deleted or replaced under an open stream")
      cached
    }

    override def read(): Int = synchronized {
      if (pos >= fileLen) -1
      else {
        val inBlock = (pos % blockSize).toInt
        val b = blockAt(pos / blockSize, inBlock + 1)(inBlock) & 0xFF
        pos += 1
        b
      }
    }

    // serve up to the current block's end; callers (readFully, IOUtils)
    // loop — matching InputStream's may-return-fewer contract
    override def read(buf: Array[Byte], off: Int, len: Int): Int = synchronized {
      if (len == 0) return 0
      if (pos >= fileLen) return -1
      val inBlock = (pos % blockSize).toInt
      val block = blockAt(pos / blockSize, inBlock + 1)
      // clamp to the open-time snapshot length too: if the file was
      // overwritten LONGER under this stream, the live block can hold
      // more bytes than the snapshot — never serve past fileLen
      val n = math.min(math.min(len, block.length - inBlock).toLong,
        fileLen - pos).toInt
      System.arraycopy(block, inBlock, buf, off, n)
      pos += n
      n
    }

    override def seek(target: Long): Unit = synchronized {
      if (target < 0 || target > fileLen)
        throw new IOException(s"seek past end: $target")
      pos = target
    }
    override def getPos: Long = synchronized(pos)
    override def seekToNewSource(targetPos: Long): Boolean = false

    override def read(position: Long, buffer: Array[Byte], offset: Int,
                      length: Int): Int = synchronized {
      if (length == 0) return 0 // zero-byte read is a no-op even at EOF
      if (position >= fileLen) return -1
      var copied = 0
      var at = position
      while (copied < length && at < fileLen) {
        val inBlock = (at % blockSize).toInt
        // blockAt throws if the block shrank — the loop can never stall
        val block = blockAt(at / blockSize, inBlock + 1)
        val n = math.min(math.min(length - copied, block.length - inBlock).toLong,
          fileLen - at).toInt
        System.arraycopy(block, inBlock, buffer, offset + copied, n)
        copied += n
        at += n
      }
      copied
    }
    override def readFully(position: Long, buffer: Array[Byte], offset: Int,
                           length: Int): Unit = {
      if (read(position, buffer, offset, length) < length)
        throw new IOException("readFully past EOF")
    }
    override def readFully(position: Long, buffer: Array[Byte]): Unit =
      readFully(position, buffer, 0, buffer.length)
  }

  // ── A7: delete — cascades to the data plane; the error matrix is
  //    settled against the cache, the cascade applies the SAME frame
  //    predicates (GraftFs.delete*Frames) lazily — action-free. The
  //    wal mirror (outside the lock) keeps executor views of
  //    write-through'd files coherent. ──────────────────────────────────
  override def delete(path: Path, recursive: Boolean): Boolean = {
    val ok = deleteLocked(path, recursive)
    if (ok) mirrorDelete(abs(path))
    ok
  }

  private def deleteLocked(path: Path, recursive: Boolean): Boolean =
    withMutLock {
      mutGuard()
      val p = abs(path)
      def dropChunksOf(): Unit = {
        dropPending(rowInSubtree(_, p))
        if (baseHasSubtree(p)) {
          val pre = subtreePrefix(p)
          val members = baseSubtree(p) // (currentPath, birthName)
          members.foreach { case (c, b) =>
            baseFiles.remove(c); birthIndex.remove(b)
            savedBirths.remove(b)
          }
          // rows live under BIRTH names. The bulk of a subtree's rows
          // sit under the current prefix (never renamed), covered by
          // ONE prefix predicate; the exceptions stay O(renamed files):
          //  - foreign births: members renamed IN from elsewhere —
          //    their rows need explicit deletion (isin);
          //  - alive births under the prefix: files renamed AWAY whose
          //    rows the prefix predicate must NOT catch (anti-isin).
          //    (birthIndex entries under pre are live files by
          //    construction — this subtree's members were removed
          //    above, so what remains is exactly the renamed-away set.)
          val strayIn = members.collect {
            case (_, b) if b != p && !b.startsWith(pre) => b
          }
          val aliveUnder = Seq.newBuilder[String]
          val it = birthIndex.tailMap(pre).keySet().iterator()
          var go = true
          while (go && it.hasNext) {
            val k = it.next()
            if (k.startsWith(pre)) aliveUnder += k else go = false
          }
          if (birthIndex.containsKey(p)) aliveUnder += p
          val alive = aliveUnder.result()
          val underPre = col("path") === p || col("path").startsWith(pre)
          val doomedPre =
            if (alive.isEmpty) underPre
            else underPre && !col("path").isin(alive: _*)
          val doomed =
            if (strayIn.isEmpty) doomedPre
            else doomedPre || col("path").isin(strayIn: _*)
          setState(GraftFs(state.catalog, state.chunks.filter(!doomed)))
        }
      }
      cached(p) match {
        case None => false
        case Some(node) if node.isFile =>
          cacheDrop(p)
          dropChunksOf()
          true
        case Some(_) if !cacheHasChildren(p) =>
          cacheDrop(p)
          dropChunksOf()
          true
        case Some(_) if !recursive =>
          throw new IOException("Directory is not empty")
        case Some(_) =>
          cacheRemoveSubtree(p)
          dropChunksOf()
          true
      }
    }

  // ── A8: rename — one prefix-rewrite pass per plane; preconditions
  //    from the cache, frames lazy (the committer's commit dance runs
  //    this from task threads) — action-free. The wal mirror (outside
  //    the lock) moves write-through'd payloads to their final names,
  //    so a committer's temp→final dance stays executor-visible. ────────
  override def rename(src: Path, dst: Path): Boolean = {
    val ok = renameLocked(src, dst)
    if (ok) mirrorRename(abs(src), abs(dst))
    ok
  }

  private def renameLocked(src: Path, dst: Path): Boolean =
    withMutLock {
      mutGuard()
      val s = abs(src)
      val d = abs(dst)
      if (s == d) true
      else {
        if (cached(s).isEmpty)
          throw new IOException(s"No such file or directory.$s")
        if (cached(d).isDefined)
          throw new IOException("Destination already exists")
        val dstParent = PathOps.parent(d)
        if (dstParent != null) {
          val parentNode = cached(dstParent).getOrElse(throw new IOException(
            s"Destination $dstParent directory does not exist."))
          if (parentNode.isFile)
            throw new IOException("A file exists with parent of destination.")
        }
        cacheRename(s, d)
        // pending rows move in memory — the committer's common case
        // (it renames files written moments ago); the base pays the
        // frame rewrite only when folded rows are actually under src
        val pre = subtreePrefix(s)
        var i = 0
        while (i < pendingChunks.length) {
          val r = pendingChunks(i)
          if (r.getString(0) == s || r.getString(0).startsWith(pre)) {
            pendingChunks(i) = Row(d + r.getString(0).substring(s.length),
              r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4),
              r.get(5), r.getLong(6))
          }
          i += 1
        }
        if (baseHasSubtree(s)) {
          // ZERO plan nodes: rows keep their immutable BIRTH names;
          // rename is pure map re-keying (baseFiles scaladoc). The old
          // per-rename filter∪rewrite doubled the plan tree — under a
          // committer storm that compounded exponentially (2^renames)
          // faster than any compaction cadence could flatten it.
          baseSubtree(s).foreach { case (c, b) =>
            baseFiles.remove(c)
            val nc = d + c.substring(s.length)
            baseFiles.put(nc, b)
            birthIndex.put(b, nc)
          }
        }
        true
      }
    }

  // ── A4: append always throws — IOException, the reference's exact
  //    type (AppendFileCommand.scala:38-40), so client code catching
  //    IOException around append sees the reference behavior ────────────
  override def append(path: Path, bufferSize: Int,
                      progress: Progressable): FSDataOutputStream =
    throw new IOException("Appending to existing file is not supported.")

  // ── A10: getFileBlockLocations — the reference overrides this so
  //    Hadoop/Spark schedulers see real replica hosts (SnackFS.scala:
  //    135-153: prune blocks ending before `start`, then map each block
  //    to its ring endpoints as hosts + host:port names). Delegates to
  //    the catalog op that is already oracle-green (fs_block_locations),
  //    filtered to the exact path (the catalog op takes a prefix). ─────
  override def getFileBlockLocations(file: FileStatus, start: Long,
                                     len: Long): Array[BlockLocation] = {
    if (file == null) return null
    if (start < 0 || len < 0)
      throw new IllegalArgumentException("Invalid start or len parameter")
    val p = abs(file.getPath)
    // the cache-resident inode carries the full block map, so the
    // SAME projection the catalog op runs (prune blocks ending before
    // `start`, ascii-of-first-id-char ring owner, three replica
    // hosts — FsCatalog.blockLocations) computes in pure memory;
    // action-free for scheduler calls that arrive inside tasks. The
    // distributed twin stays oracle-green (fs_block_locations,
    // fs_dsv2_scan).
    withMutLock(cached(p)).toArray.flatMap(n => Option(n.blocks).getOrElse(Seq.empty)
      .filter(b => b.offset + b.length >= start)
      .map { b =>
        val owner = b.id.charAt(0).toInt % 3
        val hosts = Array(s"node-$owner", s"node-${(owner + 1) % 3}",
          s"node-${(owner + 2) % 3}")
        new BlockLocation(hosts.map(h => s"$h:9160"), hosts,
          b.offset, b.length)
      })
  }

  /** Current snapshot, for tests and interop with the query layer —
    * PINNED (ref counted): the snapshot's backing checkpoint survives
    * this facade's later compactions, so the returned state stays
    * queryable. Release with `releaseSnapshot` when done, or let
    * `close()` drop every pin with the mount.
    */
  def graftFs: GraftFs = withMutLock {
    require(cell != null,
      "an executor-mode mount holds no frame planes (read-only, " +
        "SavedState-served) — snapshot on the driver mount instead")
    foldPending()
    refreshCatalog()
    cell.pinCurrent()
  }

  /** Rebuild the catalog frame from the authoritative inode cache — a
    * depth-1 createDataset, the derive-on-demand half of the
    * cache-is-the-catalog design (see [[pendingChunks]]). Caller holds
    * [[mutLock]].
    */
  private def refreshCatalog(): Unit = {
    val s = spark
    import s.implicits._
    val values = Seq.newBuilder[Inode]
    inodeCache.values.forEach(values += _)
    setState(GraftFs(FsCatalog(s.createDataset(values.result())),
      state.chunks))
  }

  /** Release one `graftFs` escape (see FsState.unpin). */
  def releaseSnapshot(snapshot: GraftFs): Unit = cell.unpin(snapshot)

  /** Swap-outcome accounting passthrough (FsState.swapStats). */
  private[fs] def swapStats: (Int, Int, Int) = cell.swapStats

  override def close(): Unit = {
    if (compactor != null) compactor.interrupt()
    // the mount's escaped snapshots die with it — free their retained
    // checkpoints instead of leaking one per compaction generation
    if (cell != null) cell.releasePins()
    super.close()
  }
}

object GraftFileSystem {

  // TaskContext.setTaskContext/unset are private[spark]; reflection
  // keeps the bridge dependency-free. Resolved once per JVM.
  private val tcModuleClass = Class.forName("org.apache.spark.TaskContext$")
  private val tcModule = tcModuleClass.getField("MODULE$").get(null)
  private val tcGet = tcModuleClass.getMethod("get")
  private val tcUnset = tcModuleClass.getMethod("unset")
  private val tcSet = tcModuleClass.getMethod("setTaskContext",
    Class.forName("org.apache.spark.TaskContext"))

  /** Run `f` with no TaskContext on the calling thread, restoring it in
    * a finally. Spark's `getActiveSession` deliberately answers None
    * inside a running task, so a mounted verb invoked from a local-mode
    * task thread could never plan its nested engine action without
    * this; with the context parked, the seated session becomes visible
    * and the nested job schedules normally (pinned by SchemeMountSpec).
    */
  private[fs] def withoutTaskContext[T](f: => T): T = {
    val tc = tcGet.invoke(tcModule)
    if (tc == null) f
    else {
      tcUnset.invoke(tcModule)
      try f finally tcSet.invoke(tcModule, tc)
    }
  }

}
