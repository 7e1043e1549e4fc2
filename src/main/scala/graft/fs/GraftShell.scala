package graft.fs

import java.io.{FileNotFoundException, IOException}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.catalog.PathOps

/** One shell invocation's outcome: exit code + stdout/stderr lines —
  * returned, not printed, so the dispatcher is testable and a `main`
  * can render it.
  */
final case class ShellResult(code: Int, out: Seq[String], err: Seq[String])

/** D-layer verb dispatcher — the `run(argv)` → command analog of the
  * reference shell (SnackFSShell.scala:553-731): arity-check the verb,
  * resolve path arguments through glob expansion the way the reference
  * routes them through `FileSystem.globStatus` (-ls/-lsr/-du/-rm/-rmr/
  * -cat/-text/-mv/-cp/-get; -tail stays literal — the reference's tail
  * calls getFileStatus directly, SnackFSShell.scala:522-525), delegate
  * to the distributed op, map exceptions to the reference's
  * `cmd: message` stderr convention. Multi-argument verbs apply the
  * reference's `doall` loop (SnackFSShell.scala:343-408): each argument
  * is tried, failures print and processing continues, any failure makes
  * the exit code -1. Holds the current (catalog, chunks) snapshot like
  * GraftFileSystem — the single-driver narrowing documented there.
  */
final class GraftShell(initial: GraftFs, context: FsContext) {

  // the compacting state cell (FsState) keeps a long-lived shell
  // session's plan depth bounded; external reads PIN their snapshot so
  // later compactions can't release a checkpoint someone still holds
  private val cell = new FsState(initial)
  def fs: GraftFs = cell.pinCurrent()
  private def cur: GraftFs = cell.get
  private def setFs(next: GraftFs): Unit = cell.set(next)
  var ctx: FsContext = context

  /** Release one `fs` escape (pins are ref counted — see FsState). */
  def releaseSnapshot(snapshot: GraftFs): Unit = cell.unpin(snapshot)

  /** End-of-session cleanup: drop every pinned snapshot so retained
    * checkpoints free (mirrors GraftFileSystem.close).
    */
  def close(): Unit = cell.releasePins()

  private val minArgs: Map[String, Int] = Map(
    "-put" -> 2, "-copyFromLocal" -> 2, "-moveFromLocal" -> 2,
    "-get" -> 2, "-copyToLocal" -> 2, "-getmerge" -> 2,
    "-mv" -> 2, "-cp" -> 2, "-test" -> 2,
    "-rm" -> 1, "-rmr" -> 1, "-cat" -> 1, "-text" -> 1, "-mkdir" -> 1,
    "-touchz" -> 1, "-stat" -> 1, "-tail" -> 1,
    "-ls" -> 1, "-lsr" -> 1, "-du" -> 1, "-dus" -> 1, "-count" -> 1,
    "-help" -> 0)

  def run(argv: Array[String]): ShellResult = {
    if (argv.isEmpty) return ShellResult(-1, Nil, Seq(ShellHelp.helpAll))
    val cmd = argv(0)
    val args = argv.drop(1).toSeq
    minArgs.get(cmd) match {
      case None =>
        return ShellResult(-1, Nil, Seq(s"Unknown command: $cmd", ShellHelp.helpAll))
      case Some(n) if args.length < n =>
        return ShellResult(-1, Nil, ShellHelp.help(cmd).toSeq)
      case _ => ()
    }
    try dispatch(cmd, args)
    catch {
      case e: FileNotFoundException =>
        ShellResult(-1, Nil, Seq(s"$cmd: ${e.getMessage}"))
      case e: IOException =>
        ShellResult(-1, Nil, Seq(s"$cmd: ${e.getMessage}"))
      case e: UnsupportedOperationException =>
        ShellResult(-1, Nil, Seq(s"$cmd: ${e.getMessage}"))
    }
  }

  private def abs(p: String): String = ctx.makeAbsolute(p)

  /** Resolve an argument that must name an existing FILE (the -cat error
    * matrix, shared by -text/-tail: missing → FNFE, directory → IOE).
    */
  private def fileArg(arg: String): String = {
    val p = abs(arg)
    val node = cur.catalog.retrieve(p)
      .getOrElse(throw new FileNotFoundException(p))
    if (node.isDir) throw new IOException(s"$p is a directory")
    p
  }

  /** Child-path prefix for dir-scoped verbs — "/" is its own prefix. */
  private def dirPrefix(p: String): String = if (p == "/") "/" else p + "/"

  private def basename(p: String): String = p.substring(p.lastIndexOf('/') + 1)

  /** Expand one source argument the way the reference expands every
    * path argument through globStatus: a glob resolves to its sorted
    * matches (none → the globStatus FileNotFoundException); a literal
    * passes through untouched so the verb's own error matrix applies.
    */
  private def expandSrc(arg: String): Seq[String] = {
    val p = abs(arg)
    if (!PathOps.isGlob(arg)) Seq(p)
    else {
      val matched = cur.catalog.globStatus(p)
        .select("path").collect().map(_.getString(0)).toSeq.sorted
      if (matched.isEmpty)
        throw new FileNotFoundException(
          s"Cannot access $arg: No such file or directory.")
      matched
    }
  }

  /** The reference's `doall` loop: run `f` per argument, print each
    * failure as `cmd: message` and keep going; -1 if anything failed.
    */
  private def forEachSrc(cmd: String, srcs: Seq[String])
                        (f: String => Seq[String]): ShellResult = {
    val out = Seq.newBuilder[String]
    val err = Seq.newBuilder[String]
    var code = 0
    srcs.foreach { s =>
      try out ++= f(s)
      catch {
        case e: IOException => code = -1; err += s"$cmd: ${e.getMessage}"
      }
    }
    ShellResult(code, out.result(), err.result())
  }

  private def statusLines(rows: Array[Row]): Seq[String] =
    rows.map { r =>
      val kind = if (r.getAs[Boolean]("is_dir")) "d" else "-"
      f"$kind${r.getAs[Int]("permission")}%4d ${r.getAs[Long]("len")}%10d ${r.getAs[String]("path")}"
    }.toSeq

  private def dispatch(cmd: String, args: Seq[String]): ShellResult = cmd match {
    case "-help" =>
      ShellResult(0, args.headOption match {
        case Some(verb) => ShellHelp.help(verb).toSeq
        case None => Seq(ShellHelp.helpAll)
      }, Nil)

    case "-ls" | "-lsr" =>
      // the reference errors when the GLOB matches nothing (not when a
      // matched dir happens to be empty — that prints "Found 0 items")
      forEachSrc(cmd, args) { arg =>
        val pat = abs(arg)
        if (cur.catalog.globStatus(pat).limit(1).count() == 0)
          throw new FileNotFoundException(
            s"Cannot access $arg: No such file or directory.")
        val rows = cur.catalog.listGlob(pat, recursive = cmd == "-lsr").collect()
        (if (cmd == "-ls") Seq(s"Found ${rows.length} items") else Nil) ++
          statusLines(rows)
      }

    case "-du" =>
      // same no-match matrix as -ls: the reference resolves the argument
      // through globStatus, which raises FNFE when nothing matches —
      // glob or literal alike (SnackFSShell doall → inherited du)
      forEachSrc(cmd, args) { arg =>
        val p = abs(arg)
        if (PathOps.isGlob(arg)) {
          if (cur.catalog.globStatus(p).limit(1).count() == 0)
            throw new FileNotFoundException(
              s"Cannot access $arg: No such file or directory.")
        } else if (!cur.catalog.exists(p)) throw new FileNotFoundException(p)
        val rows =
          if (PathOps.isGlob(arg)) cur.catalog.duGlob(p).collect()
          else cur.catalog.du(p).collect()
        rows.map(r => f"${r.getLong(1)}%12d  ${r.getString(0)}").toSeq
      }

    case "-dus" =>
      forEachSrc(cmd, args) { arg =>
        val p = abs(arg)
        if (!cur.catalog.exists(p)) throw new FileNotFoundException(p)
        val r = cur.catalog.dus(p).collect()(0)
        Seq(f"${r.getLong(1)}%12d  ${r.getString(0)}")
      }

    case "-count" =>
      // -q prints the quota columns first (SnackFSShell.scala:536-548 →
      // ContentSummary.toString(true)); this engine has no quotas set,
      // so they render as Hadoop renders unset quotas: none/inf pairs
      val qOption = args.head == "-q"
      if (qOption && args.length < 2)
        return ShellResult(-1, Nil, ShellHelp.help(cmd).toSeq)
      val pArg = if (qOption) args(1) else args.head
      val p = abs(pArg)
      if (!cur.catalog.exists(p)) throw new FileNotFoundException(p)
      val r = cur.catalog.countSummary(p).collect()(0)
      val quota = if (qOption) f"${"none"}%12s ${"inf"}%12s ${"none"}%12s ${"inf"}%12s " else ""
      ShellResult(0,
        Seq(f"$quota${r.getLong(1)}%8d ${r.getLong(2)}%8d ${r.getLong(3)}%12d ${r.getString(0)}"), Nil)

    case "-mkdir" =>
      forEachSrc(cmd, args) { arg =>
        val (cat2, ok) = cur.catalog.mkdirs(abs(arg))
        setFs(GraftFs(cat2, cur.chunks, cur.aliases))
        if (!ok) throw new IOException(s"cannot create directory $arg")
        Nil
      }

    case "-touchz" =>
      forEachSrc(cmd, args) { arg =>
        setFs(GraftFs(cur.catalog.touchz(abs(arg)), cur.chunks, cur.aliases))
        Nil
      }

    case "-test" =>
      val ok = args.head match {
        case "-e" => cur.catalog.testE(abs(args(1)))
        case "-z" => cur.catalog.testZ(abs(args(1)))
        case "-d" => cur.catalog.testD(abs(args(1)))
        case other => return ShellResult(-1, Nil, Seq(s"-test: unknown flag $other"))
      }
      ShellResult(if (ok) 0 else 1, Nil, Nil)

    case "-stat" =>
      val (fmt, p) =
        if (args.length >= 2) (args.head, args(1)) else ("%y", args.head)
      val r = cur.catalog.statFormatted(abs(p), fmt).collect()(0)
      ShellResult(0, Seq(r.getString(1)), Nil)

    case "-mv" | "-cp" =>
      // multiple sources (args or glob matches) need a directory
      // destination (SnackFSShell.scala:425-430); -cp into an existing
      // dir redirects to dir/<basename> (FileUtil.checkDest, inherited
      // via FsShell.copy), while -mv keeps the FileSystem-level rename
      // verbatim — the reference's RenameCommand throws "Destination
      // already exists" even when the destination is a directory
      // (RenameCommand.scala:81-84), a quirk mirrored, not fixed
      val verb = if (cmd == "-mv") "moving" else "copying"
      val dst = abs(args.last)
      val sources = args.dropRight(1)
      val dstIsDir = cur.catalog.retrieve(dst).exists(_.isDir)
      if (sources.length > 1 && !dstIsDir)
        return ShellResult(-1, Nil, Seq(
          s"$cmd: When $verb multiple files, destination ${args.last} should be a directory."))
      forEachSrc(cmd, sources) { arg =>
        val matched = expandSrc(arg)
        if (matched.length > 1 && !dstIsDir)
          throw new IOException(
            s"When $verb multiple files, destination should be a directory.")
        matched.foreach { src =>
          // rename is driver-map re-keying (zero plan nodes) and copy a
          // single local-leaf union (GraftFs scaladocs) — plain linear
          // sets; the r13 tree-doubling shapes and their HeavyCompactDebt
          // mitigation are retired
          if (cmd == "-mv") {
            val (next, _) = cur.rename(src, dst)
            setFs(next)
          } else {
            val target = if (dstIsDir) s"${dirPrefix(dst)}${basename(src)}" else dst
            val (next, _) = cur.copy(src, target)
            setFs(next)
          }
        }
        Nil
      }

    case "-rm" | "-rmr" =>
      val recursive = cmd == "-rmr"
      forEachSrc(cmd, args) { arg =>
        val target = abs(arg)
        val (next, ok) =
          if (PathOps.isGlob(arg)) cur.deleteGlob(target, recursive)
          else cur.delete(target, recursive)
        setFs(next)
        if (!ok)
          throw new FileNotFoundException(s"No such file or directory: $arg")
        Nil
      }

    case "-cat" =>
      // every source argument, glob-expanded, in the doall loop — the
      // reference cats each match and keeps going on failures
      forEachSrc(cmd, args) { arg =>
        expandSrc(arg).map { p =>
          val bytes = cur.cat(p).collect()
          val payload = if (bytes.isEmpty) Array.emptyByteArray
            else bytes(0).getAs[Array[Byte]]("data")
          new String(payload, java.nio.charset.StandardCharsets.UTF_8)
        }
      }

    case "-text" =>
      forEachSrc(cmd, args) { arg =>
        expandSrc(arg).map { m =>
          val p = fileArg(m)
          val rows = DataPlane.text(cur.rowsForFile(p)).collect()
          rows.map(_.getString(1)).mkString("\n")
        }
      }

    case "-tail" =>
      val p = fileArg(args.head)
      val rows = DataPlane.tail(cur.rowsForFile(p), 1024).collect()
      val payload = if (rows.isEmpty) Array.emptyByteArray
        else rows(0).getAs[Array[Byte]]("data")
      ShellResult(0, Seq(new String(payload, java.nio.charset.StandardCharsets.UTF_8)), Nil)

    case "-put" | "-copyFromLocal" | "-moveFromLocal" =>
      // multiple LOCAL sources upload into a directory destination
      // (FsShell copyFromLocal takes Path[] srcs; reference arg slice
      // SnackFSShell.scala:235-238); a single source may also target a
      // fresh path. Each source runs in the doall loop.
      val rawDst = abs(args.last)
      val sources = args.dropRight(1)
      val dstIsDir = cur.catalog.retrieve(rawDst).exists(_.isDir)
      if (sources.length > 1 && !dstIsDir)
        return ShellResult(-1, Nil, Seq(
          s"$cmd: When copying multiple files, destination ${args.last} should be a directory."))
      forEachSrc(cmd, sources) { local =>
        val spark = cur.chunks.sparkSession
        // put INTO an existing directory targets dir/<local basename>;
        // an existing file at the target errors (no silent duplicate
        // chunk rows — reassembly would concatenate both payloads)
        val base = java.nio.file.Paths.get(local).getFileName.toString
        val dst = if (dstIsDir) s"${dirPrefix(rawDst)}$base" else rawDst
        if (cur.catalog.exists(dst))
          throw new IOException(s"Target $dst already exists")
        // size BEFORE moveFromLocal unlinks the source
        val len = java.nio.file.Files.size(java.nio.file.Paths.get(local))
        // block geometry from the session conf (spark.graft.* keys —
        // the reference shell reads the same knobs from core-site.xml)
        val (sub, blk) = GraftConfig.geometry(spark)
        val newChunks =
          if (cmd == "-moveFromLocal")
            DataPlane.moveFromLocal(spark, local, dst, sub, blk)
          else DataPlane.put(spark, local, dst, sub, blk)
        val (cat2, ok) = cur.catalog.mkdirs(PathOps.parent(dst))
        if (!ok) throw new IOException(
          s"Parent path is not a directory: ${PathOps.parent(dst)}")
        val node = graft.catalog.Inode(dst, PathOps.parent(dst), "graft", "graft",
          420, isDir = false, new java.sql.Timestamp(1704067200000L),
          graft.catalog.BlockMeta.forLength(dst, len, sub, blk))
        // withNewRows re-keys the fresh rows if their identity birth is
        // claimed (path re-created after a rename moved the original)
        setFs(cur.withNewRows(cat2.store(node), dst, newChunks))
        Nil
      }

    case "-get" | "-copyToLocal" =>
      // -ignoreCrc/-crc are parsed like the reference (SnackFSShell
      // .scala:605-607) and are deliberate no-ops: this engine stores no
      // CRC sidecar files, so there is nothing to skip or copy
      val rest = args.filterNot(a => a == "-ignoreCrc" || a == "-crc")
      if (rest.length < 2)
        return ShellResult(-1, Nil, ShellHelp.help(cmd).toSeq)
      val local = rest(1)
      val localIsDir =
        java.nio.file.Files.isDirectory(java.nio.file.Paths.get(local))
      val matched = expandSrc(rest.head)
      if (matched.length > 1 && !localIsDir)
        return ShellResult(-1, Nil, Seq(
          s"$cmd: When copying multiple files, destination $local should be a directory."))
      matched.foreach { m =>
        val p = fileArg(m)
        val target = if (localIsDir) s"$local/${basename(p)}" else local
        DataPlane.get(cur.rowsForFile(p), p, target)
      }
      ShellResult(0, Nil, Nil)

    case "-getmerge" =>
      val addnl = args.length > 2 && (args(2).toBooleanOption match {
        case Some(b) => b
        case None => return ShellResult(-1, Nil,
          Seq(s"-getmerge: invalid addnl flag '${args(2)}'"))
      })
      val src = abs(args.head)
      // the reference path errors on a missing source (FileUtil
      // .copyMerge's getFileStatus) — never silently write an empty file
      if (!cur.catalog.exists(src)) throw new FileNotFoundException(src)
      // dir-scoped prefix: "/data" must not bleed onto "/databak"
      DataPlane.getmergeTo(cur.currentChunks, dirPrefix(src), args(1), addnl)
      ShellResult(0, Nil, Nil)

    case other =>
      ShellResult(-1, Nil, Seq(s"Unknown command: $other"))
  }
}
