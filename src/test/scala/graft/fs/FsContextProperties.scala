package graft.fs

import org.scalacheck.{Gen, Prop, Properties}

/** Path-normalization laws for A11 (reference SnackFS.makeAbsolute /
  * Hadoop Path semantics). Pure Scala — no Spark jobs, so these run at
  * full ScalaCheck depth.
  */
object FsContextProperties extends Properties("FsContext") {

  private val ctx = FsContext.initialize("graftfs://h:1", "graft")

  private val genSeg: Gen[String] =
    Gen.oneOf(Gen.identifier.map(_.take(5)), Gen.const("."), Gen.const(".."))

  private val genPath: Gen[String] = for {
    abs <- Gen.oneOf(true, false)
    n <- Gen.choose(0, 6)
    segs <- Gen.listOfN(n, genSeg)
    sep <- Gen.oneOf("/", "//")
  } yield (if (abs) "/" else "") + segs.mkString(sep)

  property("makeAbsolute is idempotent") = Prop.forAll(genPath) { p =>
    val once = ctx.makeAbsolute(p)
    ctx.makeAbsolute(once) == once
  }

  property("result is absolute with no empty/dot/dotdot segments") =
    Prop.forAll(genPath) { p =>
      val abs = ctx.makeAbsolute(p)
      abs.startsWith("/") &&
        abs.split("/").drop(1).forall(s => s.nonEmpty && s != "." && s != "..")
    }

  property("relative paths without dots resolve under the cwd") =
    Prop.forAll(Gen.listOfN(3, Gen.identifier.map(_.take(5)))) { segs =>
      val rel = segs.mkString("/")
      ctx.makeAbsolute(rel) == s"${ctx.cwd}/$rel"
    }

  property("cd through a normalized absolute path lands exactly there") =
    Prop.forAll(Gen.listOfN(3, Gen.identifier.map(_.take(5)))) { segs =>
      val abs = "/" + segs.mkString("/")
      ctx.withWorkingDir(abs).cwd == abs
    }

  property("makeQualified = system uri + makeAbsolute") =
    Prop.forAll(genPath) { p =>
      ctx.makeQualified(p) == s"${ctx.uri}${ctx.makeAbsolute(p)}"
    }
}
