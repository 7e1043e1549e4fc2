package graft.fs

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.must.Matchers

/** A11 semantics from reference SnackFS.scala:51-85. */
class FsContextSpec extends AnyFlatSpec with Matchers {

  behavior of "FsContext (A11 uri/cwd bookkeeping)"

  it must "initialize with scheme://authority and /user/<name> cwd" in {
    val ctx = FsContext.initialize("graftfs://host:9160/some/ignored/path", "alice")
    ctx.uri.toString must be("graftfs://host:9160")
    ctx.cwd must be("/user/alice")
  }

  it must "resolve relative paths against the cwd and keep absolute ones" in {
    val ctx = FsContext.initialize("graftfs://h:1", "graft")
    ctx.makeAbsolute("data/x.bin") must be("/user/graft/data/x.bin")
    ctx.makeAbsolute("/abs/y") must be("/abs/y")
    ctx.makeAbsolute("../shared") must be("/user/shared")
    ctx.makeAbsolute("./a//b/./c") must be("/user/graft/a/b/c")
  }

  it must "route setWorkingDirectory through makeAbsolute" in {
    val ctx = FsContext.initialize("graftfs://h:1", "graft")
    val cd1 = ctx.withWorkingDir("proj")
    cd1.cwd must be("/user/graft/proj")
    cd1.withWorkingDir("/tmp").cwd must be("/tmp")
    cd1.withWorkingDir("..").cwd must be("/user/graft")
  }

  it must "qualify paths with the system uri" in {
    val ctx = FsContext.initialize("graftfs://host:9160", "graft")
    ctx.makeQualified("f.txt") must be("graftfs://host:9160/user/graft/f.txt")
  }
}
