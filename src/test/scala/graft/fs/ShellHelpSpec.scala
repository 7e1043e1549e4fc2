package graft.fs

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.must.Matchers

class ShellHelpSpec extends AnyFlatSpec with Matchers {

  behavior of "ShellHelp (D19)"

  it must "cover every shell verb from SURVEY §2.4" in {
    val verbs = Seq("-ls", "-lsr", "-du", "-dus", "-count", "-mv", "-cp",
      "-rm", "-rmr", "-put", "-copyFromLocal", "-moveFromLocal",
      "-get", "-copyToLocal", "-getmerge", "-cat", "-text",
      "-mkdir", "-touchz", "-test", "-stat", "-tail", "-help")
    verbs.foreach { v =>
      withClue(v) { ShellHelp.help(v) must be(defined) }
    }
    ShellHelp.usage.keySet must be(verbs.toSet)
  }

  it must "return None for an unknown verb and include every verb in helpAll" in {
    ShellHelp.help("-frobnicate") must be(None)
    ShellHelp.usage.keys.foreach { v =>
      ShellHelp.helpAll must include(ShellHelp.usage(v))
    }
  }
}
