package graft.streaming

import java.nio.file.{Files, Paths}

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.must.Matchers

import graft.TestSpark

/** The once-per-source drain memos are keyed on the staged landing's
  * content FINGERPRINT, not just (applicationId, sfDir): before this,
  * the first drain was served forever and the CRC re-staging check was
  * never consulted again — a source dir rewritten in place after the
  * first drain was silently served stale (r11 ADVICE).
  */
class StagingTokenSpec extends AnyFlatSpec with Matchers {
  private lazy val spark = TestSpark.spark

  behavior of "staging fingerprint tokens"

  it must "change the token when a staged source is rewritten in place" in {
    val dir = Files.createTempDirectory("graft-token-spec")
    try {
      val f = dir.resolve("data.parquet")
      Files.write(f, Array.fill[Byte](64)(1))
      val (landing1, t1) = EventsStream.stageLandingWithToken(dir.toString)
      val (landing2, t2) = EventsStream.stageLandingWithToken(dir.toString)
      // unchanged source: same landing, same token
      landing2 must be(landing1)
      t2 must be(t1)
      // SAME-SIZE in-place rewrite — the hole mtime fingerprints leave
      Files.write(f, Array.fill[Byte](64)(2))
      val (landing3, t3) = EventsStream.stageLandingWithToken(dir.toString)
      t3 must not be t1
      // the staged copy now carries the new bytes
      Files.readAllBytes(Paths.get(landing3).resolve("data.parquet")) must be(
        Array.fill[Byte](64)(2))
    } finally {
      graft.PlanHygiene.deleteRecursively(dir)
    }
  }

  it must "re-drain a memoized stateless channel after a source rewrite" in {
    val s = spark
    import s.implicits._
    val sfDir = Files.createTempDirectory("graft-memo-sf").toString
    try {
      def writeDocs(texts: Seq[(Long, String)]): Unit =
        texts.map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
          .toDF("doc_id", "text", "lang", "source", "n_chars")
          .coalesce(1)
          .write.mode("overwrite").parquet(s"$sfDir/documents.parquet")

      val passing = "the quick brown fox jumps over the lazy dog every day"
      writeDocs(Seq(1L -> passing, 2L -> "x"))
      val first = EventsStream.qualityFilterAvailableNow(spark, sfDir)
        .select("doc_id").as[Long].collect().toSet
      first must be(Set(1L))

      // rewrite the corpus in place: the memo must re-drain, not serve
      // the first drain's materialization
      writeDocs(Seq(3L -> passing, 4L -> passing, 5L -> "y"))
      val second = EventsStream.qualityFilterAvailableNow(spark, sfDir)
        .select("doc_id").as[Long].collect().toSet
      second must be(Set(3L, 4L))
    } finally {
      graft.PlanHygiene.deleteRecursively(Paths.get(sfDir))
    }
  }
}
