package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.must.Matchers

import graft.TestSpark

/** All non-ASCII fixture content is built from explicit \\u escapes so
  * the decomposed-vs-composed distinction is in the SOURCE, not in the
  * file's encoding provenance.
  */
class UnicodeNormalizeSpec extends AnyFlatSpec with Matchers {
  private lazy val spark = TestSpark.spark

  private val eAcuteDec = "é" // e + COMBINING ACUTE
  private val eAcute = "é"     // é precomposed

  behavior of "graft_nfc (native codegen'd NFC normalization)"

  it must "compose decomposed sequences and match java.text.Normalizer on both eval paths" in {
    GraftFunctions.register(spark)
    val s = spark
    import s.implicits._
    val cases = Seq(
      "plain ascii stays",
      s"caf$eAcuteDec",              // decomposed → composed
      s"caf$eAcute",                 // already composed: unchanged
      "Å",                     // A + COMBINING RING → Å (U+00C5)
      "가",                // Hangul jamo → composed syllable
      s"mixed caf$eAcuteDec and caf$eAcute",
      "")
    val expected = cases.map(c =>
      java.text.Normalizer.normalize(c, java.text.Normalizer.Form.NFC))
    expected(1) must be(s"caf$eAcute") // the fixture genuinely composes
    expected(3) must be("Å")
    expected(4) must be("가")
    // codegen path (projection over a real frame)
    val viaCodegen = cases.toDF("t")
      .select(expr("graft_nfc(t)")).collect().map(_.getString(0))
    viaCodegen.toSeq must be(expected)
    // interpreted path (constant folding runs eval(), not doGenCode)
    spark.sql(s"SELECT graft_nfc('caf$eAcuteDec')")
      .collect()(0).getString(0) must be(s"caf$eAcute")
    // equality across provenance after normalization — the property
    // content-addressed dedup needs
    Seq((s"caf$eAcuteDec", s"caf$eAcute")).toDF("a", "b")
      .select((expr("graft_nfc(a)") === expr("graft_nfc(b)")).as("eq"),
        (col("a") === col("b")).as("raw_eq"))
      .collect()(0) match {
      case r =>
        r.getBoolean(0) must be(true)  // same text after NFC
        r.getBoolean(1) must be(false) // byte-different before
    }
  }

  it must "pass nulls through and reject non-string input" in {
    GraftFunctions.register(spark)
    spark.sql("SELECT graft_nfc(CAST(NULL AS STRING))")
      .collect()(0).isNullAt(0) must be(true)
    val e = intercept[Exception](
      spark.sql("SELECT graft_nfc(array(1))").collect())
    e.getMessage.toLowerCase must include("string")
  }

  it must "resolve through the declarative extensions path" in {
    // newSession() = fresh registry, same spark.sql.extensions — the
    // r6 divergence class (registered imperatively but dropped from
    // GraftSessionExtensions) goes red here
    val fresh = spark.newSession()
    fresh.sql(s"SELECT graft_nfc('$eAcuteDec') AS n")
      .collect()(0).getString(0) must be(eAcute)
  }

  behavior of "TextAnalysis.normalizeText"

  it must "compose, strip controls, squash whitespace, trim, and count" in {
    val s = spark
    import s.implicits._
    val raw1 = s"  hello \t\t world!$eAcuteDec  "
    val docs = Seq((1L, raw1), (2L, "clean")).toDF("doc_id", "text")
    val rows = graft.ops.TextAnalysis.normalizeText(docs)
      .orderBy("doc_id").collect()
    rows(0).getString(1) must be(s"hello world!$eAcute")
    rows(0).getInt(2) must be(raw1.length) // raw counts the raw chars
    rows(0).getInt(3) must be(s"hello world!$eAcute".length)
    rows(1).getString(1) must be("clean")
    rows(1).getInt(2) must be(5)
    rows(1).getInt(3) must be(5)
  }
}
