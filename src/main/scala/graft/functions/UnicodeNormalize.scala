package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The NFC kernel, static so generated code calls it directly. The
  * quick-check fast path matters at corpus scale: ASCII and
  * already-composed text (the overwhelming majority of any crawl)
  * answers `isNormalized` without allocating, so the common row pays
  * one scan of its bytes and returns the INPUT UTF8String untouched —
  * no String round-trip, no copy.
  */
object UnicodeNorm {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** Native `graft_nfc(string)` — Unicode NFC normalization as a
  * codegen'd expression. The curation-stack primitive every text
  * pipeline needs BEFORE hashing/dedup/tokenization: "é" as U+00E9 and
  * as e+U+0301 are byte-different (different sha256, different
  * shingles, different BPE merges) but the same text; normalizing to
  * the composed form makes content-addressed ops see through encoding
  * provenance. Spark ships no normalizer built-in, and a Scala UDF
  * here would put serialization + boxing on a per-row corpus-scale
  * path — this is the graft_cosine preference order applied to
  * strings: one static call inside WholeStageCodegen.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a STRING argument, got ${other.sql}")
    }
  override def dataType: DataType = child.dataType
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(s: Any): Any =
    UnicodeNorm.nfc(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeNorm.nfc($c)")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}
