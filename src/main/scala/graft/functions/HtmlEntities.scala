package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** HTML entity decode kernel — the single-scan engine behind
  * `TextAnalysis.stripHtml`'s entity step. One canonical
  * (name, codepoint) table drives THREE synchronized surfaces: this
  * kernel's lookup maps, the per-codepoint regex alternations
  * (`regexRows`) the DuckDB oracle renders into SQL, and the spec
  * fixtures — so an entity added here lands everywhere or nowhere.
  *
  * Semantics contract: `decode` is bit-identical to applying the
  * `regexRows` patterns as SEQUENTIAL global regexp_replace passes in
  * table order (which is what the oracle does). The equivalence holds
  * by construction: every pattern starts at a literal '&' and ends at
  * the first ';' with no interior '&'/';', so matches never overlap;
  * the codepoint sets are disjoint, so at most one row matches any
  * given '&'; and no replacement character is '&', so no pass can
  * SEED a later pass's match — except `&amp;` itself, whose row is
  * last on the regex side and whose single-scan analog is that the
  * scan resumes AFTER the emitted '&' (the "&amp;lt;" double-decode
  * trap surfaces as the literal "&lt;" on both sides).
  *
  * Why a native kernel: the 14-row table as chained regexp_replace
  * columns benched 2.28 s vs the prior 6-replace chain's 0.66 s solo
  * floor (each pass rescans and reallocates the full document);
  * one fused scan does all rows in a single pass and returns the
  * input UTF8String untouched when no entity fires — the graft_nfc
  * preference order (native Expression > chained builtins > UDF)
  * applied to entity decoding.
  */
object HtmlEntities {

  /** Canonical entity rows: (named form, codepoint). `amp` MUST stay
    * last — see the class scaladoc's double-decode note. `nbsp` keys
    * at its TRUE codepoint 160 (so the numeric forms real crawls carry
    * — `&#160;`/`&#xa0;` — decode) while its REPLACEMENT normalizes to
    * plain space via [[repOverride]], the same whitespace-folding
    * judgment the named form always applied; the synthetic `&#32;`
    * forms (which no crawl writes — a space needs no entity) pass
    * through undecoded.
    */
  val table: Seq[(String, Int)] = Seq(
    "lt" -> '<'.toInt,
    "gt" -> '>'.toInt,
    "quot" -> '"'.toInt,
    "apos" -> '\''.toInt,
    "nbsp" -> 0xa0,
    "rsquo" -> 0x2019,
    "lsquo" -> 0x2018,
    "rdquo" -> 0x201d,
    "ldquo" -> 0x201c,
    "ndash" -> 0x2013,
    "mdash" -> 0x2014,
    "hellip" -> 0x2026,
    "copy" -> 0xa9,
    "amp" -> '&'.toInt)

  /** One RE2-safe alternation per table row covering the named form
    * plus the decimal (`&#NNN;`, optional leading zeros) and hex
    * (`&#xHH;`, either `x` case, either hex-letter case) numeric
    * forms: the regex rendering of the kernel's semantics, consumed by
    * the DuckDB oracle builder.
    */
  /** Per-codepoint replacement overrides (normalizations): NBSP folds
    * to plain space on decode. Every other row replaces with its own
    * codepoint.
    */
  private val repOverride: Map[Int, String] = Map(0xa0 -> " ")

  private def repFor(cp: Int): String =
    repOverride.getOrElse(cp, new String(Character.toChars(cp)))

  val regexRows: Seq[(String, String)] = table.map { case (name, cp) =>
    val hexAlt = cp.toHexString.map { c =>
      if (c.isLetter) s"[$c${c.toUpper}]" else c.toString
    }.mkString
    (s"&$name;|&#0*$cp;|&#[xX]0*$hexAlt;", repFor(cp))
  }

  private val reps: Array[String] =
    table.map { case (_, cp) => repFor(cp) }.toArray
  private val byName: java.util.HashMap[String, String] = {
    val m = new java.util.HashMap[String, String]()
    table.zipWithIndex.foreach { case ((n, _), i) => m.put(n, reps(i)) }
    m
  }
  private val byDec: java.util.HashMap[String, String] = {
    val m = new java.util.HashMap[String, String]()
    table.zipWithIndex.foreach { case ((_, cp), i) => m.put(cp.toString, reps(i)) }
    m
  }
  private val byHex: java.util.HashMap[String, String] = {
    val m = new java.util.HashMap[String, String]()
    table.zipWithIndex.foreach { case ((_, cp), i) =>
      m.put(cp.toHexString, reps(i)) // lowercase; probe lowercases
    }
    m
  }

  /** Replacement for the entity starting at `amp` (s(amp) == '&'), or
    * null when nothing in the table matches there. `end(0)` receives
    * the exclusive end of the consumed entity on a hit.
    */
  private def matchAt(s: String, amp: Int, end: Array[Int]): String = {
    val n = s.length
    var j = amp + 1
    if (j >= n) return null
    if (s.charAt(j) == '#') {
      j += 1
      var hex = false
      if (j < n && (s.charAt(j) == 'x' || s.charAt(j) == 'X')) {
        hex = true; j += 1
      }
      while (j < n && s.charAt(j) == '0') j += 1 // 0* — leading zeros
      val start = j
      if (hex) {
        while (j < n && {
          val c = s.charAt(j)
          (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') ||
            (c >= 'A' && c <= 'F')
        }) j += 1
      } else {
        while (j < n && { val c = s.charAt(j); c >= '0' && c <= '9' }) j += 1
      }
      if (j >= n || s.charAt(j) != ';' || j == start) return null
      val key = s.substring(start, j)
      val rep =
        if (hex) byHex.get(key.toLowerCase(java.util.Locale.ROOT))
        else byDec.get(key)
      if (rep == null) return null
      end(0) = j + 1
      rep
    } else {
      val start = j
      while (j < n && { val c = s.charAt(j); c >= 'a' && c <= 'z' }) j += 1
      if (j >= n || s.charAt(j) != ';' || j == start) return null
      val rep = byName.get(s.substring(start, j))
      if (rep == null) return null
      end(0) = j + 1
      rep
    }
  }

  /** The fused decode: one left-to-right scan; entity-free input
    * (most of any corpus after tag stripping) returns the INPUT
    * UTF8String untouched — no copy, no String allocation beyond the
    * probe.
    */
  def decode(u: UTF8String): UTF8String = {
    val s = u.toString
    var amp = s.indexOf('&')
    if (amp < 0) return u
    val end = new Array[Int](1)
    var sb: java.lang.StringBuilder = null
    var from = 0
    while (amp >= 0) {
      val rep = matchAt(s, amp, end)
      if (rep != null) {
        if (sb == null) sb = new java.lang.StringBuilder(s.length)
        sb.append(s, from, amp).append(rep)
        from = end(0)
        amp = s.indexOf('&', from)
      } else {
        amp = s.indexOf('&', amp + 1)
      }
    }
    if (sb == null) u
    else UTF8String.fromString(sb.append(s, from, s.length).toString)
  }
}

/** Native `graft_entity_decode(string)` — the [[HtmlEntities]] kernel
  * as a codegen'd expression (see that object's scaladoc for the
  * table/oracle equivalence contract).
  */
case class HtmlEntityDecode(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a STRING argument, got ${other.sql}")
    }
  override def dataType: DataType = child.dataType
  override def prettyName: String = "graft_entity_decode"

  override def nullSafeEval(s: Any): Any =
    HtmlEntities.decode(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HtmlEntities.decode($c)")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}
