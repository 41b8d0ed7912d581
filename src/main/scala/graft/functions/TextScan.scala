package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass text statistics — the fused replacement for the 4-6 independent
  * `regexp_extract_all` scans the text-analysis queries ran per document
  * (each regex pass walks the full document AND materializes an array of
  * match strings; ~10s of the sf0.1 bench went to re-scanning the same
  * bytes).
  *
  * Semantics are pinned to the exact regexes the DuckDB oracle still runs —
  * TextScanSpec asserts equality against the regex formulation per field:
  *  - `n_tokens` / `n_word_chars`: count / total length of `[A-Za-z0-9]+` runs
  *  - `n_bpe_tokens`: the GPT-2-flavored pattern
  *    `'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+` with
  *    leftmost-first alternation (Java and RE2 agree)
  *  - `n_stop`: `\bthe\b|\ba\b` with RE2's `\b` (the ORACLE's engine):
  *    word chars are ASCII `[A-Za-z0-9_]`, so `a_b` has no boundary after
  *    `a`, and `ñthe` DOES have one before `t` (ñ is not ASCII `\w`). Java
  *    Pattern's Unicode-aware `\b` differs there — the scanner follows RE2,
  *    i.e. what DuckDB checks; run equality over ASCII `\w` runs.
  *  - `n_punct`: `[^A-Za-z0-9\s]` count per CODE POINT
  *    (`\s` = ASCII space/tab/NL/VT/FF/CR)
  *  - `s_en|s_de|s_es|s_fr`: `\b(marker|...)\b` language-marker counts
  */
case class TextScan(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TextScan.schema

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"text_scan expects a string input, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    TextScanner.scan(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // one static call per row keeps the projection inside whole-stage codegen;
    // the scan itself is a tight char loop with zero allocation beyond the row
    defineCodeGen(ctx, ev, c => s"graft.functions.TextScanner.scan($c)")

  override protected def withNewChildInternal(newChild: Expression): TextScan =
    copy(child = newChild)
}

object TextScan {
  /** The regex formulations the scanner's count fields are pinned to — the
    * SINGLE source of truth shared by the parity specs and by
    * [[graft.plans.FuseTextScanRule]] (which may only rewrite patterns
    * where Java regex and the scanner provably agree: these three are pure
    * ASCII classes with no `\b`).
    */
  val TokensPattern = "[A-Za-z0-9]+"
  val BpePattern = "'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+"
  val PunctPattern = "[^A-Za-z0-9\\s]"

  val schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_word_chars", LongType, nullable = false),
    StructField("n_bpe_tokens", LongType, nullable = false),
    StructField("n_stop", LongType, nullable = false),
    StructField("n_punct", LongType, nullable = false),
    StructField("s_en", LongType, nullable = false),
    StructField("s_de", LongType, nullable = false),
    StructField("s_es", LongType, nullable = false),
    StructField("s_fr", LongType, nullable = false)))
}

object TextScanner {

  @inline private def isAlnum(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')

  @inline private def isAsciiSpace(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Called from generated code — must stay a static-forwardable method. */
  def scan(u: UTF8String): InternalRow = {
    val s = u.toString
    val n = s.length
    var nTokens = 0L
    var nWordChars = 0L
    var nStop = 0L
    var nPunct = 0L
    var sEn = 0L; var sDe = 0L; var sEs = 0L; var sFr = 0L

    // ---- pass 1: token runs, \w word runs (for \b dictionaries), punct ----
    var i = 0
    var alnumStart = -1 // [A-Za-z0-9]+ run
    var wordStart = -1  // [A-Za-z0-9_]+ run (\b boundary semantics)
    while (i <= n) {
      val c = if (i < n) s.charAt(i) else '\u0000'
      val alnum = i < n && isAlnum(c)
      val word = alnum || (i < n && c == '_')
      if (alnum) { if (alnumStart < 0) alnumStart = i }
      else if (alnumStart >= 0) {
        nTokens += 1; nWordChars += i - alnumStart; alnumStart = -1
      }
      if (word) { if (wordStart < 0) wordStart = i }
      else if (wordStart >= 0) {
        val len = i - wordStart
        if (len <= 3) {
          val c0 = s.charAt(wordStart)
          if (len == 1) {
            if (c0 == 'a') { nStop += 1; sEn += 1 }
            else if (c0 == 'y') sEs += 1
          } else if (len == 2) {
            val c1 = s.charAt(wordStart + 1)
            if (c0 == 'o' && c1 == 'f') sEn += 1
            else if (c0 == 'e' && c1 == 'l') sEs += 1
            else if (c0 == 'l' && c1 == 'a') { sEs += 1; sFr += 1 }
            else if (c0 == 'l' && c1 == 'e') sFr += 1
            else if (c0 == 'e' && c1 == 't') sFr += 1
          } else {
            val c1 = s.charAt(wordStart + 1)
            val c2 = s.charAt(wordStart + 2)
            if (c0 == 't' && c1 == 'h' && c2 == 'e') { nStop += 1; sEn += 1 }
            else if (c0 == 'd' && c1 == 'e' && c2 == 'r') sDe += 1
            else if (c0 == 'd' && c1 == 'i' && c2 == 'e') sDe += 1
            else if (c0 == 'd' && c1 == 'a' && c2 == 's') sDe += 1
            else if (c0 == 'u' && c1 == 'n' && c2 == 'd') sDe += 1
            else if (c0 == 'l' && c1 == 'o' && c2 == 's') sEs += 1
            else if (c0 == 'l' && c1 == 'e' && c2 == 's') sFr += 1
          }
        }
        wordStart = -1
      }
      // count CODE POINTS, not chars: `[^A-Za-z0-9\s]` matches one code
      // point per hit in a regex engine, so the low half of a surrogate
      // pair must not count a second time for astral characters
      if (i < n && !alnum && !isAsciiSpace(c) &&
        !(Character.isLowSurrogate(c) && i > 0 && Character.isHighSurrogate(s.charAt(i - 1)))) {
        nPunct += 1
      }
      i += 1
    }

    // ---- pass 2: BPE-ish tokenization automaton (leftmost-first) ----
    var nBpe = 0L
    var j = 0
    while (j < n) {
      val c = s.charAt(j)
      var matched = false
      if (c == '\'') {
        // '(?:[sdmt]|ll|ve|re) — single-char alternatives first
        if (j + 1 < n) {
          val d = s.charAt(j + 1)
          if (d == 's' || d == 'd' || d == 'm' || d == 't') {
            nBpe += 1; j += 2; matched = true
          } else if (j + 2 < n) {
            val e = s.charAt(j + 2)
            if ((d == 'l' && e == 'l') || (d == 'v' && e == 'e') || (d == 'r' && e == 'e')) {
              nBpe += 1; j += 3; matched = true
            }
          }
        }
      }
      if (!matched) {
        // ` ?X+` alternatives: one optional literal space, then a run
        val k = if (c == ' ' && j + 1 < n) j + 1 else j
        val cc = if (k < n) s.charAt(k) else '\u0000'
        def isLetter(ch: Char) = (ch >= 'a' && ch <= 'z') || (ch >= 'A' && ch <= 'Z')
        def isDigit(ch: Char) = ch >= '0' && ch <= '9'
        if (k < n && isLetter(cc)) {
          var e = k + 1
          while (e < n && isLetter(s.charAt(e))) e += 1
          nBpe += 1; j = e
        } else if (k < n && isDigit(cc)) {
          var e = k + 1
          while (e < n && isDigit(s.charAt(e))) e += 1
          nBpe += 1; j = e
        } else if (k < n && !isAlnum(cc) && !isAsciiSpace(cc)) {
          var e = k + 1
          while (e < n && !isAlnum(s.charAt(e)) && !isAsciiSpace(s.charAt(e))) e += 1
          nBpe += 1; j = e
        } else {
          j += 1 // no alternative matches here; the regex engine advances one
        }
      }
    }

    new GenericInternalRow(Array[Any](
      nTokens, nWordChars, nBpe, nStop, nPunct, sEn, sDe, sEs, sFr))
  }
}

object TextFunctions {
  /** All text-stats counters in one codegen'd pass (struct column). */
  def text_scan(c: Column): Column = Bridge.column(TextScan(Bridge.expression(c)))
}
