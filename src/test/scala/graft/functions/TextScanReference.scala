package graft.functions

import java.util.regex.Pattern

/** The shared oracle-regex reference for [[TextScanner]] parity specs: the
  * EXACT semantics the DuckDB oracle runs, one definition used by both the
  * example-based spec and the scalacheck property. `\b` is spelled as
  * explicit ASCII-class lookarounds (RE2 semantics — what DuckDB executes;
  * Java Pattern's `\b` is Unicode-aware and differs next to non-ASCII
  * letters).
  */
object TextScanReference {

  def reCountJ(s: String, p: String): Long =
    Pattern.compile(p).matcher(s).results().count()

  def asciiWord(words: String): String =
    s"(?<![A-Za-z0-9_])(?:$words)(?![A-Za-z0-9_])"

  /** All 9 TextScan fields, in schema order, from the regex formulation —
    * the ASCII-class patterns come from the TextScan companion (one source
    * of truth with the optimizer rule).
    */
  def fields(s: String): Seq[Long] = {
    val m = Pattern.compile(TextScan.TokensPattern).matcher(s)
    var nTokens = 0L
    var nWordChars = 0L
    while (m.find()) { nTokens += 1; nWordChars += m.end() - m.start() }
    Seq(
      nTokens,
      nWordChars,
      reCountJ(s, TextScan.BpePattern),
      reCountJ(s, asciiWord("the|a")),
      reCountJ(s, TextScan.PunctPattern),
      reCountJ(s, asciiWord("the|a|of")),
      reCountJ(s, asciiWord("der|die|das|und")),
      reCountJ(s, asciiWord("el|la|los|y")),
      reCountJ(s, asciiWord("le|la|les|et")))
  }
}
