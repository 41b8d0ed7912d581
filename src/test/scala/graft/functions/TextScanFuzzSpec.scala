package graft.functions

import java.util.regex.Pattern

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import org.apache.spark.unsafe.types.UTF8String

/** Property pin: [[TextScanner.scan]] equals the regex formulation for EVERY
  * field on RANDOM text — the fixed adversarial list in TextScanSpec covers
  * known traps; this covers the ones nobody thought of. The reference spells
  * `\b` as explicit ASCII-class lookarounds (RE2 semantics — what the DuckDB
  * oracle runs; Java's `\b` is Unicode-aware and differs next to non-ASCII
  * letters).
  */
object TextScanFuzzSpec extends Properties("TextScanner") {

  private def reference(s: String): Seq[Long] = TextScanReference.fields(s)

  // biased toward the scanner's edge tokens: dictionary words, contractions,
  // boundary chars, multi-space runs, unicode letters, astral chars
  private val genFragment: Gen[String] = Gen.oneOf(
    Gen.oneOf("the", "a", "of", "la", "le", "les", "der", "und", "el", "los", "y", "et"),
    Gen.oneOf("'s", "'ll", "'ve", "'re", "'d", "'x", "'"),
    Gen.oneOf(" ", "  ", "\t", "\n", "_", "-", ".", "!", "?", "\"", ""),
    Gen.oneOf("ñ", "é", "ü", "😀", "…", " "),
    Gen.alphaNumStr.map(_.take(6)),
    Gen.asciiPrintableStr.map(_.take(8)))

  private val genText: Gen[String] =
    Gen.listOf(genFragment).map(_.mkString)

  property("scan == regex reference, all 9 fields") = forAll(genText) { s =>
    val row = TextScanner.scan(UTF8String.fromString(s))
    val got = (0 until 9).map(row.getLong)
    val want = reference(s)
    if (got != want) {
      println(s"MISMATCH on '${s.take(120)}': got=$got want=$want")
    }
    got == want
  }
}
