package graft.sources

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property pin for the streaming offset encoding: Spark's OffsetSeqLog is
  * LINE-oriented (one line per source), so the offset JSON must stay a
  * single line and roundtrip exactly for ANY file path a filesystem can
  * produce — including names with newlines, tabs, quotes, backslashes, and
  * unicode. A raw newline here silently splits one source into two phantom
  * sources on restart.
  */
object CdcOffsetFuzzSpec extends Properties("CdcOffset") {

  private val genPath: Gen[String] = for {
    base <- Gen.nonEmptyListOf(Gen.oneOf(
      Gen.alphaNumChar.map(_.toString),
      Gen.oneOf("/", " ", "\n", "\r", "\t", "\"", "\\", "#", "\u0000", "\u00f1", "\ud83d\ude00")))
  } yield "/" + base.mkString

  private val genFiles: Gen[Map[String, Long]] =
    Gen.mapOf(Gen.zip(genPath, Gen.chooseNum(0L, Long.MaxValue)))

  property("json is single-line and roundtrips") = forAll(genFiles) { files =>
    val o = CdcOffset(files)
    val j = o.json()
    !j.contains('\n') && !j.contains('\r') && CdcOffset.fromJson(j) == o
  }
}
