package graft.cdc

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Fuzz the fused per-record path (OP-3 error isolation as a LAW): for ANY
  * input line — random garbage, truncated JSON, JSON of the wrong shape,
  * near-miss stream records — `processLine` must return (not throw), because
  * at 100 TB a single poison record that throws kills a task and, after
  * retries, the job.
  */
object ProcessLineFuzzSpec extends Properties("RecordProcessor.processLine") {

  private val cfg = CdcConfig(eventSource = "fuzz", blobDir = "/tmp/fuzz-blobs")
  private val rules = PkFilter.compile(Seq("USER#*"))

  private val genGarbage: Gen[String] = Gen.oneOf(
    Gen.asciiPrintableStr,
    Gen.listOf(Gen.chooseNum(0, 255)).map(_.map(_.toChar).mkString),
    Gen.const(""),
    Gen.const("{"),
    Gen.const("""{"eventID":"""),
    Gen.const("null"),
    Gen.const("[1,2,3]"))

  private val genNearMiss: Gen[String] = for {
    id <- Gen.alphaNumStr.map(_.take(6))
    op <- Gen.oneOf("INSERT", "MODIFY", "REMOVE", "", "BOGUS")
    size <- Gen.oneOf("1", "0", "-5", "99999999999999999999", "\"big\"", "null")
    keys <- Gen.oneOf(
      """{"pk":{"S":"USER#1"}}""",
      """{"pk":{"N":"7"}}""",
      """{"pk":"unwrapped"}""",
      """{"pk":{"X":"badtag"}}""",
      "null", "[]")
    img <- Gen.oneOf(
      """{"a":{"N":"1"}}""",
      """{"a":{"N":"not-a-number"}}""",
      """{"a":{"L":[{"S":"x"},{"BAD":1}]}}""",
      "{}", "null")
  } yield s"""{"eventID":"$id","eventName":"$op","dynamodb":{"SizeBytes":$size,"Keys":$keys,"NewImage":$img}}"""

  property("never throws on garbage") = forAll(genGarbage) { line =>
    RecordProcessor.processLine(line, cfg, rules)
    true
  }

  property("never throws on near-miss records") = forAll(genNearMiss) { line =>
    RecordProcessor.processLine(line, cfg, rules)
    true
  }

  property("valid record parses regardless of surrounding fuzz runs") =
    forAll(Gen.chooseNum(1, 1000)) { n =>
      val line =
        s"""{"eventID":"e-$n","eventName":"INSERT","dynamodb":{"SizeBytes":50,""" +
          s""""Keys":{"pk":{"S":"USER#$n"}},"NewImage":{"pk":{"S":"USER#$n"},"v":{"N":"$n"}}}}"""
      RecordProcessor.processLine(line, cfg, rules).exists(_.event.operation == "INSERT")
    }
}
