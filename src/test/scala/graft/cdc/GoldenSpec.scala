package graft.cdc

import graft.SparkSuite

/** The FIXTURES.md §A1 golden variant catalog, driven through the batch
  * pipeline record-by-record — one test per wire-format variant, asserting
  * the exact emitted event (or its absence). Strict-compat mode is used
  * where set semantics differ (Q3).
  */
class GoldenSpec extends SparkSuite {

  private val cfg = CdcConfig(eventSource = "golden", blobDir = "blobs")
  private def one(line: String, c: CdcConfig = cfg): Option[RecordProcessor.Processed] =
    RecordProcessor.parseRecord(line).flatMap(r => RecordProcessor.processSafe(r, c))

  test("INSERT without OldImage") {
    val p = one(
      """{"eventID":"g1","eventName":"INSERT","dynamodb":{"SizeBytes":60,"Keys":{"pk":{"S":"P"},"sk":{"S":"S"}},"NewImage":{"pk":{"S":"P"},"sk":{"S":"S"},"a":{"N":"1"}}}}""").get
    assert(p.event.operation == "INSERT")
    assert(p.event.attributesChanged == Seq("pk", "sk", "a"))
    assert(p.event.before == "{}" && p.event.after == """{"pk":"P","sk":"S","a":1}""")
  }

  test("REMOVE without NewImage carries oldImage inline when small") {
    val p = one(
      """{"eventID":"g2","eventName":"REMOVE","dynamodb":{"SizeBytes":60,"Keys":{"pk":{"S":"P"}},"OldImage":{"pk":{"S":"P"},"a":{"N":"1"}}}}""").get
    assert(p.event.operation == "REMOVE")
    assert(p.event.oldImage.contains("""{"pk":"P","a":1}""") && p.event.newImage.isEmpty)
  }

  test("no-op MODIFY with identical images is suppressed") {
    val img = """{"pk":{"S":"P"},"m":{"M":{"t":{"L":[{"S":"a"}]}}}}"""
    assert(one(
      s"""{"eventID":"g3","eventName":"MODIFY","dynamodb":{"SizeBytes":60,"Keys":{"pk":{"S":"P"}},"OldImage":$img,"NewImage":$img}}""").isEmpty)
  }

  test("nested map change emits parent and child paths") {
    val p = one(
      """{"eventID":"g4","eventName":"MODIFY","dynamodb":{"SizeBytes":60,"Keys":{"pk":{"S":"P"}},
        |"OldImage":{"pk":{"S":"P"},"meta":{"M":{"visits":{"N":"3"}}}},
        |"NewImage":{"pk":{"S":"P"},"meta":{"M":{"visits":{"N":"4"}}}}}}""".stripMargin.replace("\n", "")).get
    assert(p.event.attributesChanged == Seq("meta", "meta.visits"))
    assert(p.event.before == """{"meta":{"visits":3}}""")
  }

  test("array reorder is a whole-array change with a single path") {
    val p = one(
      """{"eventID":"g5","eventName":"MODIFY","dynamodb":{"SizeBytes":60,"Keys":{"pk":{"S":"P"}},
        |"OldImage":{"pk":{"S":"P"},"l":{"L":[{"N":"1"},{"N":"2"}]}},
        |"NewImage":{"pk":{"S":"P"},"l":{"L":[{"N":"2"},{"N":"1"}]}}}}""".stripMargin.replace("\n", "")).get
    assert(p.event.attributesChanged == Seq("l"))
    assert(p.event.after == """{"l":[2,1]}""")
  }

  test("null vs {} MODIFY is invisible and fully suppressed (Q1)") {
    assert(one(
      """{"eventID":"g6","eventName":"MODIFY","dynamodb":{"SizeBytes":60,"Keys":{"pk":{"S":"P"}},
        |"OldImage":{"pk":{"S":"P"},"x":{"NULL":true}},
        |"NewImage":{"pk":{"S":"P"},"x":{"M":{}}}}}""".stripMargin.replace("\n", "")).isEmpty)
  }

  test("set membership change: invisible strict (Q3), visible engine mode") {
    val line =
      """{"eventID":"g7","eventName":"MODIFY","dynamodb":{"SizeBytes":60,"Keys":{"pk":{"S":"P"}},
        |"OldImage":{"pk":{"S":"P"},"roles":{"SS":["admin","user"]}},
        |"NewImage":{"pk":{"S":"P"},"roles":{"SS":["admin"]}}}}""".stripMargin.replace("\n", "")
    assert(one(line, cfg.copy(strictCompat = true)).isEmpty)
    val engine = one(line).get
    assert(engine.event.attributesChanged == Seq("roles"))
    assert(engine.event.after == """{"roles":["admin"]}""")
  }

  test("binary change produces byte-index paths (Q4)") {
    val p = one(
      """{"eventID":"g8","eventName":"MODIFY","dynamodb":{"SizeBytes":60,"Keys":{"pk":{"S":"P"}},
        |"OldImage":{"pk":{"S":"P"},"b":{"B":"AQID"}},
        |"NewImage":{"pk":{"S":"P"},"b":{"B":"AQX/"}}}}""".stripMargin.replace("\n", ""),
      cfg.copy(strictCompat = true)).get
    assert(p.event.attributesChanged == Seq("b", "b.1", "b.2"))
  }

  test("SizeBytes >= 65536 and missing SizeBytes both route to blob (Q5)") {
    val body = """"Keys":{"pk":{"S":"P"}},"NewImage":{"pk":{"S":"P"}}"""
    val big = one(s"""{"eventID":"g9","eventName":"INSERT","dynamodb":{"SizeBytes":65536,$body}}""").get
    val noSize = one(s"""{"eventID":"g10","eventName":"INSERT","dynamodb":{$body}}""").get
    assert(big.event.imagesUrl.contains("blobs/g9.json") && big.blob.nonEmpty)
    assert(noSize.event.imagesUrl.contains("blobs/g10.json"))
    val small = one(s"""{"eventID":"g11","eventName":"INSERT","dynamodb":{"SizeBytes":65535,$body}}""").get
    assert(small.event.imagesUrl.isEmpty)
  }

  test("records missing eventName/eventID/dynamodb are dropped") {
    assert(one("""{"eventID":"g12","dynamodb":{"SizeBytes":1}}""").isEmpty)
    assert(one("""{"eventName":"INSERT","dynamodb":{"SizeBytes":1}}""").isEmpty)
    assert(one("""{"eventID":"g13","eventName":"INSERT"}""").isEmpty)
  }
}
