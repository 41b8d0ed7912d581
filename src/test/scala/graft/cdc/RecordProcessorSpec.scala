package graft.cdc

import org.scalatest.funsuite.AnyFunSuite

/** Pins OP-3..OP-13 per-record semantics (SURVEY.md §2, Appendix A Q5-Q7). */
class RecordProcessorSpec extends AnyFunSuite {
  private val cfg = CdcConfig(eventSource = "graft-test", blobDir = "/tmp/graft-blobs")

  private def rec(
      op: String = "MODIFY",
      id: String = "e-1",
      size: Option[Long] = Some(100L),
      keys: Option[String] = Some("""{"pk":{"S":"USER#1"},"sk":{"S":"A"}}"""),
      newImage: Option[String] = None,
      oldImage: Option[String] = None) =
    CdcRecord(Some(id), Some(op), Some(CdcStreamPart(size, keys, newImage, oldImage)))

  test("validity guards drop records missing eventName/eventID/dynamodb (OP-4)") {
    assert(RecordProcessor.process(CdcRecord(None, Some("INSERT"), rec().dynamodb), cfg).isEmpty)
    assert(RecordProcessor.process(CdcRecord(Some("e"), None, rec().dynamodb), cfg).isEmpty)
    assert(RecordProcessor.process(CdcRecord(Some("e"), Some("INSERT"), None), cfg).isEmpty)
  }

  test("no-op MODIFY suppressed, INSERT/REMOVE never suppressed (OP-8, Q7)") {
    val img = """{"pk":{"S":"USER#1"},"a":{"N":"1"}}"""
    assert(RecordProcessor.process(rec(newImage = Some(img), oldImage = Some(img)), cfg).isEmpty)
    val ins = RecordProcessor.process(rec(op = "INSERT", newImage = Some(img)), cfg)
    assert(ins.nonEmpty && ins.get.event.operation == "INSERT")
    val rem = RecordProcessor.process(rec(op = "REMOVE", oldImage = Some(img)), cfg)
    assert(rem.nonEmpty)
  }

  test("small record: inline newImage always, oldImage only for REMOVE (Q6)") {
    val n = """{"pk":{"S":"U"},"a":{"N":"2"}}"""
    val o = """{"pk":{"S":"U"},"a":{"N":"1"}}"""
    val mod = RecordProcessor.process(rec(newImage = Some(n), oldImage = Some(o)), cfg).get
    assert(mod.event.newImage.contains("""{"pk":"U","a":2}"""))
    assert(mod.event.oldImage.isEmpty && mod.event.imagesUrl.isEmpty && mod.blob.isEmpty)
    val rem = RecordProcessor.process(rec(op = "REMOVE", oldImage = Some(o)), cfg).get
    assert(rem.event.oldImage.contains("""{"pk":"U","a":1}"""))
    assert(rem.event.newImage.isEmpty)
  }

  test("large record routes to blob with imagesUrl; body omits absent images") {
    val n = """{"pk":{"S":"U"},"a":{"N":"2"}}"""
    val big = RecordProcessor.process(
      rec(op = "INSERT", size = Some(100000L), newImage = Some(n)), cfg).get
    assert(big.event.imagesUrl.contains("/tmp/graft-blobs/e-1.json"))
    assert(big.event.newImage.isEmpty)
    assert(big.blob.map(_.body).contains("""{"newImage":{"pk":"U","a":2}}"""))
  }

  test("Q5: missing or zero SizeBytes routes to blob, not inline") {
    val n = """{"pk":{"S":"U"}}"""
    val noSize = RecordProcessor.process(rec(op = "INSERT", size = None, newImage = Some(n)), cfg).get
    assert(noSize.event.imagesUrl.nonEmpty && noSize.blob.nonEmpty)
    val zero = RecordProcessor.process(rec(op = "INSERT", size = Some(0L), newImage = Some(n)), cfg).get
    assert(zero.event.imagesUrl.nonEmpty)
  }

  test("malformed image JSON is dropped, not thrown (OP-3 error isolation)") {
    assert(RecordProcessor.processSafe(rec(newImage = Some("{not json"), oldImage = None), cfg).isEmpty)
  }

  test("bus event: detail JSON field order and optional omission (OP-13)") {
    val n = """{"pk":{"S":"U"},"sk":{"S":"A"},"a":{"N":"2"}}"""
    val o = """{"pk":{"S":"U"},"sk":{"S":"A"},"a":{"N":"1"}}"""
    val p = RecordProcessor.process(rec(newImage = Some(n), oldImage = Some(o)), cfg).get
    val bus = RecordProcessor.toBusEvent(p.event, cfg)
    assert(bus.source == "graft-test" && bus.detailType == "dynamo.item.changed")
    assert(bus.detail ==
      """{"after":{"a":2},"attributesChanged":["a"],"before":{"a":1},""" +
      """"operation":"MODIFY","pk":"USER#1","sk":"A","newImage":{"pk":"U","sk":"A","a":2}}""")
  }

  test("bus event: number-typed pk serializes raw, not as a JSON string") {
    val k = """{"pk":{"N":"5"},"sk":{"S":"A"}}"""
    val n = """{"pk":{"N":"5"},"sk":{"S":"A"},"a":{"N":"2"}}"""
    val p = RecordProcessor.process(
      rec(op = "INSERT", keys = Some(k), newImage = Some(n)), cfg).get
    val bus = RecordProcessor.toBusEvent(p.event, cfg)
    assert(bus.detail.contains(""""pk":5,"sk":"A""""), bus.detail)
  }

  test("pk filter compiler: eq / prefix / multi-star rejection (OP-2)") {
    assert(PkFilter.compileOne("USER#1") == PkFilter.Eq("USER#1"))
    assert(PkFilter.compileOne("USER#*") == PkFilter.Prefix("USER#"))
    assert(PkFilter.compileOne("a*b") == PkFilter.Prefix("a")) // suffix discarded, dynamo.ts:166
    intercept[PkFilter.InvalidPkFilterException](PkFilter.compileOne("a*b*c"))
    assert(PkFilter.matches("USER#42", PkFilter.compile(Seq("ORG#1", "USER#*"))))
    assert(!PkFilter.matches("ITEM#1", PkFilter.compile(Seq("ORG#1", "USER#*"))))
    assert(PkFilter.matches("anything", Nil))
  }

  test("expiring claim-check URLs (OP-12): issue with TTL, refuse after expiry") {
    val t0 = 1700000000000L
    val dayMs = 24L * 3600 * 1000
    val cfg = CdcConfig(blobDir = "blobs", urlTtl = Some(UrlTtl(issuedAtMs = t0)))
    val url = cfg.imagesUrl("e-1")
    assert(url == s"blobs/e-1.json#expires=${t0 + dayMs}")
    // within the window: resolves to the blob path (presigned GET succeeds)
    assert(CdcConfig.resolveImagesUrl(url, t0 + dayMs - 1) == Some("blobs/e-1.json"))
    assert(CdcConfig.resolveImagesUrl(url, t0 + dayMs) == Some("blobs/e-1.json"))
    // past expiry: the capability is dead, like S3 refusing a stale signature
    assert(CdcConfig.resolveImagesUrl(url, t0 + dayMs + 1).isEmpty)
    // tampered expiry is refused, never parsed as "no expiry"
    assert(CdcConfig.resolveImagesUrl("blobs/e-1.json#expires=zzz", t0).isEmpty)
    // default config: plain path, resolves at any time (oracle wire unchanged)
    val plain = CdcConfig(blobDir = "blobs").imagesUrl("e-1")
    assert(plain == "blobs/e-1.json")
    assert(CdcConfig.resolveImagesUrl(plain, Long.MaxValue) == Some(plain))
  }

  test("raw line parsing keeps image subtrees as raw JSON (FIXTURES A1)") {
    val line =
      """{"eventID":"e-9","eventName":"MODIFY","dynamodb":{"SizeBytes":412,""" +
      """"Keys":{"pk":{"S":"U"}},"NewImage":{"pk":{"S":"U"},"x":{"N":"1"}}}}"""
    val r = RecordProcessor.parseRecord(line).get
    assert(r.eventID.contains("e-9"))
    assert(r.dynamodb.get.SizeBytes.contains(412L))
    assert(r.dynamodb.get.NewImage.contains("""{"pk":{"S":"U"},"x":{"N":"1"}}"""))
    assert(RecordProcessor.parseRecord("garbage").isEmpty)
  }
}
