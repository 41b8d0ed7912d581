package graft.cdc

/** Engine-side models for the CDC dataflow (naming map: SURVEY.md Appendix B).
  *
  * A [[CdcRecord]] is one DynamoDB-stream-shaped change record as consumed at
  * `/root/reference/lib/lambda/dynamo-stream-handler.ts:18,92-110`; images are
  * carried as raw marshalled-JSON strings and decoded by the unmarshall
  * operator (OP-6) so arbitrary dynamic schemas survive Spark's closed row
  * schema (SURVEY.md §1.2).
  */
final case class CdcStreamPart(
    SizeBytes: Option[Long],
    Keys: Option[String],
    NewImage: Option[String],
    OldImage: Option[String])

final case class CdcRecord(
    eventID: Option[String],
    eventName: Option[String],
    dynamodb: Option[CdcStreamPart])

/** Output event, per `/root/reference/lib/lambda/DynamoItemChangedEvent.ts:1-12`
  * (`platformId` is declared there but never assigned — dead field, dropped).
  * `before`/`after` are minimal changed subtrees serialized as JSON strings;
  * inline images follow the claim-check rule (OP-10): `newImage` inline when
  * small, `oldImage` inline only for REMOVE, `imagesUrl` set on the blob path.
  *
  * `pk`/`sk` are display strings (what queries project); `pkJson`/`skJson`
  * carry the JSON encoding of the RAW unmarshalled key value — the reference
  * assigns `itemChange.pk = keys?.pk` untyped, so a number-typed pk must
  * serialize as `"pk":5` (not `"pk":"5"`) on the bus wire.
  */
final case class ItemChanged(
    operation: String,
    pk: Option[String],
    sk: Option[String],
    attributesChanged: Seq[String],
    before: String,
    after: String,
    newImage: Option[String],
    oldImage: Option[String],
    imagesUrl: Option[String],
    eventID: String,
    pkJson: Option[String] = None,
    skJson: Option[String] = None)

/** A bus row as the EventBridge sink would publish it
  * (`dynamo-stream-handler.ts:168-177`): `source` from config (the
  * `EVENT_SOURCE` env at `dynamo.ts:90`), fixed `detailType`, JSON `detail`.
  */
final case class BusEvent(
    source: String,
    detailType: String,
    detail: String,
    eventID: String)

/** Claim-check side payload: `{eventID}.json` body written to the blob store
  * (`dynamo-stream-handler.ts:140-152`).
  */
final case class BlobPayload(key: String, body: String)

/** Pipeline configuration — the engine analogue of the reference's deploy-time
  * props (SURVEY.md §3.1): threshold from `dynamo-stream-handler.ts:130`,
  * source default from `:14`, detail type from `:172`.
  */
final case class CdcConfig(
    sizeThreshold: Long = 64 * 1024,
    eventSource: String = "unknown",
    blobDir: String = "blobs",
    pkFilters: Seq[String] = Nil,
    strictCompat: Boolean = false,
    urlTtl: Option[UrlTtl] = None) {
  /** Blob object key for a record. The eventID is untrusted input — strip
    * path-capable characters so a hostile id can neither traverse out of
    * `blobDir` nor point into a nonexistent subdirectory.
    */
  def blobKey(eventID: String): String =
    eventID.replaceAll("[^A-Za-z0-9._-]", "_") + ".json"

  /** Claim-check URL (OP-12). With `urlTtl` set, the URL carries an
    * expiry — the engine analogue of the reference's 24 h presigned GET
    * (`dynamo-stream-handler.ts:154-163`: the S3 lifecycle deletes the blob
    * on the same clock, [[CdcPipeline.cleanBlobs]] here). Default None keeps
    * the plain path (and the byte-stable bus wire the oracle checks).
    */
  def imagesUrl(eventID: String): String = {
    val base = s"$blobDir/${blobKey(eventID)}"
    urlTtl.fold(base)(t => s"$base#expires=${t.issuedAtMs + t.ttlMs}")
  }
}

/** Expiring-URL config: `issuedAtMs` is supplied by the caller (no hidden
  * clock reads inside the record program — keeps it a pure function),
  * `ttlMs` defaults to the reference's 24 h.
  */
final case class UrlTtl(issuedAtMs: Long, ttlMs: Long = 24L * 3600 * 1000)

object CdcConfig {
  val DetailType = "dynamo.item.changed"

  /** Consumer-side capability check: resolve an expiring claim-check URL to
    * its blob path, or None when the URL has expired — the behavior an S3
    * presigned GET enforces server-side after `expiresIn`.
    */
  def resolveImagesUrl(url: String, nowMs: Long): Option[String] = {
    val idx = url.lastIndexOf("#expires=")
    if (idx < 0) Some(url) // non-expiring URL (urlTtl unset)
    else {
      val exp = url.substring(idx + "#expires=".length)
      try if (nowMs <= exp.toLong) Some(url.substring(0, idx)) else None
      catch { case _: NumberFormatException => None } // malformed capability
    }
  }
}
