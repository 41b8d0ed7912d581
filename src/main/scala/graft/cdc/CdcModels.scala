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
    strictCompat: Boolean = false) {
  /** Blob object key for a record. The eventID is untrusted input — strip
    * path-capable characters so a hostile id can neither traverse out of
    * `blobDir` nor point into a nonexistent subdirectory.
    */
  def blobKey(eventID: String): String =
    eventID.replaceAll("[^A-Za-z0-9._-]", "_") + ".json"

  def imagesUrl(eventID: String): String = s"$blobDir/${blobKey(eventID)}"
}

object CdcConfig {
  val DetailType = "dynamo.item.changed"
}
