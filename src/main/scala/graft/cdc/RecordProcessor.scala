package graft.cdc

import scala.util.{Failure, Success, Try}

import graft.attr.{AttrCodec, AttrVal, Json, JsonParser}
import graft.attr.AttrVal.MVal
import graft.diff.Diff

/** The per-record data-plane program (OP-3..OP-10), a pure behavioral port of
  * `processDynamoDBRecord` at
  * `/root/reference/lib/lambda/dynamo-stream-handler.ts:89-178`:
  *
  *  1. validity guards — drop records missing `eventName` / `eventID` /
  *     `dynamodb` (`:92-97`);
  *  2. unmarshall `Keys` / `NewImage` / `OldImage` (`:101-110`);
  *  3. recursive diff (`:112-116` → [[graft.diff.Diff]]);
  *  4. envelope (`:118-125`);
  *  5. no-op MODIFY suppression — AFTER the diff (`:126-128`);
  *  6. claim-check routing at `sizeThreshold` (`:130-166`): small → inline
  *     `newImage` always + `oldImage` only for REMOVE (`:135-138`); large OR
  *     missing/zero `SizeBytes` (the `size &&` falsiness quirk Q5, `:134`) →
  *     blob `{oldImage,newImage}` + `imagesUrl`.
  *
  * Pure (no I/O): blob content is RETURNED for the sink layer to write, which
  * is what makes the operator distributable — Spark tasks call this in a
  * typed `map` and the `foreachBatch` sink performs the writes.
  */
object RecordProcessor {

  /** Outcome of one record: the event to publish plus an optional blob to
    * write. `None` = dropped (invalid or suppressed), mirroring the early
    * `return`s.
    */
  final case class Processed(event: ItemChanged, blob: Option[BlobPayload])

  def process(rec: CdcRecord, cfg: CdcConfig): Option[Processed] =
    (rec.eventName.filter(_.nonEmpty), rec.eventID.filter(_.nonEmpty), rec.dynamodb) match {
      case (Some(operation), Some(eventID), Some(ddb)) =>
        processValid(operation, eventID, ddb, cfg)
      case _ => None // validity guards, `dynamo-stream-handler.ts:92-97`
    }

  private def processValid(
      operation: String,
      eventID: String,
      ddb: CdcStreamPart,
      cfg: CdcConfig): Option[Processed] = {
    def unm(raw: Option[String]): Option[MVal] =
      raw.map(s => normalize(AttrCodec.unmarshallItem(s), cfg))
    processImages(operation, eventID, ddb.SizeBytes,
      unm(ddb.Keys), unm(ddb.NewImage), unm(ddb.OldImage), cfg)
  }

  private def normalize(m: MVal, cfg: CdcConfig): MVal =
    if (cfg.strictCompat) m
    else AttrVal.normalizeSets(m) match { case mm: MVal => mm; case _ => m }

  /** The post-unmarshall record program (diff → envelope → suppression →
    * claim-check). Fused callers (already holding [[MVal]] images) enter
    * here directly — no serialize/re-parse between pipeline stages.
    */
  def processImages(
      operation: String,
      eventID: String,
      size: Option[Long],
      keys: Option[MVal],
      newImage: Option[MVal],
      oldImage: Option[MVal],
      cfg: CdcConfig): Option[Processed] = {
    val d = Diff.diffImages(newImage, oldImage)

    if (operation == "MODIFY" && d.attributesChanged.isEmpty) return None

    def keyVal(k: String): Option[AttrVal] = keys.flatMap(_.get(k))
    def keyStr(k: String): Option[String] = keyVal(k).map {
      case AttrVal.SVal(s) => s
      case other           => AttrVal.printJson(other)
    }
    // JSON encoding of the raw key value (strings quoted, numbers bare) —
    // what JSON.stringify sees for the untyped `keys?.pk` assignment
    def keyJson(k: String): Option[String] = keyVal(k).map(AttrVal.printJson)

    val small = size.exists(s => s != 0L && s < cfg.sizeThreshold)
    val inlineNew = if (small) newImage.map(AttrVal.printJson) else None
    val inlineOld =
      if (small && operation == "REMOVE") oldImage.map(AttrVal.printJson) else None
    val (imagesUrl, blob) =
      if (small) (None, None)
      else {
        // JSON.stringify({oldImage, newImage}) omits absent fields (`:140-143`)
        val fields = Vector.newBuilder[(String, Json)]
        oldImage.foreach(m => fields += (("oldImage", AttrVal.toJson(m))))
        newImage.foreach(m => fields += (("newImage", AttrVal.toJson(m))))
        val body = Json.JObj(fields.result()).print
        (Some(cfg.imagesUrl(eventID)), Some(BlobPayload(cfg.blobKey(eventID), body)))
      }

    val event = ItemChanged(
      operation = operation,
      pk = keyStr("pk"),
      sk = keyStr("sk"),
      attributesChanged = d.attributesChanged,
      before = AttrVal.printJson(d.before),
      after = AttrVal.printJson(d.after),
      newImage = inlineNew,
      oldImage = inlineOld,
      imagesUrl = imagesUrl,
      eventID = eventID,
      pkJson = keyJson("pk"),
      skJson = keyJson("sk"))
    Some(Processed(event, blob))
  }

  /** Error-isolated variant (OP-3): malformed records are logged-and-dropped
    * like the reference's per-record `try/catch`
    * (`dynamo-stream-handler.ts:20-25`), not task-failing.
    */
  def processSafe(rec: CdcRecord, cfg: CdcConfig): Option[Processed] =
    Try(process(rec, cfg)) match {
      case Success(r) => r
      case Failure(_) => None
    }

  /** Fused line path: parse ONCE, unmarshall straight from the JSON tree,
    * evaluate the pk filter on the parsed keys, and run the record program —
    * no intermediate image strings (the [[CdcRecord]] path re-prints and
    * re-parses each image; this one doesn't).
    */
  def processLine(line: String, cfg: CdcConfig, rules: Seq[PkFilter.Rule]): Option[Processed] =
    Try {
      JsonParser.parseOpt(line).collect { case o: Json.JObj => o }.flatMap { o =>
        (o.asMap.get("eventName").collect { case Json.JStr(s) if s.nonEmpty => s },
          o.asMap.get("eventID").collect { case Json.JStr(s) if s.nonEmpty => s },
          o.asMap.get("dynamodb").collect { case d: Json.JObj => d }) match {
          case (Some(op), Some(id), Some(ddb)) =>
            def unm(field: String): Option[MVal] =
              ddb.asMap.get(field).map(j => normalize(AttrCodec.unmarshallItem(j), cfg))
            val keys = unm("Keys")
            val pkOk = rules.isEmpty || keys.flatMap(_.get("pk")).exists {
              case AttrVal.SVal(s) => PkFilter.matches(s, rules)
              case other           => PkFilter.matches(AttrVal.printJson(other), rules)
            }
            if (!pkOk) None
            else {
              val size = ddb.asMap.get("SizeBytes").collect { case Json.JNum(n) => n.toLong }
              processImages(op, id, size, keys, unm("NewImage"), unm("OldImage"), cfg)
            }
          case _ => None
        }
      }
    }.toOption.flatten

  /** Parse one raw stream-record JSON line (FIXTURES.md §A1 shape) into a
    * [[CdcRecord]], keeping image subtrees as raw JSON strings.
    */
  def parseRecord(line: String): Option[CdcRecord] =
    JsonParser.parseOpt(line).collect { case o: Json.JObj =>
      val eventID = o.asMap.get("eventID").collect { case Json.JStr(s) => s }
      val eventName = o.asMap.get("eventName").collect { case Json.JStr(s) => s }
      val ddb = o.asMap.get("dynamodb").collect { case d: Json.JObj =>
        CdcStreamPart(
          SizeBytes = d.asMap.get("SizeBytes").collect { case Json.JNum(n) => n.toLong },
          Keys = d.asMap.get("Keys").map(_.print),
          NewImage = d.asMap.get("NewImage").map(_.print),
          OldImage = d.asMap.get("OldImage").map(_.print))
      }
      CdcRecord(eventID, eventName, ddb)
    }

  /** Bus-row construction (OP-13): `Detail` is the JSON of the event with JS
    * field insertion order — `after, attributesChanged, before, operation,
    * pk, sk[, oldImage][, newImage][, imagesUrl]` — and absent optionals
    * omitted, matching `JSON.stringify(itemChange)`
    * (`dynamo-stream-handler.ts:118-125,135-138,165,173`).
    */
  def toBusEvent(e: ItemChanged, cfg: CdcConfig): BusEvent = {
    val fields = Vector.newBuilder[(String, Json)]
    fields += (("after", JsonParser.parse(e.after)))
    fields += (("attributesChanged", Json.JArr(e.attributesChanged.toVector.map(Json.JStr))))
    fields += (("before", JsonParser.parse(e.before)))
    fields += (("operation", Json.JStr(e.operation)))
    // raw JSON key values: a number-typed pk rides as `"pk":5`, not `"pk":"5"`
    // (reference assigns the untyped unmarshalled value). Fall back to the
    // display string for events built without key JSON (custom transforms).
    e.pkJson.map(JsonParser.parse).orElse(e.pk.map(Json.JStr))
      .foreach(v => fields += (("pk", v)))
    e.skJson.map(JsonParser.parse).orElse(e.sk.map(Json.JStr))
      .foreach(v => fields += (("sk", v)))
    e.oldImage.foreach(v => fields += (("oldImage", JsonParser.parse(v))))
    e.newImage.foreach(v => fields += (("newImage", JsonParser.parse(v))))
    e.imagesUrl.foreach(v => fields += (("imagesUrl", Json.JStr(v))))
    BusEvent(cfg.eventSource, CdcConfig.DetailType, Json.JObj(fields.result()).print, e.eventID)
  }
}
