package graft.synth

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.attr.{AttrCodec, AttrVal, Json}
import graft.cdc.{CdcRecord, CdcStreamPart}

/** CDC-record synthesis from the driver's `events` table (FIXTURES.md §B
  * bridge): each event is one version of a per-user item; consecutive
  * versions are paired with `lag()` over `(partition by user_id, order by
  * event_id)` to fabricate NEW_AND_OLD_IMAGES-equivalent records — the
  * Spark-native realization of what DynamoDB's stream view does before the
  * reference handler ever runs (`/root/reference/lib/constructs/dynamo.ts:69`).
  *
  * Scale note: the only shuffle is the window's hash partitioning on
  * `user_id` — the natural CDC key partitioning, which the downstream
  * pipeline then consumes narrowly. At 100 TB, `user_id` is the stream's
  * shard key; skewed users would be salted upstream.
  */
object CdcSynth {

  final case class Paired(
      event_id: Long,
      user_id: Long,
      event_type: String,
      props: String,
      prev_type: Option[String],
      prev_props: Option[String])

  /** The synthesized item document for one event version:
    * `{pk, sk, props: <parsed props JSON>, type: event_type}`.
    */
  def itemJson(userId: Long, eventType: String, props: String): Json =
    Json.obj(
      "pk" -> Json.JStr(s"USER#$userId"),
      "sk" -> Json.JStr("PROFILE"),
      "props" -> graft.attr.JsonParser.parse(props),
      "type" -> Json.JStr(eventType))

  def pairedEvents(spark: SparkSession, sfDir: String): Dataset[Paired] = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"event_id")
    graft.ops.Tables.events(spark, sfDir)
      .select($"event_id", $"user_id", $"event_type", $"props")
      .withColumn("prev_type", lag($"event_type", 1).over(w))
      .withColumn("prev_props", lag($"props", 1).over(w))
      .as[Paired]
  }

  /** Fused flagship path: build post-unmarshall [[AttrVal.MVal]] images
    * directly and run the record program — no wire-form serialize/re-parse
    * between stages of the same pipeline (the marshalled path below still
    * exists and is exercised by the record-shaped queries and goldens).
    */
  def fusedEvents(spark: SparkSession, sfDir: String,
      cfg: graft.cdc.CdcConfig): Dataset[graft.cdc.ItemChanged] = {
    import spark.implicits._
    pairedEvents(spark, sfDir).flatMap { p =>
      def item(tpe: String, props: String): AttrVal.MVal = AttrVal.MVal(Vector(
        "pk" -> AttrVal.SVal(s"USER#${p.user_id}"),
        "sk" -> AttrVal.SVal("PROFILE"),
        "props" -> AttrCodec.fromPlainJson(graft.attr.JsonParser.parse(props)),
        "type" -> AttrVal.SVal(tpe)))
      val keys = AttrVal.MVal(Vector(
        "pk" -> AttrVal.SVal(s"USER#${p.user_id}"),
        "sk" -> AttrVal.SVal("PROFILE")))
      graft.cdc.RecordProcessor.processImages(
        operation = if (p.prev_props.isEmpty) "INSERT" else "MODIFY",
        eventID = s"e-${p.event_id}",
        size = Some(1L), // inline branch; flagship projections are size-free
        keys = Some(keys),
        newImage = Some(item(p.event_type, p.props)),
        oldImage = p.prev_props.map(pp => item(p.prev_type.get, pp)),
        cfg = cfg).map(_.event)
    }
  }

  /** Marshalled CDC records: images in DynamoDB tagged wire form so the real
    * pipeline exercises OP-6 unmarshalling end-to-end.
    */
  def records(spark: SparkSession, sfDir: String): Dataset[CdcRecord] = {
    import spark.implicits._
    pairedEvents(spark, sfDir).map { p =>
      def marshalled(tpe: String, props: String): String =
        AttrCodec.marshallItem(
          AttrCodec.itemFromPlainJson(itemJson(p.user_id, tpe, props).print)).print
      val newImage = marshalled(p.event_type, p.props)
      val oldImage = p.prev_props.map(pp => marshalled(p.prev_type.get, pp))
      val keys = AttrCodec.marshallItem(AttrVal.MVal(Vector(
        "pk" -> AttrVal.SVal(s"USER#${p.user_id}"),
        "sk" -> AttrVal.SVal("PROFILE")))).print
      CdcRecord(
        eventID = Some(s"e-${p.event_id}"),
        eventName = Some(if (p.prev_props.isEmpty) "INSERT" else "MODIFY"),
        dynamodb = Some(CdcStreamPart(
          SizeBytes = Some((newImage.length + oldImage.map(_.length).getOrElse(0)).toLong),
          Keys = Some(keys),
          NewImage = Some(newImage),
          OldImage = oldImage)))
    }
  }
}
