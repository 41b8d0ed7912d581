package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.cdc.{CdcConfig, CdcPipeline, CdcRecord, RecordProcessor}

/** Source adapter for Kafka-SHAPED frames — any DataFrame carrying the
  * standard Kafka source schema (`key`/`value` binary, `topic`, `partition`,
  * `offset`, `timestamp`), whether it came from
  * `spark.readStream.format("kafka")` on a real cluster or from a replayed
  * capture. The adapter is pure column logic, so it works identically on
  * batch and streaming frames (this offline container has no broker; the
  * spec drives it with synthetic frames of the same schema).
  *
  * Semantics mapping (SURVEY.md §3.1): a DynamoDB stream SHARD is a Kafka
  * PARTITION — per-key ordering holds if the producer keys messages by item
  * pk, which is the same contract the reference's event source mapping
  * relies on. `value` bytes are stream-record JSON lines (FIXTURES.md §A1),
  * UTF-8.
  */
object KafkaShaped {

  /** The topic frame as raw JSON lines (the engine's narrow-source form). */
  def lines(kafka: DataFrame): Dataset[String] = {
    val spark = kafka.sparkSession
    import spark.implicits._
    kafka.select(col("value").cast("string").as("line")).as[String]
  }

  /** Parsed CDC records (malformed values drop, OP-3). */
  def records(kafka: DataFrame): Dataset[CdcRecord] =
    CdcPipeline.parse(lines(kafka))

  /** The fused full pipeline over the topic: parse once, pk filter, diff,
    * envelope, claim-check — same narrow stage as the file source path.
    */
  def processed(kafka: DataFrame, cfg: CdcConfig): Dataset[RecordProcessor.Processed] =
    CdcPipeline.processedLines(lines(kafka), cfg)
}
