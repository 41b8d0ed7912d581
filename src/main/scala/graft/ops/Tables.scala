package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Loaders for the driver's read-only parquet tables (TESTDATA.md). */
object Tables {
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, d: String): DataFrame = apply(spark, d, "lineitem")
  def orders(spark: SparkSession, d: String): DataFrame = apply(spark, d, "orders")
  def customer(spark: SparkSession, d: String): DataFrame = apply(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame = apply(spark, d, "supplier")
  def nation(spark: SparkSession, d: String): DataFrame = apply(spark, d, "nation")
  def region(spark: SparkSession, d: String): DataFrame = apply(spark, d, "region")
  def part(spark: SparkSession, d: String): DataFrame = apply(spark, d, "part")
  /** `events.ts` is parquet TIMESTAMP(NANOS); schema INFERENCE rejects that
    * annotation, so the read supplies an explicit schema with `ts: LONG`
    * (epoch nanos) — the EXPLICIT SCHEMA alone is the whole mechanism: the
    * scan-time updater decodes NANOS→long whenever the requested Spark type
    * is LongType, no conf needed (verified empirically; a per-read
    * `nanosAsLong` option is inert because the scan's hadoopConf overwrites
    * that key from the session conf). No session conf is mutated, so
    * concurrent readers are untouched (spec'd in OpsSpec) — and skipping
    * footer-sampling inference is the right posture at scale anyway.
    * All time arithmetic on events therefore uses epoch milliseconds via
    * floor division `(ts - pmod(ts, 1000000)) div 1000000` (see
    * [[Sessions.nanosToMsFloor]]), which agrees exactly with DuckDB's
    * `epoch_ms(ts)` for negative (pre-1970) nanos too.
    */
  private val eventsSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // TIMESTAMP(NANOS) decoded as epoch nanos
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  def events(spark: SparkSession, d: String): DataFrame =
    spark.read
      .schema(eventsSchema)
      .parquet(s"$d/events.parquet")
  def documents(spark: SparkSession, d: String): DataFrame = apply(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = apply(spark, d, "embeddings")
}
