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
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    * rejects; `nanosAsLong` reads it as BIGINT nanos. Read with an EXPLICIT
    * schema plus a per-read option, not a session conf mutation: schema
    * inference would fail on the NANOS annotation before any option is
    * consulted (and footer-sampling inference is the wrong posture at scale
    * anyway), while the scan-time reader builds its hadoop Configuration
    * from the per-read options, so this read decodes nanos-as-long without
    * touching concurrent readers in the same session (spec'd in OpsSpec).
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
      .option("spark.sql.legacy.parquet.nanosAsLong", "true")
      .parquet(s"$d/events.parquet")
  def documents(spark: SparkSession, d: String): DataFrame = apply(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = apply(spark, d, "embeddings")
}
