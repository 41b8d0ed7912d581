package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

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
    * rejects; `nanosAsLong` (runtime-settable) reads it as BIGINT nanos.
    * All time arithmetic on events therefore uses epoch milliseconds via
    * floor division `(ts - pmod(ts, 1000000)) div 1000000` (see
    * [[Sessions.nanosToMsFloor]]), which agrees exactly with DuckDB's
    * `epoch_ms(ts)` for negative (pre-1970) nanos too.
    */
  def events(spark: SparkSession, d: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    apply(spark, d, "events")
  }
  def documents(spark: SparkSession, d: String): DataFrame = apply(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = apply(spark, d, "embeddings")
}
