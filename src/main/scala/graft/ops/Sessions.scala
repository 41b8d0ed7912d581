package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Event-stream windowing ops (the streaming-adjacent batch surface of
  * SURVEY.md §2.1): gap-based sessionization and per-type rollups. Time
  * arithmetic is epoch-ms on the BIGINT nanos column (see [[Tables.events]]).
  */
object Sessions {

  /** Gap-based sessionization (30-min inactivity): classic lag + cumulative
    * flag-sum. One shuffle on `user_id`; both window functions reuse the same
    * partitioning, so the second window adds no exchange.
    */
  def sessionize(spark: SparkSession, d: String, gapMs: Long = 30 * 60 * 1000L): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    Tables.events(spark, d)
      .withColumn("ms", expr("ts div 1000000"))
      .withColumn("prev_ms", lag(col("ms"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ms").isNull || col("ms") - col("prev_ms") > gapMs, 1L).otherwise(0L))
      .withColumn("session_idx",
        sum(col("new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ms")).as("start_ms"),
        max(col("ms")).as("end_ms"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DecimalType(38, 2)).as("total_value"))
      .orderBy("user_id", "session_idx")
  }

  /** Per-event-type rollup: counts + exact decimal value totals. */
  def eventTypeStats(spark: SparkSession, d: String): DataFrame =
    Tables.events(spark, d)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DecimalType(38, 2)).as("total_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
      .orderBy("event_type")

  /** Tumbling daily window aggregation (batch analogue of the streaming
    * windowed agg; the streaming variant lives in graft.streaming).
    */
  def dailyCounts(spark: SparkSession, d: String): DataFrame =
    Tables.events(spark, d)
      // floor division (not `div`, which truncates toward zero): matches
      // DuckDB's `//` for pre-epoch timestamps too
      .withColumn("ms", expr("ts div 1000000"))
      .withColumn("day_ms", ((col("ms") - pmod(col("ms"), lit(86400000L))) / 86400000L)
        .cast("long") * 86400000L)
      .groupBy(col("day_ms"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DecimalType(38, 2)).as("total_value"))
      .orderBy("day_ms", "event_type")
}
