package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.ops.Exact

/** STREAMING lateness monitoring — the runtime form of
  * [[graft.ops.Temporal.latenessProfile]]: each trigger measures how far
  * its arrivals' event times regress behind the per-type running
  * event-time maximum of EVERYTHING ARRIVED BEFORE THEM (carried state ⊕
  * within-batch prefix), emits the per-type lateness report for the
  * batch, and appends its per-type max-ms partial to the store. This is
  * the monitor that tells an operator whether the configured watermark is
  * still wide enough — drift in `max_late_ms` precedes dropped rows.
  *
  * The carried state is per-type MAX event-time — mergeable by `max`, so
  * the store never needs compaction semantics beyond reading (types ×
  * triggers rows of two columns; the probe maxes them). Replay safety is
  * the [[PartialStore]] contract: the probe excludes the probing batch's
  * own partition, the write overwrites it. Because the running max is
  * exactly the batch operator's prefix state, driving the triggers in
  * arrival order makes the FOLD of the trigger reports (sum counts, max
  * maxes) reproduce the batch profile totals — spec-pinned.
  */
object StreamingLateness {

  /** One arriving event (`ms` = event-time epoch millis). */
  final case class ArrivingEvent(event_id: Long, event_type: String, ms: Long)

  def admissionStream(events: Dataset[ArrivingEvent], initialMax: DataFrame,
      storeDir: String, sink: (DataFrame, Long) => Unit): DataStreamWriter[ArrivingEvent] =
    events.writeStream.foreachBatch { (batch: Dataset[ArrivingEvent], batchId: Long) =>
      admissionBatch(batch, batchId, initialMax, storeDir, sink)
    }

  /** One trigger's work. `initialMax` is the static history's
    * `(event_type, max_ms)` (empty frame for a cold start).
    */
  private[graft] def admissionBatch(batch: Dataset[ArrivingEvent], batchId: Long,
      initialMax: DataFrame, storeDir: String,
      sink: (DataFrame, Long) => Unit): Unit = {
    val spark = batch.sparkSession
    val b = batch.toDF().persist()
    try {
      val carried = readMaxStore(spark, storeDir)
        .filter(col("batch_id") =!= batchId).drop("batch_id")
        .unionByName(initialMax)
        .groupBy(col("event_type")).agg(max(col("max_ms")).as("carry_ms"))
      val byType = Window.partitionBy(col("event_type")).orderBy(col("event_id"))
      val report = b
        .join(carried, Seq("event_type"), "left")
        .withColumn("run_max_batch", max(col("ms")).over(
          byType.rowsBetween(Window.unboundedPreceding, -1)))
        .withColumn("run_max", greatest(col("run_max_batch"), col("carry_ms")))
        .withColumn("late_ms",
          when(col("run_max") > col("ms"), col("run_max") - col("ms")).otherwise(0L))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          Exact.sumLong(when(col("late_ms") > 0L, 1L).otherwise(0L)).as("n_late"),
          max(col("late_ms")).as("max_late_ms"),
          Exact.sumLong(col("late_ms")).as("late_sum_ms"))
        .orderBy("event_type")
      sink(report, batchId)
      PartialStore.write(
        b.groupBy(col("event_type")).agg(max(col("ms")).as("max_ms")),
        batchId, storeDir)
    } finally { b.unpersist(); () }
  }

  private def emptyStore(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(String, Long, Long)].toDF("event_type", "max_ms", "batch_id")
  }

  /** Per-trigger per-type max partials `(event_type, max_ms, batch_id)`. */
  def readMaxStore(spark: SparkSession, storeDir: String): DataFrame =
    PartialStore.read(spark, storeDir, emptyStore(spark))
}
