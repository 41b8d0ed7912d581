package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.ops.{Exact, Temporal}

/** STREAMING change-point monitoring — the CUSUM family's streaming rung
  * (batch [[graft.ops.Temporal.eventChangepoint]] → incremental
  * [[graft.ops.Temporal.incrementalChangepoint]] → this): each trigger's
  * arrivals aggregate to per-(type, day) cents partials that append to a
  * `batch_id`-partitioned store, and the trigger emits the CUSUM report
  * over EVERYTHING SEEN SO FAR plus the trigger's own rows — the running
  * "has this series shifted, and when" readout an always-on ingest monitor
  * wants. Because daily partials are exactly mergeable integers, ONE
  * trigger over the full log reproduces the batch estimator row-for-row
  * (spec-pinned), and a fresh session continues from the store.
  *
  * Replay safety: the store read excludes this batch's own partition and
  * the write is a dynamic-partition overwrite of it — attempt 2 sees
  * attempt 1's pre-state and rewrites attempt 1's rows (the
  * [[StreamingAnomalies]] / StreamingDedup pattern). Store size:
  * |types|·|days-touched-per-trigger|·|triggers| rows of three integers;
  * [[compactDailyStore]] folds committed partitions when trigger count
  * outgrows days.
  *
  * Scale shape: per trigger one map-side-combinable aggregation over the
  * batch, one tiny store read, and the CUSUM windows over the merged
  * days×types frame — the raw history is never replayed.
  */
object StreamingChangepoint {

  /** One arriving metric event, pre-bucketed to its day index
    * ([[graft.ops.Sessions.dayIdx]] units); `value_c2` is exact cents.
    */
  final case class DayValueEvent(event_id: Long, event_type: String,
      day: Long, value_c2: Long)

  def admissionStream(events: Dataset[DayValueEvent], initialDailies: DataFrame,
      storeDir: String, sink: (DataFrame, Long) => Unit): DataStreamWriter[DayValueEvent] =
    events.writeStream.foreachBatch { (batch: Dataset[DayValueEvent], batchId: Long) =>
      admissionBatch(batch, batchId, initialDailies, storeDir, sink)
    }

  /** One trigger's work — exposed so specs can drive batches exactly as a
    * (restarted) stream would. `initialDailies` is the static history's
    * `(event_type, day, c2)` (empty frame for a cold start).
    */
  private[graft] def admissionBatch(batch: Dataset[DayValueEvent], batchId: Long,
      initialDailies: DataFrame, storeDir: String,
      sink: (DataFrame, Long) => Unit): Unit = {
    val spark = batch.sparkSession
    val bm = batch.toDF()
      .groupBy(col("event_type"), col("day"))
      .agg(Exact.sumLong(col("value_c2")).as("c2"))
      .persist()
    try {
      val stored = readDailyStore(spark, storeDir)
        .filter(col("batch_id") =!= batchId).drop("batch_id")
      val merged = initialDailies.unionByName(stored).unionByName(bm)
        .groupBy(col("event_type"), col("day"))
        .agg(Exact.sumLong(col("c2")).as("day_c2"))
      sink(Temporal.changepointOfDaily(merged), batchId)
      PartialStore.write(bm, batchId, storeDir)
    } finally { bm.unpersist(); () }
  }

  private def emptyStore(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(String, Long, Long, Long)]
      .toDF("event_type", "day", "c2", "batch_id")
  }

  /** Per-trigger daily partials `(event_type, day, c2, batch_id)`; empty
    * before the first trigger commits.
    */
  def readDailyStore(spark: SparkSession, storeDir: String): DataFrame =
    PartialStore.read(spark, storeDir, emptyStore(spark))

  /** Fold partitions `batch_id <= upTo` into one summed sentinel
    * `batch_id = -1` ([[PartialStore.FoldedBatchId]])
    * partition written to a NEW `outDir` ([[PartialStore.compactSummed]] —
    * the repoint convention, probe-transparent by integer reassociation).
    */
  def compactDailyStore(spark: SparkSession, storeDir: String, outDir: String,
      upTo: Long): Long =
    PartialStore.compactSummed(spark, storeDir, outDir, upTo,
      emptyStore(spark), Seq("event_type", "day"), "c2")
}
