package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.ops.Temporal

/** STREAMING conversion-window funnel — the funnel family's streaming rung
  * (batch [[graft.ops.Temporal.funnelWindowed]] → incremental
  * [[graft.ops.Temporal.incrementalFunnelWindowed]] → this), and the
  * monitor that introduces the store pattern the summed-partial monitors
  * can't express: per-user stage-times are LAST-WRITER-WINS STATE, not
  * mergeable integer partials. Each trigger advances the current per-user
  * ladder with the batch's arrivals (the SAME
  * [[graft.ops.Temporal.mergeStageTimes]] recurrence the incremental rung
  * uses — suffix == this batch), emits the live funnel readout over all
  * users seen so far, and writes ONLY the users whose ladder moved as its
  * partition — the store is keyed (user_id, batch_id) with the highest
  * batch_id current, so a trigger costs rows ∝ users it actually
  * advanced.
  *
  * DATA CONTRACT: the same two clauses as the incremental rung — triggers
  * deliver each user's events in `event_id` order across batches
  * (contiguous slices), and `ms` is monotone in `event_id` per user, so a
  * reached stage is never beaten by a later arrival and the recurrence
  * stays exact.
  *
  * Replay safety is the [[PartialStore]] contract (probe excludes the
  * probing batch's own partition → a replay re-derives the same pre-state
  * and rewrites identical rows); compaction keeps each user's LATEST row
  * ([[PartialStore.compactLatest]] — "latest" reassociates, so the
  * sentinel fold is probe-transparent like the summed one).
  */
object StreamingFunnel {

  /** One arriving event, pre-floored to epoch ms. */
  final case class FunnelEvent(user_id: Long, event_type: String, ms: Long)

  def admissionStream(events: Dataset[FunnelEvent], initialState: DataFrame,
      storeDir: String, windowMs: Long,
      sink: (DataFrame, Long) => Unit): DataStreamWriter[FunnelEvent] =
    events.writeStream.foreachBatch { (batch: Dataset[FunnelEvent], batchId: Long) =>
      admissionBatch(batch, batchId, initialState, storeDir, windowMs, sink)
    }

  /** One trigger's work — exposed so specs can drive batches exactly as a
    * (restarted) stream would. `initialState` is the static history's
    * per-user stage-times `(user_id, t1, t2, t3, t4)`
    * ([[graft.ops.Temporal.stageTimes]]; empty frame for a cold start).
    */
  private[graft] def admissionBatch(batch: Dataset[FunnelEvent], batchId: Long,
      initialState: DataFrame, storeDir: String, windowMs: Long,
      sink: (DataFrame, Long) => Unit): Unit = {
    val spark = batch.sparkSession
    val stored = readStateStore(spark, storeDir)
      .filter(col("batch_id") =!= batchId)
    // current state: the latest row per user across the static history
    // (tagged below every real batch) and the store
    val current = latestPerUser(
      initialState.withColumn("batch_id", lit(Long.MinValue))
        .unionByName(stored)).persist()
    try {
      val merged = Temporal.mergeStageTimes(current.drop("batch_id"),
        batch.toDF(), windowMs).persist()
      try {
        sink(Temporal.funnelCountsOf(merged), batchId)
        val changed = merged.join(
          current.select(col("user_id"), col("t1").as("c1"), col("t2").as("c2"),
            col("t3").as("c3"), col("t4").as("c4")), Seq("user_id"), "left")
          .where(!(col("t1") <=> col("c1") && col("t2") <=> col("c2") &&
            col("t3") <=> col("c3") && col("t4") <=> col("c4")))
          .select(col("user_id"), col("t1"), col("t2"), col("t3"), col("t4"))
        PartialStore.write(changed, batchId, storeDir)
      } finally { merged.unpersist(); () }
    } finally { current.unpersist(); () }
  }

  /** The LWW read: highest batch_id per user is current. */
  private def latestPerUser(rows: DataFrame): DataFrame =
    rows.withColumn("rk", row_number().over(
      org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("batch_id").desc)))
      .where(col("rk") === 1).drop("rk")

  /** The five-column stage-times table with no rows — the cold-start
    * `initialState`.
    */
  def emptyStateTable(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, Long, Long, Long, Long)]
      .toDF("user_id", "t1", "t2", "t3", "t4")
      .select(col("user_id"), col("t1").cast("long").as("t1"),
        col("t2").cast("long").as("t2"), col("t3").cast("long").as("t3"),
        col("t4").cast("long").as("t4"))
  }

  private def emptyStore(spark: SparkSession): DataFrame =
    emptyStateTable(spark).withColumn("batch_id", lit(0L)).limit(0)

  /** Per-trigger changed-user state rows `(user_id, t1..t4, batch_id)`;
    * empty before the first trigger commits.
    */
  def readStateStore(spark: SparkSession, storeDir: String): DataFrame =
    PartialStore.read(spark, storeDir, emptyStore(spark))

  /** Keep each user's latest row `batch_id <= upTo` as the sentinel
    * partition in a NEW `outDir` ([[PartialStore.compactLatest]]).
    */
  def compactStateStore(spark: SparkSession, storeDir: String, outDir: String,
      upTo: Long): Long =
    PartialStore.compactLatest(spark, storeDir, outDir, upTo,
      emptyStore(spark), Seq("user_id"))
}
