package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.{col, count, lit}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.ops.{Exact, Sessions}

/** STREAMING retention monitoring — the retention family's streaming rung
  * (batch [[graft.ops.Sessions.cohortRetention]] → incremental
  * [[graft.ops.Sessions.incrementalCohortRetention]] → this): each
  * trigger's arrivals aggregate to per-(user, day) DAU partials that
  * append to the `batch_id`-partitioned store ([[PartialStore]]), and the
  * trigger emits the cohort triangle over EVERYTHING SEEN SO FAR — the
  * live retention dashboard over a continuously-ingesting event log. DAU
  * partials are exactly mergeable integers and the cohort min re-derives
  * from the merged rows each trigger, so ONE trigger over the full log
  * reproduces the batch triangle row-for-row (spec-pinned), a late batch
  * carrying a user's earliest-ever day simply moves that user's cohort,
  * and a fresh session continues from the store.
  *
  * Replay safety and compaction are the [[PartialStore]] contract: probe
  * excludes the probing batch's own partition; compaction folds by
  * integer summation into a NEW dir. Store size: active user-days per
  * trigger — the standard warehouse DAU table, users×days overall.
  */
object StreamingCohort {

  /** One arriving event, pre-bucketed to its day index
    * ([[graft.ops.Sessions.dayIdx]] units).
    */
  final case class UserDayEvent(event_id: Long, user_id: Long, day: Long)

  def admissionStream(events: Dataset[UserDayEvent], initialDau: DataFrame,
      storeDir: String, sink: (DataFrame, Long) => Unit): DataStreamWriter[UserDayEvent] =
    events.writeStream.foreachBatch { (batch: Dataset[UserDayEvent], batchId: Long) =>
      admissionBatch(batch, batchId, initialDau, storeDir, sink)
    }

  /** One trigger's work — exposed so specs can drive batches exactly as a
    * (restarted) stream would. `initialDau` is the static history's
    * `(user_id, day, n)` (empty frame for a cold start).
    */
  private[graft] def admissionBatch(batch: Dataset[UserDayEvent], batchId: Long,
      initialDau: DataFrame, storeDir: String,
      sink: (DataFrame, Long) => Unit): Unit = {
    val spark = batch.sparkSession
    val bm = batch.toDF()
      .groupBy(col("user_id"), col("day"))
      .agg(count(lit(1)).as("n"))
      .persist()
    try {
      val stored = readDauStore(spark, storeDir)
        .filter(col("batch_id") =!= batchId).drop("batch_id")
      val merged = initialDau.unionByName(stored).unionByName(bm)
        .groupBy(col("user_id"), col("day"))
        .agg(Exact.sumLong(col("n")).as("n"))
      sink(Sessions.cohortOfDau(merged), batchId)
      PartialStore.write(bm, batchId, storeDir)
    } finally { bm.unpersist(); () }
  }

  private def emptyStore(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, Long, Long, Long)]
      .toDF("user_id", "day", "n", "batch_id")
  }

  /** Per-trigger DAU partials `(user_id, day, n, batch_id)`; empty before
    * the first trigger commits.
    */
  def readDauStore(spark: SparkSession, storeDir: String): DataFrame =
    PartialStore.read(spark, storeDir, emptyStore(spark))

  /** Fold partitions `batch_id <= upTo` into one summed sentinel
    * `batch_id = -1` ([[PartialStore.FoldedBatchId]])
    * partition written to a NEW `outDir` ([[PartialStore.compactSummed]] —
    * the repoint convention, probe-transparent by integer reassociation).
    */
  def compactDauStore(spark: SparkSession, storeDir: String, outDir: String,
      upTo: Long): Long =
    PartialStore.compactSummed(spark, storeDir, outDir, upTo,
      emptyStore(spark), Seq("user_id", "day"), "n")
}
