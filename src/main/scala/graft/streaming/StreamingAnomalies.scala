package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.{broadcast, coalesce, col, count, lit, when}
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types.DecimalType

import graft.ops.Exact

/** STREAMING anomaly admission — the anomaly family's streaming rung
  * (batch [[graft.ops.Temporal.eventAnomalies]] → incremental
  * [[graft.ops.Temporal.incrementalAnomalies]] → this): arriving events
  * are flagged per trigger against the moments of EVERYTHING SEEN SO FAR
  * plus the trigger's own rows, and the trigger's per-type moment partials
  * (n, Σv, Σv² — exact integers, trivially mergeable) append to a
  * `batch_id`-partitioned store, so the statistics survive restarts and a
  * fresh session continues where the last stopped.
  *
  * Verdict semantics: a trigger's rows count toward the statistics that
  * judge them (merged = past ⊕ batch) — exactly the incremental op's
  * contract, which is what makes ONE trigger over the full log reproduce
  * the batch detector row-for-row (spec-pinned equality). Early triggers
  * flag against fewer observations; verdicts are admission-time evidence,
  * not retroactive truth — re-flagging history under final moments is the
  * periodic batch job, same trade as every rung.
  *
  * Replay safety: the probe excludes this batch's own partition and the
  * partial write is a dynamic-partition overwrite of it — attempt 2 sees
  * attempt 1's pre-state and rewrites attempt 1's rows. Store size:
  * |types|·|triggers| rows of five integers; compaction is unnecessary by
  * construction, but the partials fold with one aggregation if wanted.
  *
  * Scale shape: per trigger one map-side-combinable aggregation over the
  * batch, one tiny store read (types × triggers), one broadcast join back
  * over the batch, one partition write of |types| rows.
  */
object StreamingAnomalies {

  /** One arriving metric event; `value_c2` is exact integer cents. */
  final case class ValueEvent(event_id: Long, event_type: String, value_c2: Long)

  def admissionStream(events: Dataset[ValueEvent], initialMoments: DataFrame,
      storeDir: String, sink: (DataFrame, Long) => Unit): DataStreamWriter[ValueEvent] =
    events.writeStream.foreachBatch { (batch: Dataset[ValueEvent], batchId: Long) =>
      admissionBatch(batch, batchId, initialMoments, storeDir, sink)
    }

  /** One trigger's work — exposed so specs can drive batches exactly as a
    * (restarted) stream would. `initialMoments` is the static history's
    * `(event_type, n, s, q)` (empty frame for a cold start).
    */
  private[graft] def admissionBatch(batch: Dataset[ValueEvent], batchId: Long,
      initialMoments: DataFrame, storeDir: String,
      sink: (DataFrame, Long) => Unit): Unit = {
    val spark = batch.sparkSession
    val b = batch.toDF().persist()
    try {
      val stored = readMomentsStore(spark, storeDir)
        .filter(col("batch_id") =!= batchId).drop("batch_id")
      val past = initialMoments.unionByName(stored)
      val bm = b.groupBy(col("event_type")).agg(
        count(lit(1)).as("n"),
        Exact.sumLong(col("value_c2")).as("s"),
        Exact.sumLong(col("value_c2") * col("value_c2")).as("q"))
      val merged = past
        .select(col("event_type"), col("n").as("n_old"), col("s").as("s_old"),
          col("q").as("q_old"))
        .groupBy(col("event_type")).agg(
          Exact.sumLong(col("n_old")).as("n_old"),
          Exact.sumLong(col("s_old")).as("s_old"),
          Exact.sumLong(col("q_old")).as("q_old"))
        .join(bm, Seq("event_type"), "full_outer")
        .select(col("event_type"),
          (coalesce(col("n_old"), lit(0L)) + coalesce(col("n"), lit(0L))).as("n"),
          (coalesce(col("s_old"), lit(0L)) + coalesce(col("s"), lit(0L))).as("s"),
          (coalesce(col("q_old"), lit(0L)) + coalesce(col("q"), lit(0L))).as("q"))
      val dec = DecimalType(38, 0)
      val dev = col("n").cast(dec) * col("value_c2").cast(dec) - col("s").cast(dec)
      val varN2 = col("n").cast(dec) * col("q").cast(dec) -
        col("s").cast(dec) * col("s").cast(dec)
      val flags = b.join(broadcast(merged), Seq("event_type"))
        .filter(dev * dev > lit(9).cast(dec) * varN2)
        .select(col("event_id"), col("event_type"), col("value_c2"),
          when(dev > 0, 1L).otherwise(-1L).as("z_sign"))
        .orderBy("event_id")
      sink(flags, batchId)
      PartialStore.write(bm, batchId, storeDir)
    } finally { b.unpersist(); () }
  }

  /** Per-trigger moment partials `(event_type, n, s, q, batch_id)`; empty
    * before the first trigger commits.
    */
  def readMomentsStore(spark: SparkSession, storeDir: String): DataFrame = {
    import spark.implicits._
    PartialStore.read(spark, storeDir,
      Seq.empty[(String, Long, Long, Long, Long)]
        .toDF("event_type", "n", "s", "q", "batch_id"))
  }
}
