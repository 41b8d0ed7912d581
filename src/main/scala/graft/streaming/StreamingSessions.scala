package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.ops.Exact

/** STREAMING sessionization — the sessions ladder's streaming rung (batch
  * [[graft.ops.Sessions.sessionize]] → incremental
  * [[graft.ops.Sessions.incrementalSessions]] → this), closing the one
  * asymmetry the other five monitors left: each trigger sessionizes ONLY
  * its arriving slice, seeded with the store's per-user OPEN-SESSION state
  * (last session index + end time — exactly the boundary state
  * `incrementalSessions` persists), and emits the full session table over
  * everything seen so far. A small first gap at the trigger boundary
  * BRIDGES the open session: the bridging partial lands under the SAME
  * (user_id, session_idx) key and the session fold (sum counts, min start,
  * max end, sum totals) merges it — so one trigger over the full log
  * reproduces the batch session table row-for-row, and so does any trigger
  * split, including one forced mid-session (both spec-pinned).
  *
  * Unlike the five integer-partial monitors, the per-trigger partials here
  * are NOT order-free: session identity derives from a lag over the
  * per-user event sequence. DATA CONTRACT (same two clauses as
  * [[graft.ops.Sessions.incrementalSessions]], Sessions.scala:78-84):
  * triggers must deliver each user's events in `event_id` order across
  * batches (contiguous slices — how a CDC log actually grows; OP-1's
  * per-key ordering guarantee, `dynamo.ts:69`), and `ms` must be monotone
  * in `event_id` per user so the open session's `end_ms` equals the
  * full-log lag reference.
  *
  * Replay safety and compaction are the [[PartialStore]] contract: the
  * probe excludes the probing batch's own partition, so a replayed batch
  * re-derives the SAME open state as its first attempt (foreachBatch runs
  * batches serially — no later batch exists when one replays) and
  * rewrites identical partials; compaction folds committed partitions
  * with the session fold — associative and commutative, hence
  * probe-transparent — into a NEW dir via
  * [[PartialStore.compactFolded]]. Store size: one row per session
  * touched per trigger; users×sessions overall, the session table itself.
  */
object StreamingSessions {

  /** One arriving event, pre-floored to epoch ms
    * ([[graft.ops.Sessions.msFloor]]) with the value in exact cents.
    */
  final case class SessionEvent(event_id: Long, user_id: Long, ms: Long, c2: Long)

  def admissionStream(events: Dataset[SessionEvent], initialSessions: DataFrame,
      storeDir: String, gapMs: Long,
      sink: (DataFrame, Long) => Unit): DataStreamWriter[SessionEvent] =
    events.writeStream.foreachBatch { (batch: Dataset[SessionEvent], batchId: Long) =>
      admissionBatch(batch, batchId, initialSessions, storeDir, gapMs, sink)
    }

  /** One trigger's work — exposed so specs can drive batches exactly as a
    * (restarted) stream would. `initialSessions` is the static history's
    * session table `(user_id, session_idx, n_events, start_ms, end_ms,
    * total_value_c2)` (empty frame for a cold start).
    */
  private[graft] def admissionBatch(batch: Dataset[SessionEvent], batchId: Long,
      initialSessions: DataFrame, storeDir: String, gapMs: Long,
      sink: (DataFrame, Long) => Unit): Unit = {
    val spark = batch.sparkSession
    val stored = readSessionStore(spark, storeDir)
      .filter(col("batch_id") =!= batchId).drop("batch_id")
    val history = foldSessions(initialSessions.unionByName(stored)).persist()
    try {
      val open = history
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("user_id")).orderBy(col("session_idx").desc)))
        .where(col("rk") === 1)
        .select(col("user_id"), col("session_idx").as("last_idx"),
          col("end_ms").as("last_end_ms"))
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      val partials = batch.toDF()
        .join(open, Seq("user_id"), "left")
        .withColumn("prev_ms", lag(col("ms"), 1).over(byUser))
        // the first batch event's gap test runs against the open session's
        // end; a fresh user has a null reference → opens session 1, the
        // same numbering the batch lag produces on a full log
        .withColumn("ref_ms", coalesce(col("prev_ms"), col("last_end_ms")))
        .withColumn("new_session",
          when(col("ref_ms").isNull || col("ms") - col("ref_ms") > gapMs, 1L)
            .otherwise(0L))
        .withColumn("session_idx", coalesce(col("last_idx"), lit(0L)) +
          sum(col("new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(col("user_id"), col("session_idx"))
        .agg(count(lit(1)).as("n_events"), min(col("ms")).as("start_ms"),
          max(col("ms")).as("end_ms"), Exact.sumLong(col("c2")).as("total_value_c2"))
        .persist()
      try {
        sink(foldSessions(history.unionByName(partials))
          .orderBy("user_id", "session_idx"), batchId)
        PartialStore.write(partials, batchId, storeDir)
      } finally { partials.unpersist(); () }
    } finally { history.unpersist(); () }
  }

  /** The session fold: partials sharing a (user_id, session_idx) key merge
    * by (sum, min, max, sum) — associative, commutative, and exactly the
    * stats-merge `incrementalSessions` applies at its one boundary; here
    * it also re-folds the store's per-trigger partials.
    */
  private[graft] def foldSessions(parts: DataFrame): DataFrame =
    parts.groupBy(col("user_id"), col("session_idx"))
      .agg(Exact.sumLong(col("n_events")).as("n_events"),
        min(col("start_ms")).as("start_ms"),
        max(col("end_ms")).as("end_ms"),
        Exact.sumLong(col("total_value_c2")).as("total_value_c2"))

  /** The six-column session table with no rows — the cold-start
    * `initialSessions` (specs and the bench section share it).
    */
  def emptySessionTable(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, Long, Long, Long, Long, Long)]
      .toDF("user_id", "session_idx", "n_events", "start_ms", "end_ms",
        "total_value_c2")
  }

  private def emptyStore(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, Long, Long, Long, Long, Long, Long)]
      .toDF("user_id", "session_idx", "n_events", "start_ms", "end_ms",
        "total_value_c2", "batch_id")
  }

  /** Per-trigger session partials `(user_id, session_idx, n_events,
    * start_ms, end_ms, total_value_c2, batch_id)`; empty before the first
    * trigger commits.
    */
  def readSessionStore(spark: SparkSession, storeDir: String): DataFrame =
    PartialStore.read(spark, storeDir, emptyStore(spark))

  private def foldAggs: Seq[Column] = Seq(
    Exact.sumLong(col("n_events")).as("n_events"),
    min(col("start_ms")).as("start_ms"),
    max(col("end_ms")).as("end_ms"),
    Exact.sumLong(col("total_value_c2")).as("total_value_c2"))

  /** Fold partitions `batch_id <= upTo` into one session-folded sentinel
    * `batch_id = `[[PartialStore.FoldedBatchId]] partition written to a
    * NEW `outDir` ([[PartialStore.compactFolded]] — the repoint
    * convention, probe-transparent because the session fold reassociates).
    */
  def compactSessionStore(spark: SparkSession, storeDir: String, outDir: String,
      upTo: Long): Long =
    PartialStore.compactFolded(spark, storeDir, outDir, upTo,
      emptyStore(spark), Seq("user_id", "session_idx"), foldAggs)
}
