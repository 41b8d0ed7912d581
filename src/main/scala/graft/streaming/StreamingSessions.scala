package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.ops.Exact

/** STREAMING sessionization — the sessions ladder's streaming rung (batch
  * [[graft.ops.Sessions.sessionize]] → incremental
  * [[graft.ops.Sessions.incrementalSessions]] → this), on TWO stores (the
  * [[StreamingTransitions]] composite shape):
  *
  *  - per-user OPEN-SESSION state `(user_id, last_idx, last_end_ms)` as
  *    LAST-WRITER-WINS rows (the [[StreamingFunnel]] store algebra) — each
  *    trigger seeds its slice's sessionization from the store's latest row
  *    per user, and writes superseding rows for exactly the users the batch
  *    touched;
  *  - per-trigger session PARTIALS keyed `(user_id, session_idx)` under the
  *    session fold (sum counts, min start, max end, sum totals) — the
  *    CHANGELOG the sink receives, and the durable record a consumer folds
  *    into the full session table on demand ([[liveSessionTable]]).
  *
  * The sink gets ONLY the touched sessions' partials (rows ∝ the batch, a
  * changelog), never the full table: the r18 redesign — the previous form
  * re-folded the whole store and emitted every session each trigger, an
  * O(all sessions ever) per-trigger cost that benched 16× slower than the
  * funnel monitor on the same harness. Full-table equality with the batch
  * `session_window` twin is a SPEC-ONLY fold over the changelog
  * (StreamingSessionsSpec), not a per-trigger emission.
  *
  * A small first gap at the trigger boundary BRIDGES the open session: the
  * bridging partial lands under the SAME (user_id, session_idx) key and
  * the session fold merges it — so the folded changelog of any trigger
  * split, including one forced mid-session, reproduces the batch session
  * table row-for-row (both spec-pinned).
  *
  * The per-trigger partials are NOT order-free: session identity derives
  * from a lag over the per-user event sequence. DATA CONTRACT (same two
  * clauses as [[graft.ops.Sessions.incrementalSessions]],
  * Sessions.scala:78-84): triggers must deliver each user's events in
  * `event_id` order across batches (contiguous slices — how a CDC log
  * actually grows; OP-1's per-key ordering guarantee, `dynamo.ts:69`), and
  * `ms` must be monotone in `event_id` per user so the open session's
  * `end_ms` equals the full-log lag reference. The monotonicity clause is
  * also why the open state rebuilds from the batch alone: the batch's max
  * `end_ms` always belongs to its highest `session_idx`.
  *
  * Replay safety and compaction are the [[PartialStore]] contract on BOTH
  * stores: probes exclude the probing batch's own partition, so a replayed
  * batch re-derives the SAME open state as its first attempt (foreachBatch
  * runs batches serially — no later batch exists when one replays) and
  * rewrites identical partitions; compaction folds committed partitions —
  * [[PartialStore.compactFolded]] with the session fold for the changelog
  * store, [[PartialStore.compactLatest]] for the open state. Store sizes:
  * changelog ≤ sessions + one bridge row per (session, trigger) that split
  * it; open state ≤ users touched per trigger, compactable to |users|.
  */
object StreamingSessions {

  /** One arriving event, pre-floored to epoch ms
    * ([[graft.ops.Sessions.msFloor]]) with the value in exact cents.
    */
  final case class SessionEvent(event_id: Long, user_id: Long, ms: Long, c2: Long)

  def admissionStream(events: Dataset[SessionEvent], initialOpen: DataFrame,
      sessDir: String, openDir: String, gapMs: Long,
      sink: (DataFrame, Long) => Unit): DataStreamWriter[SessionEvent] =
    events.writeStream.foreachBatch { (batch: Dataset[SessionEvent], batchId: Long) =>
      admissionBatch(batch, batchId, initialOpen, sessDir, openDir, gapMs, sink)
    }

  /** One trigger's work — exposed so specs can drive batches exactly as a
    * (restarted) stream would. `initialOpen` is the static history's
    * per-user open-session state `(user_id, last_idx, last_end_ms)` —
    * [[openStateOf]] over its session table, derived ONCE at stream setup
    * (empty frame for a cold start). The sink receives the touched
    * sessions' PARTIALS for this trigger (the changelog), ordered.
    */
  private[graft] def admissionBatch(batch: Dataset[SessionEvent], batchId: Long,
      initialOpen: DataFrame, sessDir: String, openDir: String, gapMs: Long,
      sink: (DataFrame, Long) => Unit): Unit = {
    val spark = batch.sparkSession
    val stored = readOpenStore(spark, openDir)
      .filter(col("batch_id") =!= batchId)
    // current open state: latest row per user across the static history
    // (tagged below every real batch) and the store — rows ∝ users
    // touched since the last compaction, never ∝ sessions
    val open = latestPerUser(
      initialOpen.withColumn("batch_id", lit(Long.MinValue))
        .unionByName(stored))
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
      sink(partials.orderBy("user_id", "session_idx"), batchId)
      PartialStore.write(partials, batchId, sessDir)
      // superseding open-state rows for exactly the users this batch
      // touched: per-user max end_ms belongs to the max session_idx
      // under the ms-monotonicity contract
      PartialStore.write(
        partials.groupBy(col("user_id"))
          .agg(max(col("session_idx")).as("last_idx"),
            max(col("end_ms")).as("last_end_ms")),
        batchId, openDir)
    } finally { partials.unpersist(); () }
  }

  /** The per-user open-session state a session table implies — derive the
    * stream's `initialOpen` from a static history ONCE at setup.
    */
  def openStateOf(sessions: DataFrame): DataFrame =
    sessions
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("user_id")).orderBy(col("session_idx").desc)))
      .where(col("rk") === 1)
      .select(col("user_id"), col("session_idx").as("last_idx"),
        col("end_ms").as("last_end_ms"))

  /** The LWW read: highest batch_id per user is the current open state. */
  private def latestPerUser(rows: DataFrame): DataFrame =
    rows.withColumn("rk", row_number().over(
      Window.partitionBy(col("user_id")).orderBy(col("batch_id").desc)))
      .where(col("rk") === 1)
      .select(col("user_id"), col("last_idx"), col("last_end_ms"))

  /** The session fold: partials sharing a (user_id, session_idx) key merge
    * by (sum, min, max, sum) — associative, commutative, and exactly the
    * stats-merge `incrementalSessions` applies at its one boundary; here
    * it folds the changelog back into the full session table.
    */
  private[graft] def foldSessions(parts: DataFrame): DataFrame =
    parts.groupBy(col("user_id"), col("session_idx"))
      .agg(Exact.sumLong(col("n_events")).as("n_events"),
        min(col("start_ms")).as("start_ms"),
        max(col("end_ms")).as("end_ms"),
        Exact.sumLong(col("total_value_c2")).as("total_value_c2"))

  /** The full session table ON DEMAND: static history ∪ the changelog
    * store, session-folded — what the per-trigger emission deliberately no
    * longer materializes (a dashboard refresh or the spec's equivalence
    * check runs this; a continuous consumer folds the changelog itself).
    */
  def liveSessionTable(spark: SparkSession, sessDir: String,
      initialSessions: DataFrame): DataFrame =
    foldSessions(initialSessions.unionByName(
      readSessionStore(spark, sessDir).drop("batch_id")))
      .orderBy("user_id", "session_idx")

  /** The six-column session table with no rows — the cold-start history
    * (specs and the bench section share it).
    */
  def emptySessionTable(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, Long, Long, Long, Long, Long)]
      .toDF("user_id", "session_idx", "n_events", "start_ms", "end_ms",
        "total_value_c2")
  }

  /** The cold-start `initialOpen` (no user has an open session). */
  def emptyOpenState(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, Long, Long)].toDF("user_id", "last_idx", "last_end_ms")
  }

  private def emptyStore(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, Long, Long, Long, Long, Long, Long)]
      .toDF("user_id", "session_idx", "n_events", "start_ms", "end_ms",
        "total_value_c2", "batch_id")
  }

  private def emptyOpenStore(spark: SparkSession): DataFrame =
    emptyOpenState(spark).withColumn("batch_id", lit(0L)).limit(0)

  /** Per-trigger session partials `(user_id, session_idx, n_events,
    * start_ms, end_ms, total_value_c2, batch_id)` — the changelog; empty
    * before the first trigger commits.
    */
  def readSessionStore(spark: SparkSession, storeDir: String): DataFrame =
    PartialStore.read(spark, storeDir, emptyStore(spark))

  /** Per-trigger superseding open-state rows `(user_id, last_idx,
    * last_end_ms, batch_id)`; empty before the first trigger commits.
    */
  def readOpenStore(spark: SparkSession, storeDir: String): DataFrame =
    PartialStore.read(spark, storeDir, emptyOpenStore(spark))

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

  /** Keep each user's latest open-state row `batch_id <= upTo` as the
    * sentinel partition in a NEW `outDir`
    * ([[PartialStore.compactLatest]]) — bounds the open store at |users|.
    */
  def compactOpenStore(spark: SparkSession, storeDir: String, outDir: String,
      upTo: Long): Long =
    PartialStore.compactLatest(spark, storeDir, outDir, upTo,
      emptyOpenStore(spark), Seq("user_id"))
}
