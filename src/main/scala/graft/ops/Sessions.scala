package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream windowing ops (the streaming-adjacent batch surface of
  * SURVEY.md §2.1): gap-based sessionization and per-type rollups. Time
  * arithmetic is epoch-ms on the raw BIGINT tick column, unit footer-detected
  * (see [[Tables.events]] / [[Tables.tsTicksPerMs]]).
  */
object Sessions {

  /** Gap-based sessionization (30-min inactivity): classic lag + cumulative
    * flag-sum. One shuffle on `user_id`; both window functions reuse the same
    * partitioning, so the second window adds no exchange.
    */
  def sessionize(spark: SparkSession, d: String, gapMs: Long = 30 * 60 * 1000L): DataFrame =
    sessionsOf(preparedEvents(spark, d), gapMs)
      .orderBy("user_id", "session_idx")

  /** (user_id, event_id, ms, c2) — the prepared frame the session family
    * shares. */
  private def preparedEvents(spark: SparkSession, d: String): DataFrame =
    Tables.events(spark, d)
      .withColumn("ms", Sessions.msFloor(spark, d))
      .select(col("user_id"), col("event_id"), col("ms"),
        Exact.c2(col("value")).as("c2"))

  /** Gap-based sessionization of a prepared slice (unordered output —
    * callers add their ORDER BY). private[graft]: the streaming monitor's
    * spec uses it to derive prefix expectations.
    */
  private[graft] def sessionsOf(ev: DataFrame, gapMs: Long): DataFrame =
    sessionIndexed(ev, gapMs)
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ms")).as("start_ms"),
        max(col("ms")).as("end_ms"),
        Exact.sumLong(col("c2")).as("total_value_c2"))

  /** The per-event session assignment (lag + cumulative flag-sum) — the
    * pre-aggregation core [[sessionsOf]] and [[sessionColift]] share.
    * Requires (user_id, event_id, ms); extra columns pass through.
    */
  private def sessionIndexed(ev: DataFrame, gapMs: Long): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    ev
      .withColumn("prev_ms", lag(col("ms"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ms").isNull || col("ms") - col("prev_ms") > gapMs, 1L).otherwise(0L))
      .withColumn("session_idx",
        sum(col("new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
  }

  /** The suffix cut: the last ~(10−tenthsOld)/10 of the event_id range is
    * "arriving". Shared by every boundary-state operator AND their specs
    * (the dayIdxExpr rule: shared so a change can't silently miss a
    * hand-inlined copy). On an EMPTY slice `max(event_id)` is NULL; the
    * coalesce degrades the cut to 0, i.e. the caller's "history" is empty
    * and everything routes through its cold-start/suffix path instead of
    * NPE-ing on the null aggregate (r16 ADVICE).
    */
  private[graft] def suffixCut(ev: DataFrame, tenthsOld: Int): Long =
    ev.agg(expr(s"coalesce((max(event_id) * $tenthsOld) div 10, 0)"))
      .head().getLong(0)

  /** [[AnnStore]] kind for the persisted old-slice session table. */
  private[graft] val SessionsKind = "evsessions-v1"

  /** Sessionization under SUFFIX arrival — the flagship of the
    * boundary-state pattern ([[incrementalTransitions]] documents why a
    * contiguous cut is the precondition for lag-derived state): the
    * history persists its SESSION TABLE, whose per-user LAST row is
    * exactly a streaming sessionizer's open-session state (index + end
    * time). The arriving suffix sessionizes with that state injected as
    * each user's seed — the first suffix event's gap test runs against
    * the open session's end, and session numbering continues from the
    * open index, so a small first gap BRIDGES the boundary session. A
    * final full-outer stats-merge on (user, session_idx) folds bridged
    * sessions (counts add, start takes the old min, end the new max) and
    * passes every other session through — HASH-MATCHING the full-log
    * [[sessionize]] (shared oracle). Only the suffix is scanned; the
    * history enters as its session table.
    *
    * DATA CONTRACT: the open session's gap reference is its `end_ms`
    * (the session's max ms), which equals the full-log lag reference —
    * the last old EVENT's ms — only because `ts` is monotone in
    * `event_id` per user (the same contract [[Temporal.temporalJoin]]
    * documents; the raw-events monotonicity tripwire in OpsSpec guards a
    * testdata regeneration breaking it).
    */
  def incrementalSessions(spark: SparkSession, d: String,
      gapMs: Long = 30 * 60 * 1000L, tenthsOld: Int = 9): DataFrame = {
    val ev = preparedEvents(spark, d)
    val cut = suffixCut(ev, tenthsOld)
    val oldSessions = Memo(spark, s"ev_sessions|$d|$gapMs|$tenthsOld") {
      AnnStore.loadOrBuild(spark,
        AnnStore.path(spark, SessionsKind, d, s"g$gapMs-t$tenthsOld",
          corpusTable = "events")) {
        sessionsOf(ev.filter(col("event_id") <= cut), gapMs)
      }.persist()
    }
    val lastState = oldSessions
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("user_id")).orderBy(col("session_idx").desc)))
      .where(col("rk") === 1)
      .select(col("user_id"), col("session_idx").as("last_idx"),
        col("end_ms").as("last_end_ms"))
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    val newSessions = ev.filter(col("event_id") > cut)
      .join(lastState, Seq("user_id"), "left")
      .withColumn("prev_ms", lag(col("ms"), 1).over(byUser))
      .withColumn("ref_ms", coalesce(col("prev_ms"), col("last_end_ms")))
      .withColumn("new_session",
        when(col("ref_ms").isNull || col("ms") - col("ref_ms") > gapMs, 1L).otherwise(0L))
      .withColumn("session_idx", coalesce(col("last_idx"), lit(0L)) +
        sum(col("new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_new"), min(col("ms")).as("start_new"),
        max(col("ms")).as("end_new"), Exact.sumLong(col("c2")).as("total_new"))
    oldSessions
      .select(col("user_id"), col("session_idx"), col("n_events").as("n_old"),
        col("start_ms").as("start_old"), col("end_ms").as("end_old"),
        col("total_value_c2").as("total_old"))
      .join(newSessions, Seq("user_id", "session_idx"), "full_outer")
      .select(col("user_id"), col("session_idx"),
        (coalesce(col("n_old"), lit(0L)) + coalesce(col("n_new"), lit(0L))).as("n_events"),
        least(col("start_old"), col("start_new")).as("start_ms"),
        greatest(col("end_old"), col("end_new")).as("end_ms"),
        (coalesce(col("total_old"), lit(0L)) + coalesce(col("total_new"), lit(0L)))
          .as("total_value_c2"))
      .orderBy("user_id", "session_idx")
  }

  /** Per-event-type rollup: counts + exact decimal value totals. */
  def eventTypeStats(spark: SparkSession, d: String): DataFrame =
    Tables.events(spark, d)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"),
        Exact.sumLong(Exact.c2(col("value"))).as("total_value_c2"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
      .orderBy("event_type")

  /** Tumbling daily window aggregation (batch analogue of the streaming
    * windowed agg; the streaming variant lives in graft.streaming).
    */
  def dailyCounts(spark: SparkSession, d: String): DataFrame =
    Tables.events(spark, d)
      .withColumn("ms", Sessions.msFloor(spark, d))
      .withColumn("day_ms", ((col("ms") - pmod(col("ms"), lit(86400000L))) / 86400000L)
        .cast("long") * 86400000L)
      .groupBy(col("day_ms"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        Exact.sumLong(Exact.c2(col("value"))).as("total_value_c2"))
      .orderBy("day_ms", "event_type")

  /** Exact value histogram — distribution profiling for training-data stats
    * (the fixed-bucket companion of the approximate percentile sketch).
    * Bucket = `c2 - pmod(c2, w)` — pure integer FLOOR arithmetic, exact for
    * negative values and for |c2| > 2^53 alike (no division, no double
    * round-trip). The oracle spells the identical floor explicitly
    * (`v - ((v % w + w) % w)`): DuckDB's `//` TRUNCATES toward zero, so a
    * naive `(v // w) * w` would put -1500 cents in bucket -1000 while floor
    * puts it in -2000.
    */
  def valueHistogram(spark: SparkSession, d: String, bucketCents: Long = 1000L): DataFrame =
    valueHistogramOf(Tables.events(spark, d), bucketCents)

  /** Frame-parameterized variant (spec surface for negative-value inputs). */
  def valueHistogramOf(events: DataFrame, bucketCents: Long = 1000L): DataFrame =
    events
      .withColumn("c2", Exact.c2(col("value")))
      .withColumn("bucket_c2", col("c2") - pmod(col("c2"), lit(bucketCents)))
      .groupBy(col("bucket_c2"))
      .agg(count(lit(1)).as("n"),
        Exact.sumLong(col("c2")).as("total_value_c2"))
      .orderBy("bucket_c2")

  /** Exact heavy hitters: top-k users by event volume, deterministic
    * tie-break on user_id. Partial aggregation + TakeOrderedAndProject —
    * at scale, each partition contributes its local counts and the driver
    * holds only k rows.
    */
  def topUsers(spark: SparkSession, d: String, k: Int = 20): DataFrame =
    Tables.events(spark, d)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        Exact.sumLong(Exact.c2(col("value"))).as("total_value_c2"))
      .orderBy(desc("n_events"), asc("user_id"))
      .limit(k)

  /** Cohort retention matrix: users grouped by first-active day, activity
    * counted per day offset — the DAU-retention triangle every
    * product/ingest-health dashboard reads. The cohort day derives from a
    * window `min` over the SAME `user_id` partitioning the aggregation
    * reuses (no self-join back to a firsts table, no second shuffle of the
    * raw log). Day arithmetic is the sanctioned [[dayIdx]] (footer-detected
    * tick unit). Output is one row per (cohort_day, day_offset) — bounded
    * by days², corpus-size-independent — with distinct-user and raw event
    * counts (BIGINT both sides).
    */
  def cohortRetention(spark: SparkSession, d: String): DataFrame =
    cohortOfDau(
      Tables.events(spark, d)
        .select(col("user_id"), Sessions.dayIdx(spark, d).as("day"))
        .groupBy(col("user_id"), col("day"))
        .agg(count(lit(1)).as("n")))

  /** The triangle over an already-aggregated DAU frame `(user_id, day, n)`
    * (one row per ACTIVE user-day) — shared by the batch and incremental
    * forms. A cell's `n_users` is its DAU row count (a user has at most
    * one row per day), so no distinct aggregation runs here; the cohort
    * window and the cell aggregation both operate on the users×days
    * summary, never the raw log.
    */
  private[graft] def cohortOfDau(dau: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
    dau
      .withColumn("cohort_day", min(col("day")).over(byUser))
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("n_users"),
        Exact.sumLong(col("n")).as("n_events"))
      .orderBy("cohort_day", "day_offset")
  }

  /** [[AnnStore]] kind for the persisted DAU (distinct active user-day)
    * summary.
    */
  private[graft] val DauKind = "evdau-v1"

  /** Retention under log growth — the incremental rung: the persisted
    * history contributes only its DAU summary (one row per active
    * (user, day) with an event count — the standard warehouse DAU table,
    * users×days rows instead of the raw log; exactly mergeable by integer
    * addition), the arriving batch aggregates its own slice, and the
    * merged triangle HASH-MATCHES the full-log [[cohortRetention]] (the
    * oracle pins that). Note this stays exact even when a batch contains
    * a user's EARLIEST activity — the cohort min re-derives from the
    * merged DAU rows, so no per-user firsts column can go stale.
    */
  def incrementalCohortRetention(spark: SparkSession, d: String,
      batchMod: Int = 10): DataFrame =
    cohortOfDau(incrementalDauMerged(spark, d, batchMod))

  /** The merged DAU frame `(user_id, day, n)` = persisted history summary
    * ⊕ arriving batch — the ONE store the incremental retention family
    * ([[incrementalCohortRetention]], [[incrementalRetentionCurve]])
    * shares.
    */
  private def incrementalDauMerged(spark: SparkSession, d: String,
      batchMod: Int): DataFrame = {
    val ev = Tables.events(spark, d)
      .select(col("event_id"), col("user_id"), Sessions.dayIdx(spark, d).as("day"))
    val isNew = pmod(col("event_id"), lit(batchMod)) === 0
    val dauOld = Memo(spark, s"ev_dau_old|$d|$batchMod") {
      AnnStore.loadOrBuild(spark,
        AnnStore.path(spark, DauKind, d, s"x$batchMod", corpusTable = "events")) {
        ev.filter(!isNew).groupBy(col("user_id"), col("day"))
          .agg(count(lit(1)).as("n_old"))
      }.persist()
    }
    val dauNew = ev.filter(isNew).groupBy(col("user_id"), col("day"))
      .agg(count(lit(1)).as("n_new"))
    dauOld.join(dauNew, Seq("user_id", "day"), "full_outer")
      .select(col("user_id"), col("day"),
        (coalesce(col("n_old"), lit(0L)) + coalesce(col("n_new"), lit(0L))).as("n"))
  }

  /** The aggregated retention curve ("D1/D7/D30 retention"): for each day
    * offset o, the share of users retained at o across all cohorts OLD
    * ENOUGH to be observable at o — the denominator restriction
    * (`cohort_day + o ≤ max_day`) is what makes the right edge honest
    * (naively dividing by all users makes recent cohorts drag late
    * offsets toward zero; the curve must condition on observability).
    * Everything computes over the triangle and its offset spine —
    * days²-bounded frames — and shares are integral-`div` ppm. Numerator
    * cells need no explicit observability filter: a triangle cell at
    * offset o implies activity at `cohort+o ≤ max_day` by construction.
    */
  def retentionCurve(spark: SparkSession, d: String): DataFrame =
    retentionCurveOfTriangle(cohortRetention(spark, d))

  /** Retention curve under log growth — the incremental rung: rides the
    * SAME persisted DAU summary as [[incrementalCohortRetention]] (one
    * store serves the whole retention family), derives the triangle from
    * the merged DAU rows, and aggregates the curve from the triangle. The
    * oracle pins it to the full-log [[retentionCurve]] SQL verbatim —
    * hash-match ⇒ incremental ≡ full recompute, including the
    * observability-restricted denominators (they re-derive from the
    * merged triangle's edge, so a batch that EXTENDS max_day
    * automatically re-restricts every offset's denominator).
    */
  def incrementalRetentionCurve(spark: SparkSession, d: String,
      batchMod: Int = 10): DataFrame =
    retentionCurveOfTriangle(cohortOfDau(incrementalDauMerged(spark, d, batchMod)))

  /** The curve tail over an already-built retention triangle — shared by
    * the batch and incremental forms.
    */
  private[graft] def retentionCurveOfTriangle(tri: DataFrame): DataFrame = {
    val lims = tri.agg(
      max(col("cohort_day") + col("day_offset")).as("max_day"),
      min(col("cohort_day")).as("min_cohort"))
    val spine = lims.select(
      explode(sequence(lit(0L), col("max_day") - col("min_cohort"))).as("day_offset"))
    val sizes = tri.filter(col("day_offset") === 0L)
      .select(col("cohort_day"), col("n_users").as("cohort_size"))
    val num = tri.groupBy(col("day_offset"))
      .agg(Exact.sumLong(col("n_users")).as("n_retained"))
    val den = spine.crossJoin(broadcast(lims))
      .join(broadcast(sizes), col("cohort_day") + col("day_offset") <= col("max_day"))
      .groupBy(col("day_offset"))
      .agg(Exact.sumLong(col("cohort_size")).as("denom_users"))
    den.join(num, Seq("day_offset"), "left")
      .select(col("day_offset"),
        coalesce(col("n_retained"), lit(0L)).as("n_retained"), col("denom_users"))
      .withColumn("retained_ppm", expr("n_retained * 1000000 div denom_users"))
      .orderBy("day_offset")
  }

  /** Within-session event-type association ("market basket over sessions"):
    * for each unordered type pair, how many sessions contain BOTH, and the
    * association LIFT in exact ppm-of-e6 form — `lift_e6 =
    * n_both·n_sessions·10⁶ div (n_a·n_b)`, >1e6 ⇔ the types co-occur more
    * than independence predicts. Lift (a pure count ratio) is chosen over
    * PMI deliberately: no logarithm crosses the engine/oracle boundary, so
    * the whole statistic stays in exact integer arithmetic (the
    * join_explosion_check rule: DECIMAL(38,0) factors BEFORE multiplying —
    * session counts square past BIGINT at 100 TB). Plan shape: one
    * session-assignment pass, then everything runs on the DISTINCT
    * (user, session, type) frame — the self-join is keyed on the session
    * and each session contributes ≤ |types|² pairs, so candidate
    * generation is session-bounded, never all-pairs; type totals and the
    * session count enter as broadcast vocabulary-/one-row-sized frames.
    */
  def sessionColift(spark: SparkSession, d: String,
      gapMs: Long = 30 * 60 * 1000L): DataFrame = {
    val ev = Tables.events(spark, d)
      .withColumn("ms", msFloor(spark, d))
      .select(col("user_id"), col("event_id"), col("ms"), col("event_type"))
    val st = Memo(spark, s"ev_sess_types|$d|$gapMs") {
      sessionIndexed(ev, gapMs)
        .select(col("user_id"), col("session_idx"), col("event_type"))
        .distinct()
        .persist()
    }
    val totals = st.select(col("user_id"), col("session_idx")).distinct()
      .agg(count(lit(1)).as("n_sessions"))
    val typeCounts = st.groupBy(col("event_type")).agg(count(lit(1)).as("cnt"))
    val pairs = st.as("a").join(st.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.session_idx") === col("b.session_idx") &&
          col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("n_both"))
    pairs
      .join(broadcast(typeCounts.select(col("event_type").as("type_a"),
        col("cnt").as("n_a"))), Seq("type_a"))
      .join(broadcast(typeCounts.select(col("event_type").as("type_b"),
        col("cnt").as("n_b"))), Seq("type_b"))
      .crossJoin(broadcast(totals))
      .select(col("type_a"), col("type_b"), col("n_both"),
        col("n_a"), col("n_b"), col("n_sessions"),
        expr("(CAST(n_both AS DECIMAL(38,0)) * n_sessions * 1000000)" +
          " div (CAST(n_a AS DECIMAL(38,0)) * n_b)").as("lift_e6"))
      .orderBy("type_a", "type_b")
  }

  /** Cohort churn: per first-active day, how many users' last activity is
    * more than `horizonDays` behind the log's right edge. The same
    * observability conditioning as [[retentionCurve]]: only users whose
    * cohort is at least a horizon old are ELIGIBLE (a user who joined
    * yesterday cannot have churned on a 7-day definition — counting them
    * would drag recent cohorts to zero). One users-sized aggregation; the
    * edge enters as a broadcast one-row frame; output is days-bounded.
    */
  def cohortChurn(spark: SparkSession, d: String,
      horizonDays: Long = 7L): DataFrame =
    churnOfSpans(Tables.events(spark, d)
      .select(col("user_id"), dayIdx(spark, d).as("day"))
      .groupBy(col("user_id"))
      .agg(min(col("day")).as("first_day"), max(col("day")).as("last_day")),
      horizonDays)

  /** Churn under log growth — the incremental rung: per-user first/last
    * days are min/max aggregates of the SAME persisted DAU summary the
    * retention family rides ([[DauKind]] — one store, four consumers),
    * and min/max merge exactly; the log edge re-derives from the merged
    * spans, so a batch that extends it automatically re-qualifies every
    * cohort's eligibility. Oracle pins it to the batch [[cohortChurn]]
    * SQL verbatim.
    */
  def incrementalChurn(spark: SparkSession, d: String,
      horizonDays: Long = 7L, batchMod: Int = 10): DataFrame =
    churnOfSpans(incrementalDauMerged(spark, d, batchMod)
      .groupBy(col("user_id"))
      .agg(min(col("day")).as("first_day"), max(col("day")).as("last_day")),
      horizonDays)

  /** The churn readout over per-user `(first_day, last_day)` spans —
    * shared by the batch and incremental forms.
    */
  private[graft] def churnOfSpans(ud: DataFrame, horizonDays: Long): DataFrame = {
    val mx = ud.agg(max(col("last_day")).as("max_day"))
    ud.crossJoin(broadcast(mx))
      .filter(col("first_day") + horizonDays <= col("max_day"))
      .groupBy(col("first_day").as("cohort_day"))
      .agg(count(lit(1)).as("n_eligible"),
        Exact.sumLong(when(col("last_day") < col("max_day") - horizonDays, 1L)
          .otherwise(0L)).as("churned"))
      .withColumn("churned_ppm", expr("churned * 1000000 div n_eligible"))
      .orderBy("cohort_day")
  }

  /** First-order Markov transition matrix over each user's event sequence
    * (ordered by `event_id`, the engine's per-user sequence key — same
    * ordering contract as the CDC pairing): counts per (prev_type,
    * next_type) plus the integer row-normalized transition share in ppm
    * (`n·10⁶ div row_total` — integral `div` on both engines; decimal `/`
    * would round and can disagree with DuckDB floor at share boundaries,
    * the join_explosion_check parity rule). One shuffle for the per-user
    * lag window, one for the (prev,next) aggregation; the row-total window
    * runs over the ≤|types|² aggregated frame, not the raw log.
    */
  def eventTransitions(spark: SparkSession, d: String): DataFrame =
    transitionsOfPairs(pairCounts(
      Tables.events(spark, d).select(col("user_id"), col("event_id"), col("event_type"))))

  /** Consecutive-pair counts `(prev_type, next_type, n)` from an event
    * slice (per-user lag on the event_id sequence key).
    */
  private[graft] def pairCounts(ev: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    ev
      .withColumn("prev_type", lag(col("event_type"), 1).over(byUser))
      .where(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** Row-normalization tail over already-counted pairs — shared by the
    * batch and incremental forms.
    */
  private[graft] def transitionsOfPairs(pairs: DataFrame): DataFrame =
    pairs
      .groupBy(col("prev_type"), col("next_type"))
      .agg(Exact.sumLong(col("n")).as("n"))
      .withColumn("row_total", sum(col("n")).over(Window.partitionBy(col("prev_type"))))
      .withColumn("ppm", expr("n * 1000000 div row_total"))
      .orderBy("prev_type", "next_type")

  /** [[AnnStore]] kinds for the persisted transition summaries. */
  private[graft] val TransPairsKind = "evtranspairs-v1"
  private[graft] val TransLastKind = "evtranslast-v1"

  /** Transition matrix under SUFFIX arrival — the incremental pattern for
    * LAG-DERIVED aggregates, which plain count merging cannot handle: a
    * consecutive pair can SPAN the old/new boundary. The slices here are
    * contiguous in the sequence key (old = `event_id ≤ cut`, new = the
    * arriving suffix — how a CDC log actually grows), so per user exactly
    * ONE pair crosses the boundary: (last old event → first new event).
    * The persisted history therefore contributes two summaries — its pair
    * counts AND its per-user LAST event type (the boundary state, the
    * same users-sized state a streaming sessionizer keeps) — and the
    * merged matrix = old pairs ⊕ within-batch pairs ⊕ boundary pairs,
    * which HASH-MATCHES the full-log [[eventTransitions]] (shared
    * oracle). Contrast with the mod-sliced incremental ops: an
    * interleaved slice would break EVERY consecutive pair, leaving
    * nothing mergeable — the suffix cut is what makes lag-derived state
    * maintainable, and the scaladoc records that as the pattern's
    * precondition.
    */
  def incrementalTransitions(spark: SparkSession, d: String,
      tenthsOld: Int = 9): DataFrame = {
    val ev = Tables.events(spark, d)
      .select(col("user_id"), col("event_id"), col("event_type"))
    val cut = suffixCut(ev, tenthsOld)
    val oldEv = ev.filter(col("event_id") <= cut)
    val newEv = ev.filter(col("event_id") > cut)
    val pairsOld = Memo(spark, s"ev_trans_pairs|$d|$tenthsOld") {
      AnnStore.loadOrBuild(spark,
        AnnStore.path(spark, TransPairsKind, d, s"t$tenthsOld", corpusTable = "events")) {
        pairCounts(oldEv)
      }.persist()
    }
    val lastOld = Memo(spark, s"ev_trans_last|$d|$tenthsOld") {
      AnnStore.loadOrBuild(spark,
        AnnStore.path(spark, TransLastKind, d, s"t$tenthsOld", corpusTable = "events")) {
        oldEv.groupBy(col("user_id"))
          .agg(expr("max_by(event_type, event_id)").as("last_type"))
      }.persist()
    }
    val firstNew = newEv.groupBy(col("user_id"))
      .agg(expr("min_by(event_type, event_id)").as("first_type"))
    val boundary = lastOld.join(firstNew, Seq("user_id"))
      // parity with pairCounts/the oracle: a NULL prev (lag's first row in
      // the full log; a NULL-typed last old event here) produces no pair
      .where(col("last_type").isNotNull)
      .groupBy(col("last_type").as("prev_type"), col("first_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
    transitionsOfPairs(
      pairsOld.unionByName(pairCounts(newEv)).unionByName(boundary))
  }

  /** Stickiness (DAU/MAU): per observed day, the share of the trailing
    * 30-day active-user base that was active TODAY — the engagement
    * ratio every product dashboard tracks. Computed entirely over the
    * DAU summary (users×days — never the raw log): each active user-day
    * contributes to its own day's DAU and, via a 30-element exploded
    * window spine, to the 30 forward window positions of the MAU
    * distinct count (a 30× blow-up of an already-bounded frame). Early
    * days use the naturally truncated trailing window (documented: a
    * 10-day-old log has a 10-day MAU). Integral-div ppm export.
    */
  def userStickiness(spark: SparkSession, d: String,
      windowDays: Int = 30): DataFrame =
    stickinessOfDau(Memo(spark, s"ev_dau_days|$d") {
      Tables.events(spark, d)
        .select(col("user_id"), dayIdx(spark, d).as("day"))
        .distinct()
        .persist()
    }, windowDays)

  /** Stickiness under log growth — the DAU store's FIFTH consumer
    * (retention triangle, curve, churn, and now the engagement ratio all
    * ride [[DauKind]]): the merged active user-days feed the same
    * explode-spine MAU distinct count, pinned to the batch
    * [[userStickiness]] oracle verbatim.
    */
  def incrementalStickiness(spark: SparkSession, d: String,
      windowDays: Int = 30, batchMod: Int = 10): DataFrame =
    stickinessOfDau(
      incrementalDauMerged(spark, d, batchMod).select(col("user_id"), col("day")),
      windowDays)

  /** The DAU/MAU tail over a `(user_id, day)` active-user-day frame —
    * shared by the batch and incremental forms.
    */
  private[graft] def stickinessOfDau(dau: DataFrame, windowDays: Int): DataFrame = {
    val daily = dau.groupBy(col("day")).agg(count(lit(1)).as("dau_users"))
    val mau = dau
      .withColumn("wd", explode(sequence(col("day"),
        col("day") + lit(windowDays.toLong - 1L))))
      .select(col("user_id"), col("wd"))
      .distinct()
      .groupBy(col("wd").as("day"))
      .agg(count(lit(1)).as("mau_users"))
    daily.join(mau, Seq("day"))
      .withColumn("stickiness_ppm", expr("dau_users * 1000000 div mau_users"))
      .orderBy("day")
  }

  /** Order-2 sequence mining: counts and global ppm shares of each user's
    * consecutive event-type TRIPLES (the natural extension of
    * [[eventTransitions]] to trigram patterns — "view→click→purchase" as
    * a first-class count). Two lag windows over the same per-user
    * partitioning (one shuffle); the aggregated frame is ≤ |types|³ rows
    * and the global total enters as a broadcast one-row frame (the
    * scalar-subquery shape), so the ppm math never re-shuffles the log.
    */
  def eventTrigrams(spark: SparkSession, d: String): DataFrame =
    trigramsOfTriples(tripleCounts(
      Tables.events(spark, d).select(col("user_id"), col("event_id"), col("event_type"))))

  /** Consecutive-triple counts `(t1, t2, t3, n)` from an event slice. */
  private def tripleCounts(ev: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    ev
      .withColumn("p2", lag(col("event_type"), 2).over(byUser))
      .withColumn("p1", lag(col("event_type"), 1).over(byUser))
      .where(col("p2").isNotNull)
      .groupBy(col("p2").as("t1"), col("p1").as("t2"), col("event_type").as("t3"))
      .agg(count(lit(1)).as("n"))
  }

  /** Share tail over already-counted triples — shared by the batch and
    * incremental forms.
    */
  private[graft] def trigramsOfTriples(triples: DataFrame): DataFrame = {
    val summed = triples
      .groupBy(col("t1"), col("t2"), col("t3"))
      .agg(Exact.sumLong(col("n")).as("n"))
    summed
      .crossJoin(broadcast(summed.agg(Exact.sumLong(col("n")).as("total"))))
      .withColumn("ppm", expr("n * 1000000 div total"))
      .select(col("t1"), col("t2"), col("t3"), col("n"), col("ppm"))
      .orderBy("t1", "t2", "t3")
  }

  /** [[AnnStore]] kinds for the persisted trigram summaries. */
  private[graft] val TrigramsKind = "evtrigrams-v1"
  private[graft] val TrigramLastKind = "evtrigramlast-v1"

  /** Trigram matrix under SUFFIX arrival — the boundary-state pattern
    * GENERALIZED to order-2 lags, the proof the
    * [[incrementalTransitions]] recipe scales in window order: with a
    * contiguous cut, per user exactly TWO triples span the boundary —
    * (last old−1, last old, first new) and (last old, first new, second
    * new) — so the persisted boundary state is each user's LAST TWO event
    * types (order-k lags need the last k, still users-sized), and the
    * merged matrix = old triples ⊕ within-suffix triples ⊕ the two
    * boundary families, HASH-MATCHING the full-log [[eventTrigrams]]
    * (shared oracle). A user with fewer than 2 old or new events simply
    * contributes the boundary families its nulls admit — the `isNotNull`
    * guards mirror the full log's lag semantics exactly.
    */
  def incrementalTrigrams(spark: SparkSession, d: String,
      tenthsOld: Int = 9): DataFrame = {
    val ev = Tables.events(spark, d)
      .select(col("user_id"), col("event_id"), col("event_type"))
    val cut = suffixCut(ev, tenthsOld)
    val oldEv = ev.filter(col("event_id") <= cut)
    val newEv = ev.filter(col("event_id") > cut)
    val triplesOld = Memo(spark, s"ev_trigrams|$d|$tenthsOld") {
      AnnStore.loadOrBuild(spark,
        AnnStore.path(spark, TrigramsKind, d, s"t$tenthsOld", corpusTable = "events")) {
        tripleCounts(oldEv)
      }.persist()
    }
    val lastOld = Memo(spark, s"ev_trigram_last|$d|$tenthsOld") {
      AnnStore.loadOrBuild(spark,
        AnnStore.path(spark, TrigramLastKind, d, s"t$tenthsOld", corpusTable = "events")) {
        oldEv
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("user_id")).orderBy(col("event_id").desc)))
          .where(col("rk") <= 2)
          .groupBy(col("user_id"))
          .agg(max(when(col("rk") === 1, col("event_type"))).as("last1"),
            max(when(col("rk") === 2, col("event_type"))).as("last2"))
      }.persist()
    }
    val firstNew = newEv
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("user_id")).orderBy(col("event_id"))))
      .where(col("rk") <= 2)
      .groupBy(col("user_id"))
      .agg(max(when(col("rk") === 1, col("event_type"))).as("f1"),
        max(when(col("rk") === 2, col("event_type"))).as("f2"))
    val joined = lastOld.join(firstNew, Seq("user_id"))
    val b1 = joined.where(col("last2").isNotNull && col("f1").isNotNull)
      .groupBy(col("last2").as("t1"), col("last1").as("t2"), col("f1").as("t3"))
      .agg(count(lit(1)).as("n"))
    val b2 = joined.where(col("last1").isNotNull && col("f2").isNotNull)
      .groupBy(col("last1").as("t1"), col("f1").as("t2"), col("f2").as("t3"))
      .agg(count(lit(1)).as("n"))
    trigramsOfTriples(
      triplesOld.unionByName(tripleCounts(newEv)).unionByName(b1).unionByName(b2))
  }

  /** Floor(ts / T), raw ticks → epoch-ms for T ticks per ms, exact for
    * NEGATIVE (pre-1970) timestamps too: `pmod` is non-negative, so
    * `ts - pmod(ts, T)` is the largest multiple of T ≤ ts, and the remaining
    * `div` is exact (no truncation bias, no double rounding — nanos exceed
    * 2^53). Matches DuckDB `epoch_ms` for every parquet timestamp unit.
    */
  private[ops] def msFloorExpr(ticksPerMs: Long): org.apache.spark.sql.Column =
    expr(s"(ts - pmod(ts, ${ticksPerMs}L)) div ${ticksPerMs}L")

  /** Epoch-ms of `events.ts` with the tick unit read from the parquet footer
    * ([[Tables.tsTicksPerMs]]) — the ONLY sanctioned ms derivation; the
    * testdata's physical unit has changed across generations (nanos →
    * micros), so no call site may hard-code a divisor.
    */
  private[graft] def msFloor(spark: SparkSession, d: String): org.apache.spark.sql.Column =
    msFloorExpr(Tables.tsTicksPerMs(spark, d))

  /** Day index: ms div 86400000. The outer `div` TRUNCATES toward zero on
    * both engines (Spark `div` == DuckDB `//`), so the two agree for all
    * epochs; truncation == floor for the post-1970 event data. Shared so a
    * future change to the unit rule can't silently miss a hand-inlined copy.
    */
  private[ops] def dayIdxExpr(ticksPerMs: Long): org.apache.spark.sql.Column =
    expr(s"((ts - pmod(ts, ${ticksPerMs}L)) div ${ticksPerMs}L) div 86400000")

  private[graft] def dayIdx(spark: SparkSession, d: String): org.apache.spark.sql.Column =
    dayIdxExpr(Tables.tsTicksPerMs(spark, d))
}
