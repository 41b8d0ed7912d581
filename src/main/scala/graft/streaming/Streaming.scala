package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.attr.AttrCodec
import graft.cdc.{CdcRecord, CdcStreamPart}

/** Structured-Streaming-native operators (SURVEY.md §2.1 streaming row).
  *
  * [[ImagePairing]] is the streaming realization of what DynamoDB's
  * NEW_AND_OLD_IMAGES view does before the reference handler runs
  * (`/root/reference/lib/constructs/dynamo.ts:69`): given a raw stream of
  * item WRITES, remember the last image per key in `flatMapGroupsWithState`
  * and emit full CDC records pairing old/new. State TTL doubles as the
  * engine's OP-16: a key idle past the ttl emits a REMOVE on expiry, like
  * DynamoDB's ttl attribute feeding deletions back through the same stream.
  *
  * Scale: state is partitioned by the item key (pk, sk) — the same shard key
  * the source uses — so state lookups are partition-local and the operator
  * scales with the number of DISTINCT keys, bounded by watermark-driven
  * eviction, not with stream length.
  */
object ImagePairing {

  /** One raw item write: plain-JSON image of the item at write time. */
  final case class ItemWrite(pk: String, sk: String, tsMs: Long, imageJson: String)

  final case class KeyState(lastImageJson: String, lastTsMs: Long)

  /** Pair consecutive images per key into CDC records (INSERT on first
    * write, MODIFY after; REMOVE on processing-time ttl expiry when
    * `ttlMs > 0`). Marshals images to wire form so the downstream pipeline
    * is identical to the external-source path.
    */
  def pair(writes: Dataset[ItemWrite], ttlMs: Long = 0L): Dataset[CdcRecord] = {
    val spark = writes.sparkSession
    import spark.implicits._
    val timeout =
      if (ttlMs > 0) GroupStateTimeout.ProcessingTimeTimeout else GroupStateTimeout.NoTimeout

    writes
      .groupByKey(w => (w.pk, w.sk))
      .flatMapGroupsWithState(OutputMode.Append, timeout) {
        (key: (String, String), rows: Iterator[ItemWrite], state: GroupState[KeyState]) =>
          val (pk, sk) = key
          def keysJson = AttrCodec.marshallItem(graft.attr.AttrVal.MVal(Vector(
            "pk" -> graft.attr.AttrVal.SVal(pk),
            "sk" -> graft.attr.AttrVal.SVal(sk)))).print
          def marshal(img: String) =
            AttrCodec.marshallItem(AttrCodec.itemFromPlainJson(img)).print

          if (!rows.hasNext && state.hasTimedOut) {
            // ttl expiry: the stored image leaves the table as a REMOVE
            val old = state.getOption
            state.remove()
            old.map { s =>
              CdcRecord(
                eventID = Some(s"ttl-$pk-$sk-${s.lastTsMs}"),
                eventName = Some("REMOVE"),
                dynamodb = Some(CdcStreamPart(
                  SizeBytes = Some(s.lastImageJson.length.toLong),
                  Keys = Some(keysJson),
                  NewImage = None,
                  OldImage = Some(marshal(s.lastImageJson)))))
            }.iterator
          } else {
            // per-key arrival order within the micro-batch
            val ordered = rows.toVector.sortBy(w => (w.tsMs, w.imageJson))
            var prev = state.getOption
            val out = ordered.map { w =>
              val rec = CdcRecord(
                eventID = Some(s"w-$pk-$sk-${w.tsMs}"),
                eventName = Some(if (prev.isEmpty) "INSERT" else "MODIFY"),
                dynamodb = Some(CdcStreamPart(
                  SizeBytes = Some(w.imageJson.length.toLong),
                  Keys = Some(keysJson),
                  NewImage = Some(marshal(w.imageJson)),
                  OldImage = prev.map(p => marshal(p.lastImageJson)))))
              prev = Some(KeyState(w.imageJson, w.tsMs))
              rec
            }
            prev.foreach { p =>
              state.update(p)
              if (ttlMs > 0) state.setTimeoutDuration(ttlMs)
            }
            out.iterator
          }
      }
  }
}

/** Watermarked tumbling-window aggregation over a streaming event source —
  * the streaming twin of [[graft.ops.Sessions.dailyCounts]]. Late rows
  * beyond the watermark are dropped; in append mode a window emits once,
  * when the watermark passes its end.
  */
object WindowedAgg {

  final case class Event(ts: java.sql.Timestamp, eventType: String, value: Double)

  def tumbling(events: Dataset[Event], window: String = "10 minutes",
      watermark: String = "5 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window), col("eventType"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("window.start").as("win_start"), col("eventType"), col("n"), col("total"))

  /** Gap-based session windows on a live stream — the streaming twin of
    * [[graft.ops.Sessions.sessionize]], via Spark's native `session_window`
    * (state merges adjacent windows per key; watermark closes sessions, so
    * state tracks OPEN sessions only — the bounded-state requirement at
    * stream scale).
    */
  def sessions(events: Dataset[Event], gap: String = "30 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("eventType"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"), col("eventType"), col("n"), col("total"))
}

/** Native watermarked STREAM-STREAM join — the event-time-bounded two-stream
  * join a streaming analytics user reaches for beyond the CDC pipeline
  * itself (the batch twin is [[graft.ops.AsOfJoin]]). Spark buffers both
  * sides in join state; the two ingredients that keep that state BOUNDED at
  * stream scale are (1) watermarks on both sides and (2) an event-time
  * range condition tying the sides together — together they let the engine
  * evict a buffered row as soon as the other side's watermark passes its
  * last possible match, so state scales with the join window, not the
  * stream length. Late rows behind the watermark are dropped, never
  * matched (both behaviors pinned in StreamingSpec).
  */
object StreamJoin {

  final case class Signup(userId: Long, ts: java.sql.Timestamp)
  final case class Purchase(userId: Long, ts: java.sql.Timestamp, amount: Double)

  /** Purchases within `boundMinutes` AFTER the user's signup, joined on the
    * user key plus the event-time range. The equality on the user id keeps
    * the join hash-partitioned (state co-located per key); the range
    * predicate is what bounds eviction.
    *
    * `joinType` "left_outer": a signup with NO in-bound purchase is emitted
    * with NULL purchase columns — but only once the watermark proves no
    * match can still arrive (the null row appears at eviction time, not
    * immediately; spec'd). This is the "did the user ever convert?" shape
    * that a batch left join answers trivially but a stream can only answer
    * watermark-late.
    */
  def purchasesNearSignup(
      signups: Dataset[Signup],
      purchases: Dataset[Purchase],
      watermark: String = "10 minutes",
      boundMinutes: Int = 60,
      joinType: String = "inner"): DataFrame = {
    val s = signups.toDF()
      .select(col("userId").as("s_user"), col("ts").as("s_ts"))
      .withWatermark("s_ts", watermark)
    val p = purchases.toDF()
      .select(col("userId").as("p_user"), col("ts").as("p_ts"), col("amount"))
      .withWatermark("p_ts", watermark)
    s.join(p, expr(
      s"""s_user = p_user AND
         |p_ts >= s_ts AND
         |p_ts <= s_ts + interval $boundMinutes minutes""".stripMargin), joinType)
      .select(col("s_user").as("user_id"), col("s_ts"), col("p_ts"), col("amount"))
  }

  /** STREAM-STATIC enrichment: a streaming fact joined to a batch dimension.
    * No watermark and no join state — each micro-batch joins against the
    * static relation directly, and the explicit broadcast keeps it a
    * map-side hash join per batch (the dim ships once per executor, the
    * stream never shuffles). Left-outer so facts with no dim row survive
    * with NULLs rather than disappearing — the enrichment contract.
    */
  def enrichPurchases(purchases: Dataset[Purchase], users: DataFrame): DataFrame =
    purchases.toDF()
      .join(broadcast(users), Seq("userId"), "left_outer")
}

/** Streaming incremental materialized-view maintenance: the Structured
  * Streaming counterpart of `graft.ops.Incremental.mvIncrementalApply`.
  * A CDC feed arrives as SIGNED deltas (INSERT → +1/+amount, REMOVE →
  * -1/-amount; a MODIFY is a retract+insert pair, exactly the old/new
  * envelope the reference emits per change — `dynamo-stream-handler.ts:
  * 66-75`) and folds into a per-key aggregate held in keyed state. Unlike a
  * built-in streaming `groupBy().sum()`, a group whose count reaches zero
  * emits a DELETED tombstone and drops its state — the downstream sink can
  * mirror the MV exactly, deletions included.
  *
  * Scale: state is one (n, c2) pair per LIVE key, partitioned by key;
  * keys whose count returns exactly to zero free their state immediately,
  * so state size tracks the MV's live cardinality plus any in-flight
  * out-of-order keys — a key driven NEGATIVE (a retraction delivered before
  * its insert) keeps its deficit in state until the matching insert nets it
  * out, because dropping it would silently lose the retraction and leave
  * the view permanently high once the insert lands.
  */
object StreamingMv {

  /** One signed CDC delta against the view. */
  final case class Delta(key: String, dn: Long, dc2: Long)

  final case class MvState(n: Long, c2: Long)

  /** Current row of the maintained view; `deleted = true` is a tombstone. */
  final case class MvRow(key: String, n: Long, c2: Long, deleted: Boolean)

  def maintain(deltas: Dataset[Delta]): Dataset[MvRow] = {
    val spark = deltas.sparkSession
    import spark.implicits._
    deltas
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[Delta], state: GroupState[MvState]) =>
          val prev = state.getOption.getOrElse(MvState(0L, 0L))
          var n = prev.n
          var c2 = prev.c2
          rows.foreach { r => n += r.dn; c2 += r.dc2 }
          if (n == 0L) {
            state.remove()
            // tombstone only if the key was live before this batch
            if (prev.n > 0L) Iterator.single(MvRow(key, 0L, 0L, deleted = true))
            else Iterator.empty
          } else if (n < 0L) {
            // out-of-order CDC (retract before its insert): KEEP the
            // deficit so the late insert nets to the true aggregate —
            // clamping here would rebuild from zero and diverge with no
            // signal. The view meanwhile shows the key as absent.
            state.update(MvState(n, c2))
            if (prev.n > 0L) Iterator.single(MvRow(key, 0L, 0L, deleted = true))
            else Iterator.empty
          } else {
            state.update(MvState(n, c2))
            Iterator.single(MvRow(key, n, c2, deleted = false))
          }
      }
  }
}
