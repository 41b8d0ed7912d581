package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.ops.{Exact, Sessions, Tables}

/** Streaming sessionization: the changelog emission contract — one-trigger
  * equality with the oracled batch session table, per-trigger changelogs
  * whose fold tracks every prefix (with a verified cross-trigger bridge), a
  * deterministic forced-bridge split, history seeding via openStateOf,
  * replay invisibility, and compaction transparency on BOTH stores (session
  * fold + LWW open state).
  */
class StreamingSessionsSpec extends SparkSuite {

  private val gapMs = 30 * 60 * 1000L

  private def sessionEvents = {
    import spark.implicits._
    Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"),
        Sessions.msFloor(spark, sf).as("ms"), Exact.c2(col("value")).as("c2"))
      .as[StreamingSessions.SessionEvent]
  }

  private def rows(df: DataFrame): Seq[Row] = df.collect().toSeq

  test("one trigger over the full log emits the batch session table as its changelog") {
    val base = graft.ops.Scratch.dir("sess_stream_full").toString
    var got: Seq[Row] = Seq.empty
    StreamingSessions.admissionBatch(sessionEvents, 0L,
      StreamingSessions.emptyOpenState(spark), s"$base/sessions", s"$base/open",
      gapMs, (df, _) => got = rows(df))
    assert(got == rows(Sessions.sessionize(spark, sf)))
    assert(got.nonEmpty)
  }

  test("multi-trigger: folded changelog tracks every prefix, bridge occurs, replay invisible, both stores compact transparently") {
    import spark.implicits._
    val base = graft.ops.Scratch.dir("sess_stream_multi").toString
    val (sess, open) = (s"$base/sessions", s"$base/open")
    val all = sessionEvents.collect().sortBy(_.event_id)
    val cuts = Seq(all.length / 3, 2 * all.length / 3, all.length)
    val reports = scala.collection.mutable.Map.empty[Long, Seq[Row]]
    var lo = 0
    cuts.zipWithIndex.foreach { case (hi, i) =>
      StreamingSessions.admissionBatch(all.slice(lo, hi).toSeq.toDS(), i.toLong,
        StreamingSessions.emptyOpenState(spark), sess, open, gapMs,
        (df, id) => { reports(id) = rows(df); () })
      lo = hi
    }
    // the sink's changelog IS the store partition (emission == durable record)
    cuts.indices.foreach { i =>
      assert(reports(i.toLong) == rows(
        StreamingSessions.readSessionStore(spark, sess)
          .filter(col("batch_id") === i.toLong).drop("batch_id")
          .orderBy("user_id", "session_idx")),
        s"trigger $i emitted rows differ from its store partition")
    }
    // prefix equivalence: folding the changelog up to trigger i reproduces
    // the batch session table of exactly the events delivered so far
    cuts.zipWithIndex.foreach { case (hi, i) =>
      val prefix = all.take(hi).toSeq.toDS().toDF()
      val folded = StreamingSessions.foldSessions(
        StreamingSessions.readSessionStore(spark, sess)
          .filter(col("batch_id") <= i.toLong).drop("batch_id"))
        .orderBy("user_id", "session_idx")
      assert(rows(folded) ==
        rows(Sessions.sessionsOf(prefix, gapMs).orderBy("user_id", "session_idx")),
        s"changelog fold after trigger $i drifted from its prefix")
    }
    val batchTable = rows(Sessions.sessionize(spark, sf))
    assert(rows(StreamingSessions.liveSessionTable(spark, sess,
      StreamingSessions.emptySessionTable(spark))) == batchTable)

    // the cuts must have split at least one session mid-stream: a bridged
    // session has partials under the same key in two partitions, so the
    // store holds MORE partial rows than the final table has sessions
    val partialRows = StreamingSessions.readSessionStore(spark, sess).count()
    assert(partialRows > batchTable.length.toLong,
      "no session bridged a trigger boundary — move the cuts so the bridge path is exercised")

    // replay the LAST trigger: changelog and both stores unchanged
    StreamingSessions.admissionBatch(
      all.slice(cuts(1), cuts(2)).toSeq.toDS(), 2L,
      StreamingSessions.emptyOpenState(spark), sess, open, gapMs,
      (df, id) => { reports(id) = rows(df); () })
    assert(rows(StreamingSessions.liveSessionTable(spark, sess,
      StreamingSessions.emptySessionTable(spark))) == batchTable,
      "replay changed the folded table")
    val storedEvents = StreamingSessions.readSessionStore(spark, sess)
      .agg(sum(col("n_events"))).collect().head.getLong(0)
    assert(storedEvents == all.length.toLong, "replay changed the store")

    // session-store compaction to a new dir: session fold, probe-transparent
    val compacted = s"$base/compact/sessions"
    StreamingSessions.compactSessionStore(spark, sess, compacted, upTo = 2L)
    assert(rows(StreamingSessions.liveSessionTable(spark, compacted,
      StreamingSessions.emptySessionTable(spark))) == batchTable,
      "compacted session store diverged")
    val ids = StreamingSessions.readSessionStore(spark, compacted)
      .select("batch_id").distinct().collect().map(_.getLong(0)).toSet
    assert(ids == Set(PartialStore.FoldedBatchId))

    // open-store compaction: the surviving latest rows are exactly the
    // open state the batch session table implies
    val compactedOpen = s"$base/compact/open"
    StreamingSessions.compactOpenStore(spark, open, compactedOpen, upTo = 2L)
    val openRows = rows(StreamingSessions.readOpenStore(spark, compactedOpen)
      .drop("batch_id").orderBy("user_id"))
    val wantOpen = rows(StreamingSessions.openStateOf(
      Sessions.sessionize(spark, sf)).orderBy("user_id"))
    assert(openRows == wantOpen, "compacted open state diverged from the batch table's")
  }

  test("a small first gap at the trigger boundary bridges the open session") {
    import spark.implicits._
    val base = graft.ops.Scratch.dir("sess_stream_bridge").toString
    val (sess, open) = (s"$base/sessions", s"$base/open")
    val t0 = Seq(StreamingSessions.SessionEvent(1L, 1L, 1000L, 500L)).toDS()
    val t1 = Seq(
      StreamingSessions.SessionEvent(2L, 1L, 2000L, 700L), // bridges (gap 1s)
      StreamingSessions.SessionEvent(3L, 1L, 2000L + gapMs + 1L, 300L), // new session
      StreamingSessions.SessionEvent(4L, 2L, 5000L, 100L)).toDS() // fresh user
    val reports = scala.collection.mutable.Map.empty[Long, Seq[Row]]
    StreamingSessions.admissionBatch(t0, 0L,
      StreamingSessions.emptyOpenState(spark), sess, open, gapMs,
      (df, id) => { reports(id) = rows(df); () })
    StreamingSessions.admissionBatch(t1, 1L,
      StreamingSessions.emptyOpenState(spark), sess, open, gapMs,
      (df, id) => { reports(id) = rows(df); () })
    assert(reports(0L) == Seq(Row(1L, 1L, 1L, 1000L, 1000L, 500L)))
    // trigger 1's changelog: the bridge partial lands under the OPEN
    // session's key (user 1, session 1) with only this batch's mass
    assert(reports(1L) == Seq(
      Row(1L, 1L, 1L, 2000L, 2000L, 700L),
      Row(1L, 2L, 1L, 2000L + gapMs + 1L, 2000L + gapMs + 1L, 300L),
      Row(2L, 1L, 1L, 5000L, 5000L, 100L)),
      "boundary gap did not bridge the open session")
    // ...and the fold merges it into the batch-equal session table
    assert(rows(StreamingSessions.liveSessionTable(spark, sess,
      StreamingSessions.emptySessionTable(spark))) == Seq(
      Row(1L, 1L, 2L, 1000L, 2000L, 1200L),
      Row(1L, 2L, 1L, 2000L + gapMs + 1L, 2000L + gapMs + 1L, 300L),
      Row(2L, 1L, 1L, 5000L, 5000L, 100L)))
  }

  test("a static history seeds the open state via openStateOf") {
    import spark.implicits._
    val base = graft.ops.Scratch.dir("sess_stream_hist").toString
    val (sess, open) = (s"$base/sessions", s"$base/open")
    val history = Seq((1L, 1L, 1L, 1000L, 1000L, 500L))
      .toDF("user_id", "session_idx", "n_events", "start_ms", "end_ms",
        "total_value_c2")
    var got: Seq[Row] = Seq.empty
    StreamingSessions.admissionBatch(
      Seq(StreamingSessions.SessionEvent(2L, 1L, 2000L, 700L)).toDS(), 0L,
      StreamingSessions.openStateOf(history), sess, open, gapMs,
      (df, _) => got = rows(df))
    assert(got == Seq(Row(1L, 1L, 1L, 2000L, 2000L, 700L)),
      "history-seeded open session did not bridge")
    assert(rows(StreamingSessions.liveSessionTable(spark, sess, history)) ==
      Seq(Row(1L, 1L, 2L, 1000L, 2000L, 1200L)))
  }
}
