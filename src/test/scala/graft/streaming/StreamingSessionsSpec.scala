package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.ops.{Exact, Sessions, Tables}

/** Streaming sessionization: one-trigger equality with the oracled batch
  * session table, per-trigger prefix reports with a verified cross-trigger
  * bridge, a deterministic forced-bridge split, replay invisibility, and
  * compaction transparency under the multi-column session fold.
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

  private def emptySessions: DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, Long, Long, Long, Long, Long)]
      .toDF("user_id", "session_idx", "n_events", "start_ms", "end_ms",
        "total_value_c2")
  }

  private def rows(df: DataFrame): Seq[Row] = df.collect().toSeq

  test("one trigger over the full log reproduces the batch session table") {
    val store = graft.ops.Scratch.dir("sess_stream_full").toString + "/sessions"
    var got: Seq[Row] = Seq.empty
    StreamingSessions.admissionBatch(sessionEvents, 0L, emptySessions, store,
      gapMs, (df, _) => got = rows(df))
    assert(got == rows(Sessions.sessionize(spark, sf)))
    assert(got.nonEmpty)
  }

  test("multi-trigger: prefix reports, bridge occurs, replay invisible, compaction transparent") {
    import spark.implicits._
    val store = graft.ops.Scratch.dir("sess_stream_multi").toString + "/sessions"
    val all = sessionEvents.collect().sortBy(_.event_id)
    val cuts = Seq(all.length / 3, 2 * all.length / 3, all.length)
    val reports = scala.collection.mutable.Map.empty[Long, Seq[Row]]
    var lo = 0
    cuts.zipWithIndex.foreach { case (hi, i) =>
      StreamingSessions.admissionBatch(all.slice(lo, hi).toSeq.toDS(), i.toLong,
        emptySessions, store, gapMs, (df, id) => { reports(id) = rows(df); () })
      lo = hi
    }
    cuts.zipWithIndex.foreach { case (hi, i) =>
      val prefix = all.take(hi).toSeq.toDS().toDF()
      assert(reports(i.toLong) ==
        rows(Sessions.sessionsOf(prefix, gapMs).orderBy("user_id", "session_idx")),
        s"trigger $i report drifted from its prefix")
    }
    val batchTable = rows(Sessions.sessionize(spark, sf))
    assert(reports(2L) == batchTable)

    // the cuts must have split at least one session mid-stream: a bridged
    // session has partials under the same key in two partitions, so the
    // store holds MORE partial rows than the final table has sessions
    val partialRows = StreamingSessions.readSessionStore(spark, store).count()
    assert(partialRows > batchTable.length.toLong,
      "no session bridged a trigger boundary — move the cuts so the bridge path is exercised")

    // replay the LAST trigger: report and store unchanged
    StreamingSessions.admissionBatch(
      all.slice(cuts(1), cuts(2)).toSeq.toDS(), 2L, emptySessions, store,
      gapMs, (df, id) => { reports(id) = rows(df); () })
    assert(reports(2L) == batchTable, "replay changed the report")
    val storedEvents = StreamingSessions.readSessionStore(spark, store)
      .agg(sum(col("n_events"))).collect().head.getLong(0)
    assert(storedEvents == all.length.toLong, "replay changed the store")

    // compaction to a new dir: session fold, probe-transparent
    val compacted = graft.ops.Scratch.dir("sess_stream_compact").toString + "/sessions"
    StreamingSessions.compactSessionStore(spark, store, compacted, upTo = 2L)
    val fromCompacted = StreamingSessions.foldSessions(
      StreamingSessions.readSessionStore(spark, compacted).drop("batch_id"))
    assert(rows(fromCompacted.orderBy("user_id", "session_idx")) == batchTable,
      "compacted store probe diverged")
    val ids = StreamingSessions.readSessionStore(spark, compacted)
      .select("batch_id").distinct().collect().map(_.getLong(0)).toSet
    assert(ids == Set(PartialStore.FoldedBatchId))
  }

  test("a small first gap at the trigger boundary bridges the open session") {
    import spark.implicits._
    val store = graft.ops.Scratch.dir("sess_stream_bridge").toString + "/sessions"
    val t0 = Seq(StreamingSessions.SessionEvent(1L, 1L, 1000L, 500L)).toDS()
    val t1 = Seq(
      StreamingSessions.SessionEvent(2L, 1L, 2000L, 700L), // bridges (gap 1s)
      StreamingSessions.SessionEvent(3L, 1L, 2000L + gapMs + 1L, 300L), // new session
      StreamingSessions.SessionEvent(4L, 2L, 5000L, 100L)).toDS() // fresh user
    val reports = scala.collection.mutable.Map.empty[Long, Seq[Row]]
    StreamingSessions.admissionBatch(t0, 0L, emptySessions, store, gapMs,
      (df, id) => { reports(id) = rows(df); () })
    StreamingSessions.admissionBatch(t1, 1L, emptySessions, store, gapMs,
      (df, id) => { reports(id) = rows(df); () })
    assert(reports(0L) == Seq(Row(1L, 1L, 1L, 1000L, 1000L, 500L)))
    assert(reports(1L) == Seq(
      Row(1L, 1L, 2L, 1000L, 2000L, 1200L),
      Row(1L, 2L, 1L, 2000L + gapMs + 1L, 2000L + gapMs + 1L, 300L),
      Row(2L, 1L, 1L, 5000L, 5000L, 100L)),
      "boundary gap did not bridge the open session")
  }
}
