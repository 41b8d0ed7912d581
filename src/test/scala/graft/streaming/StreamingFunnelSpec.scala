package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.ops.{Sessions, Tables, Temporal}

/** Streaming windowed funnel: one-trigger equality with the oracled batch
  * funnel, per-trigger prefix reports, a forced cross-boundary conversion,
  * replay invisibility, compaction transparency under the last-writer-wins
  * fold, and the changed-users-only store bound.
  */
class StreamingFunnelSpec extends SparkSuite {

  private val W = 7L * 86400000L

  private def funnelEvents = {
    import spark.implicits._
    Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"),
        Sessions.msFloor(spark, sf).as("ms"))
  }

  private def rows(df: DataFrame): Seq[Row] = df.collect().toSeq

  test("one trigger over the full log reproduces the batch funnel exactly") {
    import spark.implicits._
    val store = graft.ops.Scratch.dir("funnel_stream_full").toString + "/state"
    var got: Seq[Row] = Seq.empty
    val all = funnelEvents.orderBy("event_id")
      .select("user_id", "event_type", "ms").as[StreamingFunnel.FunnelEvent]
    StreamingFunnel.admissionBatch(all, 0L,
      StreamingFunnel.emptyStateTable(spark), store, W,
      (df, _) => got = rows(df))
    assert(got == rows(Temporal.funnelWindowed(spark, sf)))
    assert(got.map(_.getLong(2)).exists(_ > 0L))
  }

  test("multi-trigger: prefix reports, replay invisible, compaction transparent, store bounded") {
    import spark.implicits._
    val store = graft.ops.Scratch.dir("funnel_stream_multi").toString + "/state"
    val all = funnelEvents.collect()
      .map(r => (r.getLong(0), StreamingFunnel.FunnelEvent(r.getLong(1), r.getString(2), r.getLong(3))))
      .sortBy(_._1).map(_._2)
    val cuts = Seq(all.length / 3, 2 * all.length / 3, all.length)
    val reports = scala.collection.mutable.Map.empty[Long, Seq[Row]]
    var lo = 0
    cuts.zipWithIndex.foreach { case (hi, i) =>
      StreamingFunnel.admissionBatch(all.slice(lo, hi).toSeq.toDS(), i.toLong,
        StreamingFunnel.emptyStateTable(spark), store, W,
        (df, id) => { reports(id) = rows(df); () })
      lo = hi
    }
    cuts.zipWithIndex.foreach { case (hi, i) =>
      val prefix = all.take(hi).toSeq.toDS().toDF()
      assert(reports(i.toLong) ==
        rows(Temporal.funnelCountsOf(Temporal.stageTimes(prefix, W))),
        s"trigger $i report drifted from its prefix")
    }
    val batchFunnel = rows(Temporal.funnelWindowed(spark, sf))
    assert(reports(2L) == batchFunnel)

    // changed-users-only: the store holds at most one row per (user,
    // trigger) and strictly fewer rows than 3x the user universe unless
    // every user's ladder moved every trigger (it does not)
    val storeRows = StreamingFunnel.readStateStore(spark, store)
    val nUsers = storeRows.select("user_id").distinct().count()
    assert(storeRows.count() < 3 * nUsers,
      "store grew as users x triggers — changed-only write is not filtering")

    // replay the LAST trigger: report and store unchanged
    val before = rows(storeRows.orderBy("user_id", "batch_id"))
    StreamingFunnel.admissionBatch(
      all.slice(cuts(1), cuts(2)).toSeq.toDS(), 2L,
      StreamingFunnel.emptyStateTable(spark), store, W,
      (df, id) => { reports(id) = rows(df); () })
    assert(reports(2L) == batchFunnel, "replay changed the report")
    assert(rows(StreamingFunnel.readStateStore(spark, store)
      .orderBy("user_id", "batch_id")) == before, "replay changed the store")

    // compaction to a new dir: latest-per-user fold, probe-transparent
    val compacted = graft.ops.Scratch.dir("funnel_stream_compact").toString + "/state"
    StreamingFunnel.compactStateStore(spark, store, compacted, upTo = 2L)
    val latest = StreamingFunnel.readStateStore(spark, compacted)
    assert(latest.select("batch_id").distinct().collect()
      .map(_.getLong(0)).toSet == Set(PartialStore.FoldedBatchId))
    assert(latest.count() == latest.select("user_id").distinct().count(),
      "compaction kept more than one row per user")
    assert(rows(Temporal.funnelCountsOf(latest.drop("batch_id"))) == batchFunnel,
      "compacted store readout diverged")
  }

  test("a cross-boundary conversion advances the live ladder") {
    import spark.implicits._
    val store = graft.ops.Scratch.dir("funnel_stream_bridge").toString + "/state"
    val t0 = Seq(StreamingFunnel.FunnelEvent(1L, "signup", 1000L)).toDS()
    val t1 = Seq(
      StreamingFunnel.FunnelEvent(1L, "view", 2000L),       // in-window: stage 2
      StreamingFunnel.FunnelEvent(1L, "purchase", 2500L),   // skips click: no stage 4
      StreamingFunnel.FunnelEvent(2L, "view", 100L)).toDS() // never signed up
    val reports = scala.collection.mutable.Map.empty[Long, Seq[(Long, Long)]]
    def toCounts(df: DataFrame) = df.collect().toSeq.map(r => (r.getLong(0), r.getLong(2)))
    StreamingFunnel.admissionBatch(t0, 0L, StreamingFunnel.emptyStateTable(spark),
      store, W, (df, id) => { reports(id) = toCounts(df); () })
    StreamingFunnel.admissionBatch(t1, 1L, StreamingFunnel.emptyStateTable(spark),
      store, W, (df, id) => { reports(id) = toCounts(df); () })
    assert(reports(0L) == Seq((1L, 1L), (2L, 0L), (3L, 0L), (4L, 0L)))
    assert(reports(1L) == Seq((1L, 1L), (2L, 1L), (3L, 0L), (4L, 0L)),
      "the boundary-crossing view did not advance the ladder")
  }
}
