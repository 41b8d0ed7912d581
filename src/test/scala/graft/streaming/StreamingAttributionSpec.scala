package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.ops.{Sessions, Tables, Temporal}

/** Streaming multi-touch attribution: one-trigger equality with all THREE
  * oracled batch credit schemes, per-trigger prefix reports, a forced
  * cross-boundary credit (touch in one trigger, purchase in the next),
  * replay invisibility, compaction transparency on BOTH stores (summed
  * aggregate + LWW packed tail), and the touched-users-only tail bound.
  */
class StreamingAttributionSpec extends SparkSuite {

  private val W = 7L * 86400000L
  private val HL = 86400000L

  private def attrEvents = {
    import spark.implicits._
    Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"),
        Sessions.msFloor(spark, sf).as("ms"))
  }

  private def rows(df: DataFrame): Seq[Row] = df.collect().toSeq

  /** The batch readout over an arbitrary event frame — the prefix oracle. */
  private def batchReadout(ev: DataFrame,
      readout: DataFrame => DataFrame): Seq[Row] =
    rows(readout(Temporal.touchWindowJoin(Temporal.attrPurchasesOf(ev),
      Temporal.attrTouchesOf(ev), W)).orderBy("touch_type"))

  private val schemes: Seq[(String, DataFrame => DataFrame, String => DataFrame)] = Seq(
    ("linear", Temporal.linearReadout, (d: String) => Temporal.touchAttribution(spark, d, W)),
    ("position", Temporal.positionReadout, (d: String) => Temporal.positionAttribution(spark, d, W)),
    ("decay", Temporal.decayReadout(HL), (d: String) => Temporal.decayAttribution(spark, d, W, HL)))

  test("one trigger over the full log reproduces all three batch schemes exactly") {
    import spark.implicits._
    val all = attrEvents.orderBy("event_id")
      .select("user_id", "event_id", "event_type", "ms")
      .as[StreamingAttribution.AttrEvent]
    schemes.foreach { case (name, readout, batchTwin) =>
      val base = graft.ops.Scratch.dir(s"attr_stream_full_$name").toString
      var got: Seq[Row] = Seq.empty
      StreamingAttribution.admissionBatch(all, 0L,
        StreamingAttribution.emptyTailTable(spark),
        StreamingAttribution.emptyAggTable(spark),
        base + "/tail", base + "/agg", W, readout,
        (df, _) => got = rows(df))
      assert(got == rows(batchTwin(sf)), s"scheme $name diverged from batch")
      assert(got.map(_.getLong(3)).exists(_ > 0L), s"scheme $name credited nothing")
    }
  }

  test("multi-trigger: prefix reports, replay invisible, compaction transparent, tail bounded") {
    import spark.implicits._
    val base = graft.ops.Scratch.dir("attr_stream_multi").toString
    val (tailDir, aggDir) = (base + "/tail", base + "/agg")
    val all = attrEvents.collect()
      .map(r => (r.getLong(0), StreamingAttribution.AttrEvent(
        r.getLong(1), r.getLong(0), r.getString(2), r.getLong(3))))
      .sortBy(_._1).map(_._2)
    val cuts = Seq(all.length / 3, 2 * all.length / 3, all.length)
    val reports = scala.collection.mutable.Map.empty[Long, Seq[Row]]
    def run(lo: Int, hi: Int, id: Long): Unit =
      StreamingAttribution.admissionBatch(all.slice(lo, hi).toSeq.toDS(), id,
        StreamingAttribution.emptyTailTable(spark),
        StreamingAttribution.emptyAggTable(spark),
        tailDir, aggDir, W, Temporal.linearReadout,
        (df, bid) => { reports(bid) = rows(df); () })
    var lo = 0
    cuts.zipWithIndex.foreach { case (hi, i) => run(lo, hi, i.toLong); lo = hi }
    cuts.zipWithIndex.foreach { case (hi, i) =>
      val prefix = all.take(hi).toSeq.toDS().toDF()
        .select(col("user_id"), col("event_id"), col("event_type"), col("ms"))
      assert(reports(i.toLong) == batchReadout(prefix, Temporal.linearReadout),
        s"trigger $i report drifted from its prefix")
    }
    val batchAttr = rows(Temporal.touchAttribution(spark, sf, W))
    assert(reports(2L) == batchAttr)

    // touched-users-only, exactly: one packed row per (trigger, user the
    // trigger TOUCHED) — purchases alone never write a tail row
    val touchTypes = Set("signup", "view", "click")
    val expectTailRows = cuts.zip(0 +: cuts).map { case (hi, lo2) =>
      all.slice(lo2, hi).filter(e => touchTypes(e.event_type))
        .map(_.user_id).distinct.size.toLong
    }.sum
    val tailRows = StreamingAttribution.readTailStore(spark, tailDir)
    assert(tailRows.count() == expectTailRows,
      "tail store rows != sum of per-trigger touched users — touched-only write is not filtering")

    // replay the LAST trigger: report and both stores unchanged
    val beforeTail = rows(tailRows.orderBy("user_id", "batch_id"))
    val beforeAgg = rows(StreamingAttribution.readAggStore(spark, aggDir)
      .orderBy("touch_type", "batch_id"))
    run(cuts(1), cuts(2), 2L)
    assert(reports(2L) == batchAttr, "replay changed the report")
    assert(rows(StreamingAttribution.readTailStore(spark, tailDir)
      .orderBy("user_id", "batch_id")) == beforeTail, "replay changed the tail store")
    assert(rows(StreamingAttribution.readAggStore(spark, aggDir)
      .orderBy("touch_type", "batch_id")) == beforeAgg, "replay changed the agg store")

    // compaction to new dirs: summed fold + latest-per-user fold, both
    // probe-transparent — the compacted stores' live readout is the batch
    val cTail = base + "/tail_c"
    val cAgg = base + "/agg_c"
    StreamingAttribution.compactTailStore(spark, tailDir, cTail, upTo = 2L)
    StreamingAttribution.compactAggStore(spark, aggDir, cAgg, upTo = 2L)
    val foldedTail = StreamingAttribution.readTailStore(spark, cTail)
    assert(foldedTail.select("batch_id").distinct().collect()
      .map(_.getLong(0)).toSet == Set(PartialStore.FoldedBatchId))
    assert(foldedTail.count() == foldedTail.select("user_id").distinct().count(),
      "tail compaction kept more than one row per user")
    val foldedAgg = StreamingAttribution.readAggStore(spark, cAgg)
    assert(rows(StreamingAttribution.liveReadout(foldedAgg.drop("batch_id")))
      == batchAttr, "compacted agg readout diverged")
    // and a post-compaction trigger over the compacted stores still agrees
    // with the full-log batch recompute extended by the same events
    val extra = Seq(
      StreamingAttribution.AttrEvent(all.head.user_id, Long.MaxValue - 1L,
        "purchase", all.map(_.ms).max + 1000L))
    var post: Seq[Row] = Seq.empty
    StreamingAttribution.admissionBatch(extra.toDS(), 3L,
      StreamingAttribution.emptyTailTable(spark),
      StreamingAttribution.emptyAggTable(spark),
      cTail, cAgg, W, Temporal.linearReadout,
      (df, _) => post = rows(df))
    val extended = (all.map(e => (e.user_id, e.event_id, e.event_type, e.ms)) ++
      extra.map(e => (e.user_id, e.event_id, e.event_type, e.ms))).toSeq
    assert(post == batchReadout(
      extended.toDF("user_id", "event_id", "event_type", "ms"),
      Temporal.linearReadout), "post-compaction trigger diverged")
  }

  test("a cross-boundary credit lands; a slid-out touch does not") {
    import spark.implicits._
    val base = graft.ops.Scratch.dir("attr_stream_bridge").toString
    val (tailDir, aggDir) = (base + "/tail", base + "/agg")
    // trigger 0: user 1 clicks at 1000 and views at W+3000 (the click is
    // OUTSIDE the view's trailing window, so the slide drops it);
    // user 2 views at 500
    val t0 = Seq(
      StreamingAttribution.AttrEvent(1L, 1L, "click", 1000L),
      StreamingAttribution.AttrEvent(1L, 2L, "view", W + 3000L),
      StreamingAttribution.AttrEvent(2L, 3L, "view", 500L)).toDS()
    // trigger 1: user 1 purchases at W+4000 — only the view is in-window
    // AND in the tail; the slid-out click must not credit
    val t1 = Seq(
      StreamingAttribution.AttrEvent(1L, 4L, "purchase", W + 4000L)).toDS()
    val reports = scala.collection.mutable.Map.empty[Long, Map[String, (Long, Long, Long)]]
    def toMap(df: DataFrame) = df.collect().toSeq
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    def run(ds: org.apache.spark.sql.Dataset[StreamingAttribution.AttrEvent],
        id: Long): Unit =
      StreamingAttribution.admissionBatch(ds, id,
        StreamingAttribution.emptyTailTable(spark),
        StreamingAttribution.emptyAggTable(spark),
        tailDir, aggDir, W, Temporal.linearReadout,
        (df, bid) => { reports(bid) = toMap(df); () })
    run(t0, 0L)
    run(t1, 1L)
    assert(reports(0L).isEmpty, "no purchase yet, nothing to credit")
    assert(reports(1L) == Map("view" -> ((1L, 1L, 1000000L))),
      s"cross-boundary view must take the full credit: ${reports(1L)}")
  }
}
