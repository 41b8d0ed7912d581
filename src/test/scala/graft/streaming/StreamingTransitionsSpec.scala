package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.ops.{Sessions, Tables}

/** Streaming transition monitoring — the composite-store battery: summed
  * pair partials + LWW last-type state, one-trigger equality with the
  * oracled batch matrix, prefix reports, a forced boundary pair, replay
  * invisibility, and compaction transparency under BOTH folds.
  */
class StreamingTransitionsSpec extends SparkSuite {

  private def typedEvents = {
    import spark.implicits._
    Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"))
      .as[StreamingTransitions.TypedEvent]
  }

  private def rows(df: DataFrame): Seq[Row] = df.collect().toSeq

  test("one trigger over the full log reproduces the batch matrix exactly") {
    val base = graft.ops.Scratch.dir("trans_stream_full").toString
    var got: Seq[Row] = Seq.empty
    StreamingTransitions.admissionBatch(typedEvents, 0L,
      s"$base/pairs", s"$base/last", (df, _) => got = rows(df))
    assert(got == rows(Sessions.eventTransitions(spark, sf)))
    assert(got.nonEmpty)
  }

  test("multi-trigger: prefix reports, replay invisible, both compactions transparent") {
    import spark.implicits._
    val base = graft.ops.Scratch.dir("trans_stream_multi").toString
    val (pairsDir, lastDir) = (s"$base/pairs", s"$base/last")
    val all = typedEvents.collect().sortBy(_.event_id)
    val cuts = Seq(all.length / 3, 2 * all.length / 3, all.length)
    val reports = scala.collection.mutable.Map.empty[Long, Seq[Row]]
    var lo = 0
    cuts.zipWithIndex.foreach { case (hi, i) =>
      StreamingTransitions.admissionBatch(all.slice(lo, hi).toSeq.toDS(),
        i.toLong, pairsDir, lastDir, (df, id) => { reports(id) = rows(df); () })
      lo = hi
    }
    cuts.zipWithIndex.foreach { case (hi, i) =>
      val prefix = all.take(hi).toSeq.toDS().toDF()
      assert(reports(i.toLong) ==
        rows(Sessions.transitionsOfPairs(Sessions.pairCounts(prefix))),
        s"trigger $i report drifted from its prefix")
    }
    val batchMatrix = rows(Sessions.eventTransitions(spark, sf))
    assert(reports(2L) == batchMatrix)

    // pair conservation: the stored partials sum to the full log's pair
    // count (every boundary pair was counted exactly once)
    val storedN = StreamingTransitions.readPairStore(spark, pairsDir)
      .agg(sum(col("n"))).collect().head.getLong(0)
    val fullN = Sessions.pairCounts(all.toSeq.toDS().toDF())
      .agg(sum(col("n"))).collect().head.getLong(0)
    assert(storedN == fullN, "a boundary pair was lost or double-counted")

    // replay the LAST trigger: report and both stores unchanged
    val pairsBefore = rows(StreamingTransitions.readPairStore(spark, pairsDir)
      .orderBy("prev_type", "next_type", "batch_id"))
    val lastBefore = rows(StreamingTransitions.readLastStore(spark, lastDir)
      .orderBy("user_id", "batch_id"))
    StreamingTransitions.admissionBatch(
      all.slice(cuts(1), cuts(2)).toSeq.toDS(), 2L, pairsDir, lastDir,
      (df, id) => { reports(id) = rows(df); () })
    assert(reports(2L) == batchMatrix, "replay changed the report")
    assert(rows(StreamingTransitions.readPairStore(spark, pairsDir)
      .orderBy("prev_type", "next_type", "batch_id")) == pairsBefore)
    assert(rows(StreamingTransitions.readLastStore(spark, lastDir)
      .orderBy("user_id", "batch_id")) == lastBefore)

    // compact BOTH stores to new dirs; a further trigger over empty input
    // must still report the batch matrix from the compacted stores
    val (cp, cl) = (s"$base/pairs2", s"$base/last2")
    StreamingTransitions.compactPairStore(spark, pairsDir, cp, upTo = 2L)
    StreamingTransitions.compactLastStore(spark, lastDir, cl, upTo = 2L)
    val compactedPairs = StreamingTransitions.readPairStore(spark, cp)
    assert(compactedPairs.select("batch_id").distinct().collect()
      .map(_.getLong(0)).toSet == Set(PartialStore.FoldedBatchId))
    val lastCompacted = StreamingTransitions.readLastStore(spark, cl)
    assert(lastCompacted.count() ==
      lastCompacted.select("user_id").distinct().count(),
      "LWW compaction kept more than one row per user")
    var afterCompact: Seq[Row] = Seq.empty
    StreamingTransitions.admissionBatch(
      Seq.empty[StreamingTransitions.TypedEvent].toDS(), 3L, cp, cl,
      (df, _) => afterCompact = rows(df))
    assert(afterCompact == batchMatrix, "compacted stores diverged")
  }

  test("a trigger boundary pair is counted exactly once") {
    import spark.implicits._
    val base = graft.ops.Scratch.dir("trans_stream_bpair").toString
    val (pairsDir, lastDir) = (s"$base/pairs", s"$base/last")
    val t0 = Seq(StreamingTransitions.TypedEvent(1L, 1L, "a")).toDS()
    val t1 = Seq(StreamingTransitions.TypedEvent(2L, 1L, "b"),
      StreamingTransitions.TypedEvent(3L, 2L, "c")).toDS() // fresh user: no pair
    val reports = scala.collection.mutable.Map.empty[Long, Seq[(String, String, Long)]]
    def toT(df: DataFrame) = df.collect().toSeq
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    StreamingTransitions.admissionBatch(t0, 0L, pairsDir, lastDir,
      (df, id) => { reports(id) = toT(df); () })
    StreamingTransitions.admissionBatch(t1, 1L, pairsDir, lastDir,
      (df, id) => { reports(id) = toT(df); () })
    assert(reports(0L) == Seq.empty, "a single event produced a pair")
    assert(reports(1L) == Seq(("a", "b", 1L)),
      "the boundary pair was missed, doubled, or a fresh user produced one")
  }
}
