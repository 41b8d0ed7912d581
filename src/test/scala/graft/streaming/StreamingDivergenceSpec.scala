package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.ops.{Exact, Scoring, Tables}

/** Streaming divergence monitoring: one-trigger equality with the oracled
  * batch operator, per-trigger prefix reports, replay invisibility, and
  * compaction transparency.
  */
class StreamingDivergenceSpec extends SparkSuite {

  private def sourcedDocs = {
    import spark.implicits._
    Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("text"))
      .as[StreamingDivergence.SourcedDoc]
  }

  private def emptyCounts: DataFrame = {
    import spark.implicits._
    Seq.empty[(String, String, Long)].toDF("source", "tok", "c_st")
  }

  private def rows(df: DataFrame): Seq[Row] = df.collect().toSeq

  test("one trigger over the full corpus reproduces the batch operator exactly") {
    import spark.implicits._
    val store = graft.ops.Scratch.dir("div_stream_full").toString + "/counts"
    var got: Seq[Row] = Seq.empty
    StreamingDivergence.admissionBatch(sourcedDocs, 0L, emptyCounts, store,
      (df, _) => got = rows(df))
    assert(got == rows(Scoring.sourceDivergence(spark, sf)))
    assert(got.nonEmpty)
  }

  test("multi-trigger run: prefix reports, replay invisible, compaction transparent") {
    import spark.implicits._
    val store = graft.ops.Scratch.dir("div_stream_multi").toString + "/counts"
    val all = sourcedDocs.collect().sortBy(_.doc_id)
    val cuts = Seq(all.length / 3, 2 * all.length / 3, all.length)
    val reports = scala.collection.mutable.Map.empty[Long, Seq[Row]]
    var lo = 0
    cuts.zipWithIndex.foreach { case (hi, i) =>
      StreamingDivergence.admissionBatch(all.slice(lo, hi).toSeq.toDS(), i.toLong,
        emptyCounts, store, (df, id) => { reports(id) = rows(df); () })
      lo = hi
    }
    // each trigger's report equals the batch tail over the prefix it saw
    cuts.zipWithIndex.foreach { case (hi, i) =>
      val prefixCounts = Scoring.tokenCountsBySource(
        all.take(hi).toSeq.toDS().toDF())
      assert(reports(i.toLong) == rows(Scoring.divergenceOfCounts(prefixCounts)),
        s"trigger $i report drifted from its prefix")
    }
    // the final trigger saw everything: equality with the full-corpus op
    assert(reports(2L) == rows(Scoring.sourceDivergence(spark, sf)))

    // replaying the LAST trigger leaves report and store unchanged
    StreamingDivergence.admissionBatch(
      all.slice(cuts(1), cuts(2)).toSeq.toDS(), 2L, emptyCounts, store,
      (df, id) => { reports(id) = rows(df); () })
    assert(reports(2L) == rows(Scoring.sourceDivergence(spark, sf)),
      "replay changed the report")
    val storedTotal = StreamingDivergence.readCountStore(spark, store)
      .agg(sum(col("c_st"))).collect().head.getLong(0)
    val fullTotal = rows(Scoring.tokenCountsBySource(sourcedDocs.toDF())
      .agg(sum(col("c_st")))).head.getLong(0)
    assert(storedTotal == fullTotal, "replay changed the store")

    // compaction to a new dir: summed fold, probe-transparent
    val compacted = graft.ops.Scratch.dir("div_stream_compact").toString + "/counts"
    StreamingDivergence.compactCountStore(spark, store, compacted, upTo = 2L)
    val mergedFromCompacted = StreamingDivergence.readCountStore(spark, compacted)
      .groupBy(col("source"), col("tok"))
      .agg(Exact.sumLong(col("c_st")).as("c_st"))
    assert(rows(Scoring.divergenceOfCounts(mergedFromCompacted)) ==
      rows(Scoring.sourceDivergence(spark, sf)),
      "compacted store probe diverged")
    val ids = StreamingDivergence.readCountStore(spark, compacted)
      .select("batch_id").distinct().collect().map(_.getLong(0)).toSet
    assert(ids == Set(PartialStore.FoldedBatchId))
  }
}
