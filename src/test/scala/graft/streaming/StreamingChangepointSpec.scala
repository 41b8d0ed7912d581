package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.ops.{Exact, Sessions, Tables, Temporal}

/** Streaming CUSUM monitoring: one-trigger equality with the oracled batch
  * estimator, cross-trigger convergence to the full-log report, replay
  * invisibility, and compaction transparency.
  */
class StreamingChangepointSpec extends SparkSuite {

  private def dayEvents = {
    import spark.implicits._
    Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"),
        Sessions.dayIdx(spark, sf).as("day"), Exact.c2(col("value")).as("value_c2"))
      .as[StreamingChangepoint.DayValueEvent]
  }

  private def emptyDailies: DataFrame = {
    import spark.implicits._
    Seq.empty[(String, Long, Long)].toDF("event_type", "day", "c2")
  }

  private def rows(df: DataFrame): Seq[Row] = df.collect().toSeq

  test("one trigger over the full log reproduces the batch estimator exactly") {
    import spark.implicits._
    val store = graft.ops.Scratch.dir("cp_stream_full").toString + "/daily"
    var got: Seq[Row] = Seq.empty
    StreamingChangepoint.admissionBatch(dayEvents, 0L, emptyDailies, store,
      (df, _) => got = rows(df))
    assert(got == rows(Temporal.eventChangepoint(spark, sf)))
    assert(got.nonEmpty)
  }

  test("the forecast backtest rides the streaming daily store unchanged") {
    // the monitor's store IS the evdaily summary: folding it and feeding
    // the forecast tail reproduces the batch backtest — one daily store,
    // streaming, serves the changepoint AND forecast families
    val store = graft.ops.Scratch.dir("cp_stream_forecast").toString + "/daily"
    StreamingChangepoint.admissionBatch(dayEvents, 0L, emptyDailies, store,
      (_, _) => ())
    val daily = StreamingChangepoint.readDailyStore(spark, store)
      .groupBy(col("event_type"), col("day"))
      .agg(Exact.sumLong(col("c2")).as("day_c2"))
    assert(rows(Temporal.forecastOfDaily(daily)) ==
      rows(Temporal.seasonalForecast(spark, sf)))
  }

  test("multi-trigger run converges to the full-log report; replay invisible; compaction transparent") {
    import spark.implicits._
    val store = graft.ops.Scratch.dir("cp_stream_multi").toString + "/daily"
    val all = dayEvents.collect().sortBy(_.event_id)
    val cuts = Seq(all.length / 3, 2 * all.length / 3, all.length)
    val reports = scala.collection.mutable.Map.empty[Long, Seq[Row]]
    var lo = 0
    cuts.zipWithIndex.foreach { case (hi, i) =>
      StreamingChangepoint.admissionBatch(all.slice(lo, hi).toSeq.toDS(), i.toLong,
        emptyDailies, store, (df, id) => { reports(id) = rows(df); () })
      lo = hi
    }
    // each trigger's report equals the batch estimator over the prefix it saw
    lo = 0
    cuts.zipWithIndex.foreach { case (hi, i) =>
      val prefixDaily = all.take(hi).toSeq.toDS().toDF()
        .groupBy(col("event_type"), col("day"))
        .agg(Exact.sumLong(col("value_c2")).as("day_c2"))
      assert(reports(i.toLong) == rows(Temporal.changepointOfDaily(prefixDaily)),
        s"trigger $i report drifted from its prefix")
      lo = hi
    }
    // the final trigger saw everything: equality with the full-log batch op
    assert(reports(2L) == rows(Temporal.eventChangepoint(spark, sf)))

    // replaying the LAST trigger leaves report and store unchanged
    StreamingChangepoint.admissionBatch(
      all.slice(cuts(1), cuts(2)).toSeq.toDS(), 2L, emptyDailies, store,
      (df, id) => { reports(id) = rows(df); () })
    assert(reports(2L) == rows(Temporal.eventChangepoint(spark, sf)),
      "replay changed the report")
    val storedTotal = StreamingChangepoint.readDailyStore(spark, store)
      .agg(sum(col("c2"))).collect().head.getLong(0)
    assert(storedTotal == all.map(_.value_c2).sum, "replay changed the store")

    // compaction to a new dir: summed fold, probe-transparent
    val compacted = graft.ops.Scratch.dir("cp_stream_compact").toString + "/daily"
    StreamingChangepoint.compactDailyStore(spark, store, compacted, upTo = 2L)
    val mergedFromCompacted = StreamingChangepoint.readDailyStore(spark, compacted)
      .groupBy(col("event_type"), col("day"))
      .agg(Exact.sumLong(col("c2")).as("day_c2"))
    assert(rows(Temporal.changepointOfDaily(mergedFromCompacted)) ==
      rows(Temporal.eventChangepoint(spark, sf)),
      "compacted store probe diverged")
    // and the fold really shrank to one partition's worth of rows
    val ids = StreamingChangepoint.readDailyStore(spark, compacted)
      .select("batch_id").distinct().collect().map(_.getLong(0)).toSet
    assert(ids == Set(PartialStore.FoldedBatchId))
  }
}
