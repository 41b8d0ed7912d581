package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.ops.{Sessions, Tables, Temporal}

/** Streaming lateness monitoring: one-trigger equality with the batch
  * profile, the fold-of-trigger-reports identity, and replay invisibility.
  */
class StreamingLatenessSpec extends SparkSuite {

  private def arrivals = {
    import spark.implicits._
    Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"),
        Sessions.msFloor(spark, sf).as("ms"))
      .as[StreamingLateness.ArrivingEvent]
  }

  private def emptyMax: DataFrame = {
    import spark.implicits._
    Seq.empty[(String, Long)].toDF("event_type", "max_ms")
  }

  private def rows(df: DataFrame): Seq[Row] = df.collect().toSeq

  private def batchProfile: Map[String, (Long, Long, Long, Long)] =
    Temporal.latenessProfile(spark, sf).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap

  test("one trigger over the full log reproduces the batch profile (sans ppm)") {
    import spark.implicits._
    val store = graft.ops.Scratch.dir("late_stream_full").toString + "/maxes"
    var got: Seq[Row] = Seq.empty
    StreamingLateness.admissionBatch(arrivals, 0L, emptyMax, store,
      (df, _) => got = rows(df))
    val want = batchProfile
    val gotMap = got.map(r => (r.getString(0),
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(gotMap == want)
    assert(gotMap.nonEmpty)
  }

  test("fold of per-trigger reports equals the batch profile; replay invisible") {
    import spark.implicits._
    val store = graft.ops.Scratch.dir("late_stream_multi").toString + "/maxes"
    val all = arrivals.collect().sortBy(_.event_id)
    val cuts = Seq(all.length / 3, 2 * all.length / 3, all.length)
    val reports = scala.collection.mutable.Map.empty[Long, Seq[Row]]
    var lo = 0
    cuts.zipWithIndex.foreach { case (hi, i) =>
      StreamingLateness.admissionBatch(all.slice(lo, hi).toSeq.toDS(), i.toLong,
        emptyMax, store, (df, id) => { reports(id) = rows(df); () })
      lo = hi
    }
    // fold: counts and sums add, maxes max — must equal the batch profile
    val folded = reports.values.flatten
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .groupBy(_._1).map { case (et, rs) =>
        val v = rs.map(_._2)
        (et, (v.map(_._1).sum, v.map(_._2).sum, v.map(_._3).max, v.map(_._4).sum))
      }
    assert(folded == batchProfile, "trigger-report fold diverged from the batch profile")

    // replaying the LAST trigger changes neither its report nor the store
    val before = reports(2L)
    StreamingLateness.admissionBatch(
      all.slice(cuts(1), cuts(2)).toSeq.toDS(), 2L, emptyMax, store,
      (df, id) => { reports(id) = rows(df); () })
    assert(reports(2L) == before, "replay changed the report")
    val storedMax = StreamingLateness.readMaxStore(spark, store)
      .groupBy(col("event_type")).agg(max(col("max_ms")).as("m"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val wantMax = all.groupBy(_.event_type).view.mapValues(_.map(_.ms).max).toMap
    assert(storedMax == wantMax, "replay changed the carried maxes")
  }
}
