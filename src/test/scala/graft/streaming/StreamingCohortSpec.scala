package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.ops.{Sessions, Tables}

/** Streaming retention monitoring: one-trigger equality with the oracled
  * batch triangle, per-trigger prefix reports, replay invisibility,
  * compaction transparency, and the cohort-re-derivation property (a late
  * batch carrying a user's earliest-ever day MOVES that user's cohort).
  */
class StreamingCohortSpec extends SparkSuite {

  private def userDayEvents = {
    import spark.implicits._
    Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), Sessions.dayIdx(spark, sf).as("day"))
      .as[StreamingCohort.UserDayEvent]
  }

  private def emptyDau: DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, Long, Long)].toDF("user_id", "day", "n")
  }

  private def rows(df: DataFrame): Seq[Row] = df.collect().toSeq

  test("one trigger over the full log reproduces the batch triangle exactly") {
    import spark.implicits._
    val store = graft.ops.Scratch.dir("cohort_stream_full").toString + "/dau"
    var got: Seq[Row] = Seq.empty
    StreamingCohort.admissionBatch(userDayEvents, 0L, emptyDau, store,
      (df, _) => got = rows(df))
    assert(got == rows(Sessions.cohortRetention(spark, sf)))
    assert(got.nonEmpty)
  }

  test("multi-trigger: prefix reports, replay invisible, compaction transparent") {
    import spark.implicits._
    val store = graft.ops.Scratch.dir("cohort_stream_multi").toString + "/dau"
    val all = userDayEvents.collect().sortBy(_.event_id)
    val cuts = Seq(all.length / 3, 2 * all.length / 3, all.length)
    val reports = scala.collection.mutable.Map.empty[Long, Seq[Row]]
    var lo = 0
    cuts.zipWithIndex.foreach { case (hi, i) =>
      StreamingCohort.admissionBatch(all.slice(lo, hi).toSeq.toDS(), i.toLong,
        emptyDau, store, (df, id) => { reports(id) = rows(df); () })
      lo = hi
    }
    cuts.zipWithIndex.foreach { case (hi, i) =>
      val prefixDau = all.take(hi).toSeq.toDS().toDF()
        .groupBy(col("user_id"), col("day")).agg(count(lit(1)).as("n"))
      assert(reports(i.toLong) == rows(Sessions.cohortOfDau(prefixDau)),
        s"trigger $i report drifted from its prefix")
    }
    assert(reports(2L) == rows(Sessions.cohortRetention(spark, sf)))

    // replay the LAST trigger: report and store unchanged
    StreamingCohort.admissionBatch(
      all.slice(cuts(1), cuts(2)).toSeq.toDS(), 2L, emptyDau, store,
      (df, id) => { reports(id) = rows(df); () })
    assert(reports(2L) == rows(Sessions.cohortRetention(spark, sf)),
      "replay changed the report")
    val storedTotal = StreamingCohort.readDauStore(spark, store)
      .agg(sum(col("n"))).collect().head.getLong(0)
    assert(storedTotal == all.length.toLong, "replay changed the store")

    // compaction to a new dir: summed fold, probe-transparent
    val compacted = graft.ops.Scratch.dir("cohort_stream_compact").toString + "/dau"
    StreamingCohort.compactDauStore(spark, store, compacted, upTo = 2L)
    val mergedFromCompacted = StreamingCohort.readDauStore(spark, compacted)
      .groupBy(col("user_id"), col("day"))
      .agg(graft.ops.Exact.sumLong(col("n")).as("n"))
    assert(rows(Sessions.cohortOfDau(mergedFromCompacted)) ==
      rows(Sessions.cohortRetention(spark, sf)),
      "compacted store probe diverged")
    val ids = StreamingCohort.readDauStore(spark, compacted)
      .select("batch_id").distinct().collect().map(_.getLong(0)).toSet
    assert(ids == Set(PartialStore.FoldedBatchId))
  }

  test("the retention curve rides the streaming triangle unchanged") {
    // the monitor emits the triangle; the curve is a days²-bounded
    // composition over it — one trigger's report feeds the SAME curve
    // tail the batch operator uses, reproducing retention_curve exactly
    val store = graft.ops.Scratch.dir("cohort_stream_curve").toString + "/dau"
    var tri: DataFrame = null
    StreamingCohort.admissionBatch(userDayEvents, 0L, emptyDau, store,
      (df, _) => tri = df)
    assert(rows(Sessions.retentionCurveOfTriangle(tri)) ==
      rows(Sessions.retentionCurve(spark, sf)))
  }

  test("churn and stickiness ride the streaming DAU store unchanged") {
    // one DAU store, streaming, serves four families: the triangle (the
    // monitor's own report), the curve (test above), and — folded at
    // trigger time — the churn spans and the DAU/MAU engagement ratio
    val store = graft.ops.Scratch.dir("cohort_stream_ride").toString + "/dau"
    StreamingCohort.admissionBatch(userDayEvents, 0L, emptyDau, store,
      (_, _) => ())
    val userDays = StreamingCohort.readDauStore(spark, store)
      .select(col("user_id"), col("day")).distinct()
    val spans = userDays.groupBy(col("user_id"))
      .agg(min(col("day")).as("first_day"), max(col("day")).as("last_day"))
    assert(rows(Sessions.churnOfSpans(spans, horizonDays = 7L)) ==
      rows(Sessions.cohortChurn(spark, sf)))
    assert(rows(Sessions.stickinessOfDau(userDays, windowDays = 30)) ==
      rows(Sessions.userStickiness(spark, sf)))
  }

  test("a late batch carrying a user's earliest-ever day moves the cohort") {
    import spark.implicits._
    val store = graft.ops.Scratch.dir("cohort_stream_move").toString + "/dau"
    val t0 = Seq(StreamingCohort.UserDayEvent(1L, 1L, 10L)).toDS()
    val t1 = Seq(StreamingCohort.UserDayEvent(2L, 1L, 3L)).toDS()
    val reports = scala.collection.mutable.Map.empty[Long, Seq[(Long, Long, Long, Long)]]
    def toT(df: DataFrame) = df.collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    StreamingCohort.admissionBatch(t0, 0L, emptyDau, store,
      (df, id) => { reports(id) = toT(df); () })
    StreamingCohort.admissionBatch(t1, 1L, emptyDau, store,
      (df, id) => { reports(id) = toT(df); () })
    assert(reports(0L) == Seq((10L, 0L, 1L, 1L)), "trigger 0 cohort")
    // the day-3 arrival re-anchors the cohort: day 10 becomes offset 7
    assert(reports(1L) == Seq((3L, 0L, 1L, 1L), (3L, 7L, 1L, 1L)),
      "late earliest day did not move the cohort")
  }
}
