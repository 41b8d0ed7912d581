package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.ops.{Exact, Tables, Temporal}

/** Streaming anomaly admission: one-trigger equality with the oracled batch
  * detector, prefix-moment verdicts per trigger, replay invisibility, and
  * exact final-moment convergence.
  */
class StreamingAnomaliesSpec extends SparkSuite {

  private def valueEvents = {
    import spark.implicits._
    Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"), Exact.c2(col("value")).as("value_c2"))
      .as[StreamingAnomalies.ValueEvent]
  }

  private def emptyMoments: DataFrame = {
    import spark.implicits._
    Seq.empty[(String, Long, Long, Long)].toDF("event_type", "n", "s", "q")
  }

  test("one trigger over the full log reproduces the batch detector exactly") {
    import spark.implicits._
    val store = graft.ops.Scratch.dir("anom_stream_full").toString + "/moments"
    var got: Seq[(Long, String, Long, Long)] = Seq.empty
    StreamingAnomalies.admissionBatch(valueEvents, 0L, emptyMoments, store,
      (df, _) => got = df.collect().toSeq
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))))
    val batch = Temporal.eventAnomalies(spark, sf).collect().toSeq
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got == batch, "single-trigger stream diverged from the batch detector")
  }

  test("prefix-moment verdicts per trigger; final moments converge; replay invisible") {
    import spark.implicits._
    val store = graft.ops.Scratch.dir("anom_stream_multi").toString + "/moments"
    val all = valueEvents.collect().sortBy(_.event_id)
    val cuts = Seq(all.length / 4, all.length / 2, 3 * all.length / 4, all.length)
    val flagged = scala.collection.mutable.Map.empty[Long, Set[Long]]
    var lo = 0
    cuts.zipWithIndex.foreach { case (hi, i) =>
      StreamingAnomalies.admissionBatch(all.slice(lo, hi).toSeq.toDS(), i.toLong,
        emptyMoments, store,
        (df, id) => { flagged(id) = df.collect().map(_.getLong(0)).toSet; () })
      lo = hi
    }
    // driver-side prefix recompute: trigger i judges its rows under the
    // moments of events [0, cuts(i))
    lo = 0
    cuts.zipWithIndex.foreach { case (hi, i) =>
      val seen = all.take(hi)
      val stats = seen.groupBy(_.event_type).view.mapValues { rs =>
        (BigInt(rs.length), rs.map(r => BigInt(r.value_c2)).sum,
          rs.map(r => BigInt(r.value_c2) * BigInt(r.value_c2)).sum)
      }.toMap
      val expected = all.slice(lo, hi).filter { e =>
        val (n, s, q) = stats(e.event_type)
        val dev = n * BigInt(e.value_c2) - s
        dev * dev > 9 * (n * q - s * s)
      }.map(_.event_id).toSet
      assert(flagged(i.toLong) == expected, s"trigger $i verdicts drifted")
      lo = hi
    }
    // final store moments equal the full-log moments exactly
    val stored = StreamingAnomalies.readMomentsStore(spark, store)
      .groupBy(col("event_type"))
      .agg(sum(col("n")).as("n"), sum(col("s")).as("s"), sum(col("q")).as("q"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val full = all.groupBy(_.event_type).view.mapValues { rs =>
      (rs.length.toLong, rs.map(_.value_c2).sum, rs.map(r => r.value_c2 * r.value_c2).sum)
    }.toMap
    assert(stored == full, "store moments diverged from the full log")

    // replaying the LAST trigger leaves store and verdicts unchanged
    val before = flagged(3L)
    StreamingAnomalies.admissionBatch(
      all.slice(cuts(2), cuts(3)).toSeq.toDS(), 3L, emptyMoments, store,
      (df, id) => { flagged(id) = df.collect().map(_.getLong(0)).toSet; () })
    assert(flagged(3L) == before, "replay changed the verdicts")
    val stored2 = StreamingAnomalies.readMomentsStore(spark, store)
      .groupBy(col("event_type"))
      .agg(sum(col("n")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stored2.values.sum == all.length.toLong, "replay changed the store")
  }
}
