package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSuite
import graft.streaming.StreamingMv.Delta

class StreamingMvSpec extends SparkSuite {

  test("maintain: folds signed deltas, tombstones fully-retracted keys, revives on re-insert") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Delta]
    val q = StreamingMv.maintain(mem.toDS()).writeStream
      .outputMode(OutputMode.Update).format("memory").queryName("mv_out").start()

    // memory sink accumulates across batches; later asserts use contains
    def batch(): Map[String, (Long, Long, Boolean)] =
      spark.table("mv_out").collect()
        .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getBoolean(3))))
        .toMap

    // batch 1: two inserts for k1, one for k2
    mem.addData(Delta("k1", 1L, 100L), Delta("k1", 1L, 250L), Delta("k2", 1L, 40L))
    q.processAllAvailable()
    val out = batch()
    assert(out("k1") == ((2L, 350L, false)))
    assert(out("k2") == ((1L, 40L, false)))

    // batch 2: retract one k1 order, fully retract k2 -> tombstone
    mem.addData(Delta("k1", -1L, -100L), Delta("k2", -1L, -40L))
    q.processAllAvailable()
    val rows2 = spark.table("mv_out").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(rows2.contains(("k1", 1L, 250L, false)))
    assert(rows2.contains(("k2", 0L, 0L, true)))

    // batch 3: k2 re-inserts from scratch (state was freed); a MODIFY on k1
    // arrives as retract+insert in one batch and nets out
    mem.addData(Delta("k2", 1L, 77L), Delta("k1", -1L, -250L), Delta("k1", 1L, 300L))
    q.processAllAvailable()
    val rows3 = spark.table("mv_out").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(rows3.contains(("k2", 1L, 77L, false)))
    assert(rows3.contains(("k1", 1L, 300L, false)))

    // a retraction for a never-seen key emits nothing
    mem.addData(Delta("k9", -1L, -5L))
    q.processAllAvailable()
    val rows4 = spark.table("mv_out").collect().map(_.getString(0))
    assert(!rows4.contains("k9"))

    // out-of-order CDC: k9's deficit was KEPT, so the late matching insert
    // nets to zero (no spurious row), and only a genuinely new insert
    // brings the key live — a clamped-to-zero state would instead emit
    // (1, 5) here and the view would run permanently high
    mem.addData(Delta("k9", 1L, 5L))
    q.processAllAvailable()
    assert(!spark.table("mv_out").collect().map(_.getString(0)).contains("k9"))
    mem.addData(Delta("k9", 1L, 9L))
    q.processAllAvailable()
    val rows5 = spark.table("mv_out").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(rows5.contains(("k9", 1L, 9L, false)))
    q.stop()
  }
}
