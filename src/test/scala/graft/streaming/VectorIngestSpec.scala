package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.SparkSuite
import graft.ops.Similarity

/** The CDC-driven vector-ingestion composition over the external ANN store:
  * INSERT probes + appends, MODIFY retires-and-readmits without
  * self-matching, REMOVE retires, within-trigger last-event-wins, replay
  * idempotent.
  */
class VectorIngestSpec extends SparkSuite {

  private def unit(i: Int): Array[Float] =
    Array.tabulate(64)(j => if (j == i) 1f else 0f)

  test("VectorIngest: full INSERT/MODIFY/REMOVE lifecycle over the external ANN store") {
    import spark.implicits._
    val store = graft.ops.Scratch.dir("vec_ingest").toString + "/idx"
    val corpus = (1L to 4L).map(i => StreamingAnn.Vec(i, unit(i.toInt)))
    val idx0 = Similarity.homeRowsOf(
      corpus.toDF("vec_id", "embedding"), nTables = 8, bits = 3).cache()
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Double)]
    val sink: (DataFrame, Long) => Unit = (df, _) =>
      buf.synchronized {
        buf ++= df.collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      }
    def run(batchId: Long, events: VectorIngest.VecEvent*): Unit =
      VectorIngest.ingestBatch(events.toDS(), batchId, idx0, store, sink,
        nTables = 8, bits = 3, probes = 2, k = 3, broadcastIdx = true)
    def liveIds = StreamingAnn.liveIndexStore(spark, store)
      .select("cid").distinct().collect().map(_.getLong(0)).toSet
    def exactHits(qid: Long) = buf.filter(v => v._1 == qid && math.abs(v._4 - 1.0) < 1e-9)
      .map(_._3).toSet

    // INSERT A; its exact copy A' then finds it at sim 1.0
    run(0L, VectorIngest.VecEvent(0L, 100L, "INSERT", unit(10)))
    assert(liveIds == Set(100L), s"batch-0 admit missing from store: $liveIds")
    run(1L, VectorIngest.VecEvent(0L, 200L, "INSERT", unit(10)))
    assert(exactHits(200L) == Set(100L), s"A' must find A: ${buf.toSeq}")
    assert(liveIds == Set(100L, 200L))

    // MODIFY A to an orthogonal direction: the probe must not contain A's
    // own previous version, and v1 leaves the index in the same trigger
    buf.clear()
    run(2L, VectorIngest.VecEvent(0L, 100L, "MODIFY", unit(20)))
    assert(!buf.exists(v => v._1 == 100L && v._3 == 100L),
      s"MODIFY self-matched its prior version: ${buf.toSeq}")
    assert(exactHits(100L).isEmpty, "nothing lives at unit(20) yet")
    assert(liveIds == Set(100L, 200L))

    // direction 10 now holds only A' (200); direction 20 holds A-v2 (100)
    buf.clear()
    run(3L, VectorIngest.VecEvent(0L, 300L, "INSERT", unit(10)),
      VectorIngest.VecEvent(1L, 400L, "INSERT", unit(20)))
    assert(exactHits(300L) == Set(200L), s"v1 ghost in direction 10: ${buf.toSeq}")
    assert(exactHits(400L) == Set(100L), s"v2 not found: ${buf.toSeq}")
    assert(liveIds == Set(100L, 200L, 300L, 400L))

    // REMOVE A' (200): direction 10 then serves only 300
    buf.clear()
    run(4L, VectorIngest.VecEvent(0L, 200L, "REMOVE", Array.empty[Float]))
    run(5L, VectorIngest.VecEvent(0L, 500L, "INSERT", unit(10)))
    assert(exactHits(500L) == Set(300L), s"removed vector ghost: ${buf.toSeq}")
    assert(liveIds == Set(100L, 300L, 400L, 500L))

    // within-trigger last-event-wins: INSERT then REMOVE leaves nothing
    buf.clear()
    run(6L, VectorIngest.VecEvent(0L, 600L, "INSERT", unit(30)),
      VectorIngest.VecEvent(1L, 600L, "REMOVE", Array.empty[Float]))
    assert(!buf.exists(_._1 == 600L), "REMOVE-last vector must not be probed")
    assert(liveIds == Set(100L, 300L, 400L, 500L))

    // REPLAY batch 5: identical verdicts, identical store state
    buf.clear()
    run(5L, VectorIngest.VecEvent(0L, 500L, "INSERT", unit(10)))
    assert(exactHits(500L) == Set(300L), "replayed trigger verdicts must be stable")
    assert(liveIds == Set(100L, 300L, 400L, 500L))
  }

  test("VectorIngest: CDC events retire STATIC initial-index vectors too") {
    import spark.implicits._
    val store = graft.ops.Scratch.dir("vec_ingest_init").toString + "/idx"
    val corpus = (1L to 4L).map(i => StreamingAnn.Vec(i, unit(i.toInt)))
    val idx0 = Similarity.homeRowsOf(
      corpus.toDF("vec_id", "embedding"), nTables = 8, bits = 3).cache()
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Double)]
    val sink: (DataFrame, Long) => Unit = (df, _) =>
      buf.synchronized {
        buf ++= df.collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      }
    def run(batchId: Long, events: VectorIngest.VecEvent*): Unit =
      VectorIngest.ingestBatch(events.toDS(), batchId, idx0, store, sink,
        nTables = 8, bits = 3, probes = 2, k = 3, broadcastIdx = true)
    def exactHits(qid: Long) = buf.filter(v => v._1 == qid && math.abs(v._4 - 1.0) < 1e-9)
      .map(_._3).toSet

    // static vector 1 is findable, as always
    run(0L, VectorIngest.VecEvent(0L, 700L, "INSERT", unit(1)))
    assert(exactHits(700L) == Set(1L), s"static vec must be found: ${buf.toSeq}")

    // MODIFY of the STATIC vector: its top-k must not contain its own
    // static prior version, and the retirement persists
    buf.clear()
    run(1L, VectorIngest.VecEvent(0L, 1L, "MODIFY", unit(31)))
    assert(!buf.exists(v => v._1 == 1L && v._3 == 1L),
      s"static MODIFY self-matched: ${buf.toSeq}")
    buf.clear()
    run(2L, VectorIngest.VecEvent(0L, 701L, "INSERT", unit(1)))
    assert(exactHits(701L) == Set(700L),
      s"retired static vector ghost in direction 1: ${buf.toSeq}")
    // ...while the replacement is live in its new direction
    buf.clear()
    run(3L, VectorIngest.VecEvent(0L, 702L, "INSERT", unit(31)))
    assert(exactHits(702L) == Set(1L), s"replacement not found: ${buf.toSeq}")

    // REMOVE of a static vector persists across triggers
    buf.clear()
    run(4L, VectorIngest.VecEvent(0L, 2L, "REMOVE", Array.empty[Float]))
    run(5L, VectorIngest.VecEvent(0L, 703L, "INSERT", unit(2)))
    assert(exactHits(703L).isEmpty, s"removed static vector ghost: ${buf.toSeq}")
  }

  test("property: random event sequences — live store equals a driver-side model") {
    import spark.implicits._
    // ANN admission has no accept/reject gate, so the store model is exact:
    // alive(id) = the id's last non-REMOVE event; REMOVE kills. Random
    // batched sequences exercise every interleaving the lifecycle spec
    // pins individually (fixed seeds — deterministic, no flakes).
    val idx0 = Similarity.homeRowsOf(
      Seq(StreamingAnn.Vec(1L, unit(1))).toDF("vec_id", "embedding"),
      nTables = 4, bits = 3).cache()
    for (seed <- Seq(7, 23)) {
      val rnd = new scala.util.Random(seed)
      val store = graft.ops.Scratch.dir(s"vec_ingest_prop_$seed").toString + "/idx"
      val alive = scala.collection.mutable.Set.empty[Long]
      var seq = 0L
      (0L until 5L).foreach { batchId =>
        val events = (0 until 8).map { _ =>
          val id = 100L + rnd.nextInt(6)
          val kind = rnd.nextInt(3) match {
            case 0 => "INSERT"
            case 1 => "MODIFY"
            case _ => "REMOVE"
          }
          seq += 1
          VectorIngest.VecEvent(seq, id, kind,
            if (kind == "REMOVE") Array.empty[Float] else unit(2 + rnd.nextInt(30)))
        }
        // model: last event per id wins within the batch
        events.groupBy(_.vec_id).foreach { case (id, evs) =>
          if (evs.maxBy(_.seq).event == "REMOVE") alive -= id else alive += id
        }
        VectorIngest.ingestBatch(events.toDS(), batchId, idx0, store,
          (_, _) => (), nTables = 4, bits = 3, probes = 1, k = 2,
          broadcastIdx = true)
        val live = StreamingAnn.liveIndexStore(spark, store)
          .select("cid").distinct().collect().map(_.getLong(0)).toSet
        assert(live == alive.toSet,
          s"seed $seed batch $batchId: store $live != model $alive")
      }
    }
  }
}
