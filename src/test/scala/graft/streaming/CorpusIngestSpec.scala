package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.SparkSuite

/** The CDC-driven corpus-ingestion composition: INSERT admits, MODIFY
  * retires-and-readmits in one trigger (no self-match), REMOVE retires,
  * within-trigger last-event-wins, and replay is idempotent end-to-end.
  */
class CorpusIngestSpec extends SparkSuite {

  private val textA = "the quick brown fox jumps over the lazy dog again and again until dawn breaks"
  private val textB = "completely rewritten second version describing entirely different subject matter now"

  test("CorpusIngest: full INSERT/MODIFY/REMOVE lifecycle over the external store") {
    import spark.implicits._
    val store = graft.ops.Scratch.dir("corpus_ingest").toString + "/idx"
    val indexSh = graft.ops.Dedup.shingles(
      Seq((900L, "entirely different static corpus content with no overlap at all here truly"))
        .toDF("doc_id", "text")).cache()
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    val sink: (DataFrame, Long) => Unit = (df, _) =>
      buf.synchronized {
        buf ++= df.collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      }
    def run(batchId: Long, events: CorpusIngest.DocEvent*): Unit =
      CorpusIngest.ingestBatch(events.toDS(), batchId, indexSh, store, sink, 500000L, 256)
    def verdicts = buf.map(r => r._1 -> ((r._2, r._4))).toMap
    def liveIds = StreamingDedup.liveIndexStore(spark, store)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet

    // INSERT 1 (novel) admits; INSERT 2 (near-copy) is rejected against it
    run(0L, CorpusIngest.DocEvent(0L, 1L, "INSERT", textA))
    run(1L, CorpusIngest.DocEvent(0L, 2L, "INSERT", textA + " with one extra tail"))
    assert(verdicts(1L) == ((-1L, 0L)) && verdicts(2L) == ((1L, 1L)), verdicts.toString)
    assert(liveIds == Set(1L))

    // MODIFY 1 to novel text B: must NOT self-match its own v1 (the
    // retire-first probe), and v1 leaves the index in the same trigger
    buf.clear()
    run(2L, CorpusIngest.DocEvent(0L, 1L, "MODIFY", textB))
    assert(verdicts(1L) == ((-1L, 0L)), s"MODIFY self-matched: ${verdicts(1L)}")
    assert(liveIds == Set(1L), "v2 must replace v1, not coexist")

    // a near-copy of the RETIRED v1 text is now novel (v1 gone, doc 2 was
    // never admitted); a near-copy of v2 matches doc 1 again
    buf.clear()
    run(3L, CorpusIngest.DocEvent(0L, 3L, "INSERT", textA + " with another tail"))
    run(4L, CorpusIngest.DocEvent(0L, 4L, "INSERT", textB + " plus a small suffix"))
    assert(verdicts(3L) == ((-1L, 0L)), s"retired v1 still matching: ${verdicts(3L)}")
    assert(verdicts(4L) == ((1L, 1L)), s"v2 must be findable: ${verdicts(4L)}")
    assert(liveIds == Set(1L, 3L))

    // REMOVE 1: its content stops matching from the next trigger on
    buf.clear()
    run(5L, CorpusIngest.DocEvent(0L, 1L, "REMOVE", ""))
    run(6L, CorpusIngest.DocEvent(0L, 5L, "INSERT", textB + " plus another suffix"))
    assert(verdicts(5L) == ((-1L, 0L)), s"removed doc still matching: ${verdicts(5L)}")
    assert(liveIds == Set(3L, 5L))

    // within-trigger last-event-wins: INSERT then REMOVE (higher seq) of a
    // new doc leaves nothing; REMOVE then INSERT admits
    buf.clear()
    run(7L,
      CorpusIngest.DocEvent(0L, 6L, "INSERT", "some wholly novel content never seen before anywhere"),
      CorpusIngest.DocEvent(1L, 6L, "REMOVE", ""),
      CorpusIngest.DocEvent(0L, 7L, "REMOVE", ""),
      CorpusIngest.DocEvent(1L, 7L, "INSERT", "other genuinely fresh material also never seen before"))
    assert(!verdicts.contains(6L), "REMOVE-last doc must not be probed")
    assert(verdicts(7L) == ((-1L, 0L)))
    assert(liveIds == Set(3L, 5L, 7L))

    // REPLAY batch 7 (restart-after-sink-failure): identical verdicts,
    // identical store state — every write was an overwrite of its own
    // partitions and the probe saw the pre-attempt state
    val before = buf.toSet
    val rowsBefore = StreamingDedup.readIndexStore(spark, store).count()
    buf.clear()
    run(7L,
      CorpusIngest.DocEvent(0L, 6L, "INSERT", "some wholly novel content never seen before anywhere"),
      CorpusIngest.DocEvent(1L, 6L, "REMOVE", ""),
      CorpusIngest.DocEvent(0L, 7L, "REMOVE", ""),
      CorpusIngest.DocEvent(1L, 7L, "INSERT", "other genuinely fresh material also never seen before"))
    assert(buf.toSet == before, "replayed trigger verdicts must be stable")
    assert(StreamingDedup.readIndexStore(spark, store).count() == rowsBefore,
      "replay changed the store")
    assert(liveIds == Set(3L, 5L, 7L))

    // compaction folds everything and preserves the live view exactly
    val compacted = graft.ops.Scratch.dir("corpus_ingest_c").toString + "/idx"
    val n = StreamingDedup.compactIndexStore(spark, store, compacted, upToBatchId = 7L)
    assert(n == StreamingDedup.liveIndexStore(spark, store).count())
    assert(StreamingDedup.liveIndexStore(spark, compacted)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet == Set(3L, 5L, 7L))
  }

  test("CorpusIngest: rejected upserts land in the NON-probing rejected lane") {
    import spark.implicits._
    val store = graft.ops.Scratch.dir("corpus_ingest_rej").toString + "/idx"
    val indexSh = graft.ops.Dedup.shingles(
      Seq((900L, "entirely different static corpus content with no overlap at all here truly"))
        .toDF("doc_id", "text")).cache()
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    val sink: (DataFrame, Long) => Unit = (df, _) =>
      buf.synchronized {
        buf ++= df.collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      }
    def run(batchId: Long, events: CorpusIngest.DocEvent*): Unit =
      CorpusIngest.ingestBatch(events.toDS(), batchId, indexSh, store, sink, 500000L, 256)
    def verdicts = buf.map(r => r._1 -> ((r._2, r._4))).toMap
    def liveIds = StreamingDedup.liveIndexStore(spark, store)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    def lane = CorpusIngest.readRejectedLane(spark, store)

    // both docs novel → admitted; the lane stays empty (and reads empty
    // with the store's shingle schema before any rejection commits)
    run(0L, CorpusIngest.DocEvent(0L, 1L, "INSERT", textA),
      CorpusIngest.DocEvent(1L, 2L, "INSERT", textB))
    assert(lane.count() == 0L)
    assert(lane.columns.toSeq == Seq("doc_id", "shingle", "batch_id"))

    // MODIFY doc 2 to a near-copy of doc 1's text: retire is unconditional,
    // admission refused → doc 2 has NO probing presence (the documented
    // consequence), but its content's lineage lands in the rejected lane
    buf.clear()
    run(1L, CorpusIngest.DocEvent(0L, 2L, "MODIFY", textA + " with one extra tail"))
    assert(verdicts(2L) == ((1L, 1L)), verdicts.toString)
    assert(liveIds == Set(1L), "rejected MODIFY must not keep index presence")
    assert(lane.filter("doc_id = 2 AND batch_id = 1").count() > 0,
      "rejected MODIFY's shingles missing from the lane")

    // replaying the trigger overwrites the lane partition, never doubles it
    val laneRows = lane.count()
    buf.clear()
    run(1L, CorpusIngest.DocEvent(0L, 2L, "MODIFY", textA + " with one extra tail"))
    assert(lane.count() == laneRows, "replay changed the rejected lane")
    assert(verdicts(2L) == ((1L, 1L)))

    // the lane is non-probing: a later near-copy of doc 2's rejected text
    // matches doc 1 (the live representative), never doc 2
    buf.clear()
    run(2L, CorpusIngest.DocEvent(0L, 3L, "INSERT", textA + " with another tail"))
    assert(verdicts(3L) == ((1L, 1L)), s"lane leaked into the probe: ${verdicts(3L)}")

    // the forensic gap the lane closes: REMOVE the matched doc and the
    // rejected content admits freely — but takedown queries still find
    // doc 2's shingles in the lane
    buf.clear()
    run(3L, CorpusIngest.DocEvent(0L, 1L, "REMOVE", ""))
    run(4L, CorpusIngest.DocEvent(0L, 4L, "INSERT", textA + " with a third tail"))
    assert(verdicts(4L)._2 == 0L, s"expected free admission: ${verdicts(4L)}")
    assert(lane.filter("doc_id = 2").count() > 0,
      "takedown lineage for the rejected content must survive")
  }

  test("IndexTombstones.compact clears a stale output tombstone subtree") {
    import spark.implicits._
    val store = graft.ops.Scratch.dir("corpus_ingest_stale").toString + "/idx"
    val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
    val sink: (DataFrame, Long) => Unit = (df, _) => { df.count(); () }
    val indexSh = graft.ops.Dedup.shingles(
      Seq((900L, "entirely different static corpus content with no overlap at all here truly"))
        .toDF("doc_id", "text")).cache()
    def run(batchId: Long, events: CorpusIngest.DocEvent*): Unit =
      CorpusIngest.ingestBatch(events.toDS(), batchId, indexSh, store, sink, 500000L, 256)
    run(0L, CorpusIngest.DocEvent(0L, 1L, "INSERT", textA))
    run(1L, CorpusIngest.DocEvent(0L, 2L, "INSERT", textB))

    // an earlier failed/different-fold attempt left tombstones under the
    // SAME outDir — killing doc 1 at a batch far past the fold point
    val out = graft.ops.Scratch.dir("corpus_ingest_stale_c").toString + "/idx"
    IndexTombstones.retire(spark, out, Seq(1L).toDF("doc_id"), "doc_id", 99L)
    assert(IndexTombstones.read(spark, out, "doc_id").count() == 1L)

    // this compaction carries NO tombstones — the stale subtree must be
    // cleared, not survive to phantom-delete doc 1
    val n = StreamingDedup.compactIndexStore(spark, store, out, upToBatchId = 1L)
    assert(n == StreamingDedup.readIndexStore(spark, store).count())
    assert(IndexTombstones.read(spark, out, "doc_id").count() == 0L,
      "stale tombstone subtree survived compaction")
    assert(StreamingDedup.liveIndexStore(spark, out)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet == Set(1L, 2L),
      "phantom delete applied to the compacted store")
    assert(buf.isEmpty) // silence unused warning
  }

  test("CorpusIngest: CDC events retire STATIC initial-index content too") {
    import spark.implicits._
    val store = graft.ops.Scratch.dir("corpus_ingest_init").toString + "/idx"
    val staticText = "entirely different static corpus content with no overlap at all here truly"
    val indexSh = graft.ops.Dedup.shingles(
      Seq((900L, staticText)).toDF("doc_id", "text")).cache()
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    val sink: (DataFrame, Long) => Unit = (df, _) =>
      buf.synchronized {
        buf ++= df.collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      }
    def run(batchId: Long, events: CorpusIngest.DocEvent*): Unit =
      CorpusIngest.ingestBatch(events.toDS(), batchId, indexSh, store, sink, 500000L, 256)
    def verdicts = buf.map(r => r._1 -> ((r._2, r._4))).toMap

    // the static doc blocks near-copy admission, as always
    run(0L, CorpusIngest.DocEvent(0L, 10L, "INSERT", staticText + " with a tail"))
    assert(verdicts(10L) == ((900L, 1L)), verdicts.toString)

    // MODIFY of the STATIC doc: must not self-match its own static
    // shingles (the round-15 review finding — the old preState only
    // tombstone-filtered the store side); replacement admitted
    buf.clear()
    run(1L, CorpusIngest.DocEvent(0L, 900L, "MODIFY", textB))
    assert(verdicts(900L) == ((-1L, 0L)),
      s"static MODIFY self-matched: ${verdicts(900L)}")

    // the retirement PERSISTS: a later trigger's near-copy of the old
    // static text is now novel, while the replacement text matches
    buf.clear()
    run(2L, CorpusIngest.DocEvent(0L, 11L, "INSERT", staticText + " with another tail"),
      CorpusIngest.DocEvent(1L, 12L, "INSERT", textB + " plus a suffix"))
    assert(verdicts(11L) == ((-1L, 0L)),
      s"retired static content still matching: ${verdicts(11L)}")
    assert(verdicts(12L) == ((900L, 1L)),
      s"static doc's replacement must be findable: ${verdicts(12L)}")

    // REMOVE of the (replaced) static doc: its replacement stops matching
    // in later triggers as well
    buf.clear()
    run(3L, CorpusIngest.DocEvent(0L, 900L, "REMOVE", ""))
    run(4L, CorpusIngest.DocEvent(0L, 13L, "INSERT", textB + " plus another suffix"))
    assert(verdicts(13L) == ((-1L, 0L)),
      s"removed static doc still matching: ${verdicts(13L)}")
  }
}
