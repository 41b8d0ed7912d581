package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSuite
import graft.ops.{Pq, Similarity, Tables}

class StreamingAnnSpec extends SparkSuite {

  test("StreamingAnn: per-micro-batch probe equals the batch operator across 2 triggers") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val bits = Similarity.adaptiveBits(Tables.embeddings(spark, sf).count())
    val idxHome = Similarity.indexHome(Similarity.lshIndex(
      spark, sf, Similarity.DefaultTables, bits, Similarity.DefaultProbes,
      excludeMod = 10)).cache()
    val newVecs = Tables.embeddings(spark, sf)
      .filter($"vec_id" % 10 === 0)
      .select($"vec_id", $"embedding").as[StreamingAnn.Vec].collect()
    assert(newVecs.nonEmpty)

    val stream = MemoryStream[StreamingAnn.Vec]
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Double)]
    val q = StreamingAnn.admissionStream(stream.toDS(), idxHome, (df, _) =>
      buf.synchronized {
        buf ++= df.collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      }, bits = bits).start()
    // two triggers: the index is static, so top-k must not depend on how
    // the arrivals are split across micro-batches
    val (b1, b2) = newVecs.splitAt(newVecs.length / 2)
    stream.addData(b1.toSeq); q.processAllAvailable()
    stream.addData(b2.toSeq); q.processAllAvailable()
    q.stop()

    val want = Similarity.incrementalAnnTopK(spark, sf, recallQueries = 0).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(buf.toSet == want, s"stream ${buf.size} rows vs batch ${want.size}")
    // every streamed qid is exactly an arrived vec_id that has >= 1
    // candidate in the batch result — no subset escape hatch (the previous
    // `subsetOf(arrived)` disjunct was always true and made this vacuous)
    val qids = buf.map(_._1).toSet
    assert(qids == newVecs.map(_.vec_id).toSet.filter(id => want.exists(_._1 == id)),
      "stream qids must equal the arrived vec_ids with candidates")
  }

  test("StreamingAnn growing index: batch 2 finds batch 1's arrival as its neighbor") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // tiny deterministic world: 4 orthogonal corpus vectors; the stream
    // delivers vector A in batch 1 and an exact copy A' in batch 2 — only a
    // GROWING index can return A as A''s nearest neighbor
    def unit(i: Int): Array[Float] = Array.tabulate(64)(j => if (j == i) 1f else 0f)
    val corpus = (1L to 4L).map(i => StreamingAnn.Vec(i, unit(i.toInt)))
    val a = StreamingAnn.Vec(100L, unit(10))
    val aPrime = StreamingAnn.Vec(200L, unit(10))
    val idx0 = Similarity.homeRowsOf(
      corpus.toDF("vec_id", "embedding"), nTables = 8, bits = 3).cache()

    val stream = MemoryStream[StreamingAnn.Vec]
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Double)]
    val q = StreamingAnn.admissionStreamGrowing(stream.toDS(), idx0, (df, _) =>
      buf.synchronized {
        buf ++= df.collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      }, nTables = 8, bits = 3, k = 2).start()
    stream.addData(a); q.processAllAvailable()
    stream.addData(aPrime); q.processAllAvailable()
    q.stop()

    val aPrimeTop = buf.filter(_._1 == 200L).sortBy(_._2)
    assert(aPrimeTop.nonEmpty, "batch 2 produced no verdicts")
    assert(aPrimeTop.head._3 == 100L && math.abs(aPrimeTop.head._4 - 1.0) < 1e-9,
      s"A' must find A at sim 1.0 via the grown index: $aPrimeTop")
    // batch 1 could not have seen A' (it arrived later)
    assert(!buf.exists(v => v._1 == 100L && v._3 == 200L),
      "batch 1 verdict impossibly references a later arrival")
  }

  test("StreamingAnn IVF: per-micro-batch probe equals the batch operator across 2 triggers") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val cents = Similarity.ivfCentroids(spark, sf, 64, excludeMod = 10)
    val idxHome = Similarity.ivfIndexHome(spark, sf, nCells = 64, batchMod = 10)
    val newVecs = Tables.embeddings(spark, sf)
      .filter($"vec_id" % 10 === 0)
      .select($"vec_id", $"embedding").as[StreamingAnn.Vec].collect()
    assert(newVecs.nonEmpty)

    val stream = MemoryStream[StreamingAnn.Vec]
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Double)]
    val q = StreamingAnn.admissionStreamIvf(stream.toDS(), idxHome, cents, (df, _) =>
      buf.synchronized {
        buf ++= df.collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      }).start()
    // two triggers: the index is static, so top-k must not depend on how
    // the arrivals are split across micro-batches
    val (b1, b2) = newVecs.splitAt(newVecs.length / 2)
    stream.addData(b1.toSeq); q.processAllAvailable()
    stream.addData(b2.toSeq); q.processAllAvailable()
    q.stop()

    val want = Similarity.incrementalIvfTopK(spark, sf, recallQueries = 0).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(buf.toSet == want, s"stream ${buf.size} rows vs batch ${want.size}")
  }

  test("StreamingAnn IVFADC: per-micro-batch probe equals the batch operator across 2 triggers") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val cents = Similarity.ivfCentroids(spark, sf, 64, excludeMod = 10)
    val books = Pq.codebooks(spark, sf, excludeMod = 10)
    val idxHome = Pq.ivfpqHome(spark, sf, 64, 8, 16, excludeMod = 10)
    val corpusEmb = Similarity.withNorm(
      Tables.embeddings(spark, sf).filter($"vec_id" % 10 =!= 0))
      .select($"vec_id".as("cid"), $"embedding".as("ce"), $"nrm".as("cn"))
    val newVecs = Tables.embeddings(spark, sf)
      .filter($"vec_id" % 10 === 0)
      .select($"vec_id", $"embedding").as[StreamingAnn.Vec].collect()
    assert(newVecs.nonEmpty)

    val stream = MemoryStream[StreamingAnn.Vec]
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Double, Double)]
    val q = StreamingAnn.admissionStreamIvfPq(stream.toDS(), idxHome, corpusEmb,
      cents, books, (df, _) =>
        buf.synchronized {
          buf ++= df.collect().map(r =>
            (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
        }).start()
    // two triggers: the code store is static, so top-k must not depend on
    // how the arrivals are split across micro-batches
    val (b1, b2) = newVecs.splitAt(newVecs.length / 2)
    stream.addData(b1.toSeq); q.processAllAvailable()
    stream.addData(b2.toSeq); q.processAllAvailable()
    q.stop()

    val want = Pq.incrementalIvfPqTopK(spark, sf, recallQueries = 0).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSet
    assert(buf.toSet == want, s"stream ${buf.size} rows vs batch ${want.size}")
  }

  test("storeDirFor keys by plane generation + params and is corpus-regeneration-stable") {
    val p1 = StreamingAnn.storeDirFor(sf, 8, 3)
    // deterministic (no fingerprint component): the same call must resolve
    // to the same path even after the corpus is regenerated — admitted
    // stream vectors' buckets depend only on the fixed hyperplanes
    assert(p1 == StreamingAnn.storeDirFor(sf, 8, 3))
    assert(p1.contains(Similarity.LshKind + "-grow-8-3"),
      s"path must carry the plane generation token + params: $p1")
    assert(p1 != StreamingAnn.storeDirFor(sf, 8, 4))
  }

  test("StreamingAnn external store: closed loop, replay-stable, survives a fresh session, compacts") {
    import spark.implicits._
    val store = graft.ops.Scratch.dir("ann_store_ext").toString + "/idx"
    def unit(i: Int): Array[Float] = Array.tabulate(64)(j => if (j == i) 1f else 0f)
    val corpus = (1L to 4L).map(i => StreamingAnn.Vec(i, unit(i.toInt)))
    val idx0 = Similarity.homeRowsOf(
      corpus.toDF("vec_id", "embedding"), nTables = 8, bits = 3).cache()
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Double)]
    val sink: (org.apache.spark.sql.DataFrame, Long) => Unit = (df, _) =>
      buf.synchronized {
        buf ++= df.collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      }
    def run(batchId: Long, vs: StreamingAnn.Vec*): Unit =
      StreamingAnn.externalBatch(vs.toDS(), batchId, idx0, store, sink,
        nTables = 8, bits = 3, probes = 2, k = 2, broadcastIdx = true)

    // batch 0 admits A; batch 1's exact copy A' must find it FROM THE STORE
    // (closed loop through external state, not session memory), and a novel
    // orthogonal B must not match A at sim 1.0
    run(0L, StreamingAnn.Vec(100L, unit(10)))
    run(1L, StreamingAnn.Vec(200L, unit(10)), StreamingAnn.Vec(300L, unit(20)))
    val aPrime = buf.filter(_._1 == 200L).sortBy(_._2)
    assert(aPrime.nonEmpty && aPrime.head._3 == 100L &&
      math.abs(aPrime.head._4 - 1.0) < 1e-9,
      s"A' must find A at sim 1.0 via the external store: $aPrime")
    assert(!buf.exists(v => v._1 == 300L && math.abs(v._4 - 1.0) < 1e-9),
      "orthogonal B cannot have a sim-1.0 neighbor")
    val batch1Verdicts = buf.filter(v => v._1 == 200L || v._1 == 300L).toSet
    val rowsAfter = StreamingAnn.readIndexStore(spark, store).count()
    assert(StreamingAnn.readIndexStore(spark, store)
      .select("batch_id").distinct().collect().map(_.getLong(0)).toSet == Set(0L, 1L))

    // REPLAY batch 1 (restart-after-sink-failure shape): verdicts identical
    // (probe excluded its own partition) and the store row count unchanged —
    // overwrite-by-partition, not append
    buf.clear()
    run(1L, StreamingAnn.Vec(200L, unit(10)), StreamingAnn.Vec(300L, unit(20)))
    assert(buf.toSet == batch1Verdicts, "replayed batch verdicts must be stable")
    assert(StreamingAnn.readIndexStore(spark, store).count() == rowsAfter,
      "replay double-appended the index store")

    // FRESH SESSION continuation: externalBatch holds no session state —
    // everything batch 2 knows about batches 0/1 comes off disk, exactly
    // what a restarted driver sees. A'' must find BOTH prior arrivals.
    buf.clear()
    run(2L, StreamingAnn.Vec(400L, unit(10)))
    val aSecond = buf.filter(_._1 == 400L).sortBy(_._2)
    assert(aSecond.map(v => (v._2, v._3)).take(2) == Seq((1L, 100L), (2L, 200L)),
      s"A'' must find A then A' from the store grown by prior sessions: $aSecond")

    // compaction folds batches <= 2 into one partition preserving the row
    // set, and the compacted store serves the SAME probe state
    val compacted = graft.ops.Scratch.dir("ann_store_c").toString + "/idx"
    val total = StreamingAnn.readIndexStore(spark, store).count()
    val n = StreamingAnn.compactIndexStore(spark, store, compacted, upToBatchId = 2L)
    assert(n == total)
    val cStore = StreamingAnn.readIndexStore(spark, compacted)
    assert(cStore.count() == total)
    assert(cStore.select("batch_id").distinct().collect()
      .map(_.getLong(0)).toSet == Set(2L))
    val probeOrig = StreamingAnn.probeBatch(
      Seq(StreamingAnn.Vec(500L, unit(10))).toDS(),
      idx0.unionAll(StreamingAnn.readIndexStore(spark, store).drop("batch_id")),
      nTables = 8, bits = 3, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val probeCompact = StreamingAnn.probeBatch(
      Seq(StreamingAnn.Vec(500L, unit(10))).toDS(),
      idx0.unionAll(cStore.drop("batch_id")),
      nTables = 8, bits = 3, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(probeOrig == probeCompact && probeOrig.nonEmpty,
      "compacted store must serve bit-identical probe results")
  }

  test("StreamingAnn tombstones: retired vector leaves every top-k; compaction deletes physically") {
    import spark.implicits._
    val store = graft.ops.Scratch.dir("ann_store_t").toString + "/idx"
    def unit(i: Int): Array[Float] = Array.tabulate(64)(j => if (j == i) 1f else 0f)
    val corpus = (1L to 4L).map(i => StreamingAnn.Vec(i, unit(i.toInt)))
    val idx0 = Similarity.homeRowsOf(
      corpus.toDF("vec_id", "embedding"), nTables = 8, bits = 3).cache()
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Double)]
    val sink: (org.apache.spark.sql.DataFrame, Long) => Unit = (df, _) =>
      buf.synchronized {
        buf ++= df.collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      }
    def run(batchId: Long, vs: StreamingAnn.Vec*): Unit =
      StreamingAnn.externalBatch(vs.toDS(), batchId, idx0, store, sink,
        nTables = 8, bits = 3, probes = 2, k = 3, broadcastIdx = true)

    // batches 0 and 1 admit A and its exact copy A'
    run(0L, StreamingAnn.Vec(100L, unit(10)))
    run(1L, StreamingAnn.Vec(200L, unit(10)))
    assert(buf.exists(v => v._1 == 200L && v._3 == 100L && math.abs(v._4 - 1.0) < 1e-9))

    // CDC REMOVE for A at batch 2: tombstones are per-id (only 100 dies);
    // a later arrival must still find A' (id 200, untombstoned) and never A
    assert(StreamingAnn.retireFromStore(spark, store, Seq(100L).toDF("cid"), 2L) == 1L)
    buf.clear()
    run(3L, StreamingAnn.Vec(400L, unit(10)))
    val after = buf.filter(_._1 == 400L)
    assert(after.exists(v => v._3 == 200L && math.abs(v._4 - 1.0) < 1e-9),
      s"the surviving copy must still be found: $after")
    assert(!after.exists(_._3 == 100L), s"retired vector leaked into top-k: $after")

    // compaction applies the tombstone PHYSICALLY and drops it; the
    // compacted live view serves bit-identical probes
    val compacted = graft.ops.Scratch.dir("ann_store_tc").toString + "/idx"
    val liveRows = StreamingAnn.liveIndexStore(spark, store).count()
    val n = StreamingAnn.compactIndexStore(spark, store, compacted, upToBatchId = 3L)
    assert(n == liveRows)
    assert(!StreamingAnn.readIndexStore(spark, compacted).select("cid")
      .collect().map(_.getLong(0)).contains(100L))
    assert(IndexTombstones.read(spark, compacted, "cid").count() == 0L,
      "spent tombstones must not be carried past the fold point")
    val probeLive = StreamingAnn.probeBatch(
      Seq(StreamingAnn.Vec(500L, unit(10))).toDS(),
      idx0.unionAll(StreamingAnn.liveIndexStore(spark, store).drop("batch_id")),
      nTables = 8, bits = 3, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val probeCompact = StreamingAnn.probeBatch(
      Seq(StreamingAnn.Vec(500L, unit(10))).toDS(),
      idx0.unionAll(StreamingAnn.liveIndexStore(spark, compacted).drop("batch_id")),
      nTables = 8, bits = 3, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(probeLive == probeCompact && probeLive.nonEmpty)
  }

  test("rebucketStore: generation bump == a store that always ran the new recipe; tombstones spent") {
    import spark.implicits._
    val store = graft.ops.Scratch.dir("ann_store_rb").toString + "/idx"
    def unit(i: Int): Array[Float] = Array.tabulate(64)(j => if (j == i) 1f else 0f)
    val corpus = (1L to 4L).map(i => StreamingAnn.Vec(i, unit(i.toInt)))
    val idx0b3 = Similarity.homeRowsOf(
      corpus.toDF("vec_id", "embedding"), nTables = 8, bits = 3).cache()
    def run(batchId: Long, vs: StreamingAnn.Vec*): Unit =
      StreamingAnn.externalBatch(vs.toDS(), batchId, idx0b3, store, (_, _) => (),
        nTables = 8, bits = 3, probes = 2, k = 3, broadcastIdx = true)
    // grow at bits=3, then retire A — the bump must not resurrect it
    run(0L, StreamingAnn.Vec(100L, unit(10)))
    run(1L, StreamingAnn.Vec(200L, unit(10)), StreamingAnn.Vec(300L, unit(20)))
    StreamingAnn.retireFromStore(spark, store, Seq(100L).toDF("cid"), 2L)

    val out = graft.ops.Scratch.dir("ann_store_rb_out").toString + "/idx"
    val n = StreamingAnn.rebucketStore(spark, store, out,
      nTables = 8, newBits = 5, foldBatchId = 2L)
    assert(n == 2L * 8L, s"2 live vectors x 8 tables expected, got $n")

    // bit-identical to what externalBatch would have written had the
    // stream always run at bits=5: the exact home-row set of the LIVE
    // vectors under the new recipe (the fresh-store twin, modulo batch_id)
    def rowSet(df: org.apache.spark.sql.DataFrame) =
      df.select("table", "bucket", "cid").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val want = rowSet(Similarity.homeRowsOf(
      Seq((200L, unit(10)), (300L, unit(20))).toDF("vec_id", "embedding"),
      nTables = 8, bits = 5))
    assert(rowSet(StreamingAnn.readIndexStore(spark, out)) == want,
      "rebucketed rows must equal the fresh new-recipe store's")
    assert(StreamingAnn.readIndexStore(spark, out).select("batch_id")
      .distinct().collect().map(_.getLong(0)).toSet == Set(2L))
    assert(IndexTombstones.read(spark, out, "cid").count() == 0L,
      "rebucketing must spend tombstones physically, not carry them")

    // probes after the repoint run at the NEW recipe end to end: the
    // surviving copy is found at sim 1.0, the retired one never
    val idx0b5 = Similarity.homeRowsOf(
      corpus.toDF("vec_id", "embedding"), nTables = 8, bits = 5)
    val got = StreamingAnn.probeBatch(
      Seq(StreamingAnn.Vec(500L, unit(10))).toDS(),
      idx0b5.unionAll(StreamingAnn.liveIndexStore(spark, out).drop("batch_id")),
      nTables = 8, bits = 5, k = 3).collect()
      .map(r => (r.getLong(2), r.getDouble(3)))
    assert(got.exists(v => v._1 == 200L && math.abs(v._2 - 1.0) < 1e-9),
      s"surviving copy must be found under the new recipe: ${got.toSeq}")
    assert(!got.exists(_._1 == 100L), s"retired vector resurrected: ${got.toSeq}")
  }
}
