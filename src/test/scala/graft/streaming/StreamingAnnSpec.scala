package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSuite
import graft.ops.{Similarity, Tables}

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
    val qids = buf.map(_._1).toSet
    assert(qids == newVecs.map(_.vec_id).toSet.filter(id =>
      want.exists(_._1 == id)) || qids.subsetOf(newVecs.map(_.vec_id).toSet),
      "stream produced rows for vectors that never arrived")
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
}
