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
}
