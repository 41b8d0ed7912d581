package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.{col, desc, lit, row_number}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.ops.Similarity

/** CDC-driven VECTOR ingestion — [[CorpusIngest]]'s twin over the external
  * ANN home-row store, so both index families take the same upsert/delete
  * event model: INSERT probes the arriving vector for its top-k nearest
  * live neighbors (the verdict goes to the sink) and appends its home-bucket
  * rows; MODIFY retires the vector's prior rows and admits the replacement
  * in the same trigger ([[IndexTombstones]]' strictly-before kill rule);
  * REMOVE retires; within a trigger the last event per vec_id wins.
  *
  * One deliberate asymmetry: ANN admission has no accept/reject gate (every
  * vector joins the index, as every admitted document's embedding would), so
  * the probe is pure evidence — and like CorpusIngest it runs against the
  * post-retire pre-admit state, so a MODIFY's top-k never contains the
  * vector's own previous version.
  *
  * Replay safety and scale shape are inherited unchanged from
  * [[StreamingAnn.externalBatch]]: own-partition exclusion in both
  * subtrees, overwrite-only writes, per-trigger cost O(batch buckets ⋈
  * index home rows) + |retired| tombstone rows.
  *
  * ORDERING CONTRACT: identical to [[CorpusIngest]]'s — `seq` orders
  * events only WITHIN a trigger; across triggers the subtrees are
  * sequenced by `batch_id`, so the ingest assumes the upstream CDC source
  * delivers each key's events in order across triggers (the reference's
  * source guarantee — a DynamoDB item's modifications arrive on one shard
  * in order). A REMOVE delivered a trigger earlier than its INSERT cannot
  * kill it; tolerate such a source by sequencing on a global `seq`, not by
  * weakening the strictly-before kill rule.
  */
object VectorIngest {

  /** One vector CDC event; REMOVE rows carry a null/empty embedding. */
  final case class VecEvent(seq: Long, vec_id: Long, event: String,
      embedding: Array[Float])

  def ingestStream(events: Dataset[VecEvent], initialIdxHome: DataFrame,
      storeDir: String, sink: (DataFrame, Long) => Unit,
      nTables: Int = Similarity.DefaultTables, bits: Int = 5,
      probes: Int = Similarity.DefaultProbes, k: Int = 5,
      broadcastIdx: Boolean = true): DataStreamWriter[VecEvent] =
    events.writeStream.foreachBatch { (batch: Dataset[VecEvent], batchId: Long) =>
      ingestBatch(batch, batchId, initialIdxHome, storeDir, sink,
        nTables, bits, probes, k, broadcastIdx)
    }

  private[graft] def ingestBatch(batch: Dataset[VecEvent], batchId: Long,
      initialIdxHome: DataFrame, storeDir: String, sink: (DataFrame, Long) => Unit,
      nTables: Int, bits: Int, probes: Int, k: Int, broadcastIdx: Boolean): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    val w = Window.partitionBy(col("vec_id")).orderBy(desc("seq"))
    val last = batch.toDF()
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
      .persist()
    try {
      val upserts = last.filter(col("event") =!= "REMOVE")
        .select(col("vec_id"), col("embedding"))
        .as[StreamingAnn.Vec].persist()
      try {
        val retired = last
          .filter(col("event") === "REMOVE" || col("event") === "MODIFY")
          .select(col("vec_id").as("cid"))
        // post-retire pre-admit state over the WHOLE index — initial rows
        // sequenced at batch -inf so tombstones reach static corpus
        // vectors too (a MODIFY's top-k must not contain its own static
        // prior version; a REMOVE'd static vector must leave every later
        // trigger's top-k)
        val preState = IndexTombstones.preBatchState(spark, storeDir,
          initialIdxHome, "cid", batchId, retired,
          StreamingAnn.readIndexStore(spark, storeDir))
        val topk = StreamingAnn.probeBatch(upserts,
          preState, nTables, bits, probes, k, broadcastIdx)
        sink(topk, batchId)
        // WRITE ORDER RULE (CorpusIngest.ingestBatch, r19 audit): every
        // consumer of the probe's output runs BEFORE any write under a
        // path its plan reads — the sink above is topk's ONLY consumer,
        // so the retire may follow; a future second consumer (or a
        // topk.persist expecting cache hits) must move above this line or
        // it silently re-runs the whole probe against the refreshed path
        IndexTombstones.retire(spark, storeDir, retired, "cid", batchId)
        Similarity.homeRowsOf(upserts.toDF(), nTables, bits)
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(storeDir)
      } finally { upserts.unpersist(); () }
    } finally { last.unpersist(); () }
  }
}
