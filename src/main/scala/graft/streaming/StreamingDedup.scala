package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.ops.{Dedup, Incremental}

/** STREAMING admission-time near-dup detection — the Structured Streaming
  * form of [[graft.ops.Incremental.incrementalDedup]]: documents arrive on
  * a stream, and each micro-batch is probed against the STATIC corpus
  * shingle index before admission.
  *
  * The probe is a multi-stage job (two aggregations + a rank window), which
  * Structured Streaming cannot express as one continuous query without
  * watermark gymnastics that would buy nothing here — the production
  * pattern is `foreachBatch`: the engine hands each micro-batch to the
  * BATCH probe core (`Incremental.probeAgainstIndex`, the exact code the
  * oracled batch operator runs), preserving exactly-once through the sink's
  * idempotent write + checkpointed batch id. The reference's own pipeline
  * does its per-record work inside the stream handler the same way
  * (`/root/reference/lib/lambda/dynamo-stream-handler.ts` — per-batch
  * driver around per-record logic).
  *
  * Scale shape: per micro-batch cost is O(batch shingles ⋈ index) — the
  * batch side is small by construction (a trigger's worth of documents),
  * the index is the stored big side, and nothing about the probe holds
  * streaming STATE: dedup state lives in the index itself, which a real
  * deployment appends admitted docs to between triggers (compaction cadence
  * is the operator's knob, same trade as any LSM).
  */
object StreamingDedup {

  final case class Doc(doc_id: Long, text: String)

  /** Shingle a batch of (doc_id, text) rows with the SAME hashing as the
    * corpus index ([[Dedup.shingles]]), so stream and batch scores are
    * bit-identical.
    */
  def shingleBatch(docs: Dataset[Doc]): DataFrame =
    Dedup.shingles(docs.toDF())

  /** Probe ONE micro-batch against the static index — the body a
    * `foreachBatch` sink runs; exposed for reuse and spec parity.
    */
  def probeBatch(batch: Dataset[Doc], indexSh: DataFrame,
      thresholdE6: Long = 500000L, maxDf: Int = 256): DataFrame =
    Incremental.probeAgainstIndex(
      batch.select("doc_id"), shingleBatch(batch), indexSh, thresholdE6, maxDf)

  /** Wire a document stream to a verdict sink: every arriving doc gets its
    * (match_id, jaccard_e6, is_dup) row, computed per micro-batch against
    * `indexSh`. `sink` receives (verdicts, batchId) — write idempotently
    * keyed on batchId for exactly-once.
    */
  def admissionStream(docs: Dataset[Doc], indexSh: DataFrame,
      sink: (DataFrame, Long) => Unit,
      thresholdE6: Long = 500000L, maxDf: Int = 256): DataStreamWriter[Doc] =
    docs.writeStream.foreachBatch { (batch: Dataset[Doc], batchId: Long) =>
      // the probe consumes the micro-batch three times (id list, sizes,
      // scored join) — persist so a real source (file/Kafka) is read and
      // shingled once per trigger, not three times; the sink materializes
      // synchronously, so unpersist after it returns is safe
      val cached = batch.persist()
      try sink(probeBatch(cached, indexSh, thresholdE6, maxDf), batchId)
      finally cached.unpersist()
    }

  /** [[admissionStream]] with a GROWING index: every batch probes against
    * the static corpus PLUS all previously-admitted stream docs, and the
    * batch's non-duplicates join the index before the next trigger — the
    * closed-loop form (a stream that near-duplicates itself is deduped
    * too, not just dedup-vs-corpus). foreachBatch runs triggers
    * sequentially, so the index handoff is race-free; each round's index
    * is persisted and the previous round's cache dropped (same bounded-
    * lineage discipline as the PageRank loop — the union chain would
    * otherwise re-shingle every prior batch per trigger).
    *
    * Idempotence caveat, stated honestly: the VERDICT sink keeps
    * exactly-once through its batchId write, but a replayed batch would
    * append its shingles twice in THIS session-local index. A production
    * deployment stores the index externally partitioned by batch id
    * (overwrite-by-partition = idempotent append) and compacts on a
    * cadence — the probe side is unchanged.
    */
  def admissionStreamGrowing(docs: Dataset[Doc], initialIndex: DataFrame,
      sink: (DataFrame, Long) => Unit,
      thresholdE6: Long = 500000L, maxDf: Int = 256): DataStreamWriter[Doc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    var index = initialIndex
    var indexPersisted = false
    docs.writeStream.foreachBatch { (batch: Dataset[Doc], batchId: Long) =>
      val cached = batch.persist()
      try {
        val verdicts = probeBatch(cached, index, thresholdE6, maxDf).persist()
        try {
          sink(verdicts, batchId)
          val admitted = cached.join(
            verdicts.filter(col("is_dup") === 0L).select("doc_id"),
            Seq("doc_id"), "left_semi").as[Doc]
          val prev = index
          index = prev.unionAll(shingleBatch(admitted)).persist()
          index.count()
          if (indexPersisted) prev.unpersist()
          indexPersisted = true
        } finally verdicts.unpersist()
      } finally cached.unpersist()
    }
  }
}
