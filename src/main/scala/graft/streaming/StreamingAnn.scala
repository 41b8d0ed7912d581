package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.ops.Similarity

/** STREAMING admission-time similarity — the Structured Streaming form of
  * [[graft.ops.Similarity.incrementalAnnTopK]], completing the triad the
  * dedup family already has (batch probe / persisted index / streaming
  * admission): vectors arrive on a stream, and each micro-batch is probed
  * against the STATIC corpus LSH index for its top-k nearest existing
  * vectors — the admission-time primitive behind near-dup rejection,
  * cluster routing, and retrieval-augmented curation at ingest.
  *
  * Same architecture rationale as [[StreamingDedup]]: the probe is a
  * multi-stage job (bucket join + rank window), so `foreachBatch` hands
  * each micro-batch to the SAME batch probe core the oracled incremental
  * operator runs ([[Similarity.probeIndexTopK]]) — stream and batch
  * verdicts are bit-identical by construction (spec-pinned), and
  * exactly-once rides the sink's idempotent batchId write. No streaming
  * state: similarity state IS the index, which is [[graft.ops.AnnStore]]-
  * persisted ingest-time work a deployment loads, appends to between
  * triggers, and compacts on its own cadence.
  *
  * Scale shape: per-trigger cost is O(batch buckets ⋈ index home rows) —
  * the batch side is one trigger's worth of vectors, candidate volume per
  * vector stays ~nTables × (1+probes) × targetBucket at any corpus size,
  * and the index side broadcasts under the caller's stats gate.
  */
object StreamingAnn {

  final case class Vec(vec_id: Long, embedding: Array[Float])

  /** Probe ONE micro-batch against the static index home view
    * ([[Similarity.indexHome]]) — the body a `foreachBatch` sink runs;
    * exposed for reuse and spec parity.
    */
  def probeBatch(batch: Dataset[Vec], idxHome: DataFrame,
      nTables: Int = Similarity.DefaultTables, bits: Int = 5,
      probes: Int = Similarity.DefaultProbes, k: Int = 5,
      broadcastIdx: Boolean = true): DataFrame =
    Similarity.probeIndexTopK(
      batch.toDF(), idxHome, nTables, bits, probes, k, broadcastIdx)

  /** Wire a vector stream to a verdict sink: every arriving vector gets its
    * (qid, rank, cid, sim) top-k rows, computed per micro-batch against
    * `idxHome`. `sink` receives (topk, batchId) — write idempotently keyed
    * on batchId for exactly-once.
    */
  def admissionStream(vecs: Dataset[Vec], idxHome: DataFrame,
      sink: (DataFrame, Long) => Unit,
      nTables: Int = Similarity.DefaultTables, bits: Int = 5,
      probes: Int = Similarity.DefaultProbes, k: Int = 5,
      broadcastIdx: Boolean = true): DataStreamWriter[Vec] =
    vecs.writeStream.foreachBatch { (batch: Dataset[Vec], batchId: Long) =>
      // the probe consumes the micro-batch twice (norms, bucket explode);
      // persist so a real source is read once per trigger
      val cached = batch.persist()
      try sink(probeBatch(cached, idxHome, nTables, bits, probes, k, broadcastIdx),
        batchId)
      finally cached.unpersist()
    }

  /** [[admissionStream]] with a GROWING index: every trigger's arrivals are
    * appended (as home-bucket rows) to the index before the next trigger,
    * so a later arrival finds an earlier one among its neighbors — the
    * closed-loop form a continuously-ingesting corpus needs (a stream that
    * near-duplicates ITSELF is searchable too, not just stream-vs-corpus).
    * Unlike dedup there is no admit/reject gate: every arriving vector
    * joins the index, exactly as every admitted document's embedding would.
    *
    * foreachBatch runs triggers sequentially, so the index handoff is
    * race-free; each round's index is persisted and the previous round's
    * cache dropped (bounded lineage — the union chain would otherwise
    * re-hash every prior batch per trigger). Session-local, like
    * [[StreamingDedup.admissionStreamGrowing]]; the batch_id-partitioned
    * external-store pattern there is the replay-safe production form and
    * composes identically here.
    */
  def admissionStreamGrowing(vecs: Dataset[Vec], initialIdxHome: DataFrame,
      sink: (DataFrame, Long) => Unit,
      nTables: Int = Similarity.DefaultTables, bits: Int = 5,
      probes: Int = Similarity.DefaultProbes, k: Int = 5,
      broadcastIdx: Boolean = true): DataStreamWriter[Vec] = {
    var index = initialIdxHome
    var indexPersisted = false
    vecs.writeStream.foreachBatch { (batch: Dataset[Vec], batchId: Long) =>
      val cached = batch.persist()
      try {
        sink(probeBatch(cached, index, nTables, bits, probes, k, broadcastIdx), batchId)
        val prev = index
        index = prev.unionAll(
          Similarity.homeRowsOf(cached.toDF(), nTables, bits)).persist()
        index.count()
        if (indexPersisted) prev.unpersist()
        indexPersisted = true
      } finally cached.unpersist()
    }
  }
}
