package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.multimodal.{ImageDedup, Images}

/** STREAMING admission-time perceptual image dedup — the multimodal member
  * of the admission family ([[StreamingDedup]] text, [[StreamingAnn]]
  * vectors): image blobs arrive on a stream, each micro-batch is decoded
  * and fingerprinted with the SAME batch-shaped codec lane the oracled
  * operators run ([[ImageDedup.phashDs]] — dead-letter column, never a task
  * failure), and every decodable arrival gets its best perceptual match
  * among the static corpus fingerprints via the shared probe core
  * ([[ImageDedup.probeBest]] — stream and batch verdicts bit-identical by
  * construction, spec-pinned against `incremental_image_dedup`).
  *
  * Scale shape: per-trigger cost is decode (narrow, batch-shaped) + the
  * banded Hamming probe (candidates ~4 x bucket per arrival, capped hot
  * buckets — never arrival x corpus). The fingerprint index is ingest-time
  * state a deployment maintains like the shingle and home-row stores; the
  * batch_id-partitioned external-store + tombstone pattern composes here
  * unchanged (a fingerprint row is (id, fp) — smaller than either).
  */
object StreamingImages {

  /** Probe ONE micro-batch of image blobs against the static fingerprint
    * index (`idxFps`: (id, fp)) — the body a `foreachBatch` sink runs;
    * exposed for reuse and spec parity. Corrupt blobs surface through the
    * dead-letter lane (no fingerprint ⇒ no verdict row), exactly as in the
    * batch family.
    */
  def probeBatch(batch: Dataset[Images.ImageRecord], idxFps: DataFrame,
      maxHamming: Int = 3, maxBucket: Int = 4096): DataFrame =
    ImageDedup.probeBest(
      ImageDedup.phashDs(batch)
        .filter(col("decode_error").isNull)
        .select(col("doc_id").as("id"), col("fp")),
      idxFps, maxHamming, maxBucket)

  /** Wire an image stream to a verdict sink: every decodable arriving image
    * gets its (doc_id, match_id, hamming, is_dup) row, computed per
    * micro-batch against `idxFps`. `sink` receives (verdicts, batchId) —
    * write idempotently keyed on batchId for exactly-once.
    */
  def admissionStream(images: Dataset[Images.ImageRecord], idxFps: DataFrame,
      sink: (DataFrame, Long) => Unit,
      maxHamming: Int = 3, maxBucket: Int = 4096): DataStreamWriter[Images.ImageRecord] =
    images.writeStream.foreachBatch {
      (batch: Dataset[Images.ImageRecord], batchId: Long) =>
        // decode is the expensive per-trigger step; persist so the probe's
        // two consumers (id list, candidate join) decode once
        val cached = batch.persist()
        try sink(probeBatch(cached, idxFps, maxHamming, maxBucket), batchId)
        finally cached.unpersist()
    }
}
