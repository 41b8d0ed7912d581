package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
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
    * Idempotence caveat: the VERDICT sink keeps exactly-once through its
    * batchId write, but a replayed batch would append its shingles twice in
    * THIS session-local index — use [[admissionStreamExternal]] (the
    * batch_id-partitioned external store with overwrite-by-partition) when
    * replay can happen; this in-memory form remains the zero-I/O choice for
    * a session-scoped stream.
    */
  /** The EXTERNALLY-STORED growing index — the production form of
    * [[admissionStreamGrowing]] (whose scaladoc designs exactly this):
    * admitted shingles live in a parquet directory PARTITIONED BY `batch_id`,
    * and each trigger (re)writes only its own partition via dynamic
    * partition overwrite. That makes the index append IDEMPOTENT: a
    * replayed micro-batch (restart after a sink failure — the at-least-once
    * window foreachBatch leaves open) overwrites its previous attempt
    * instead of double-appending, completing the exactly-once story the
    * verdict sink already has via its batchId key.
    *
    * Replay safety in the PROBE too: the batch's own partition is excluded
    * from the index it probes against, so attempt 2 of batch k scores
    * against exactly the state attempt 1 saw — verdicts are replay-stable.
    *
    * Scale shape: per trigger, one bounded partition write + one store
    * read whose partition pruning is Spark's normal parquet partition
    * discovery; the probe is unchanged (O(batch shingles ⋈ index)). Small
    * per-batch files accumulate — [[compactIndexStore]] is the LSM-style
    * maintenance counterpart (same operational pattern as
    * [[graft.cdc.CdcPipeline.compactBus]]).
    */
  def admissionStreamExternal(docs: Dataset[Doc], initialIndex: DataFrame,
      storeDir: String, sink: (DataFrame, Long) => Unit,
      thresholdE6: Long = 500000L, maxDf: Int = 256): DataStreamWriter[Doc] =
    docs.writeStream.foreachBatch { (batch: Dataset[Doc], batchId: Long) =>
      externalBatch(batch, batchId, initialIndex, storeDir, sink, thresholdE6, maxDf)
    }

  /** One trigger's work for [[admissionStreamExternal]] — exposed so the
    * replay spec can drive the same batch twice exactly as a restarted
    * stream would.
    */
  private[graft] def externalBatch(batch: Dataset[Doc], batchId: Long,
      initialIndex: DataFrame, storeDir: String, sink: (DataFrame, Long) => Unit,
      thresholdE6: Long, maxDf: Int): Unit = {
    val spark = batch.sparkSession
    val cached = batch.persist()
    try {
      // exclude THIS batch's own partition: on replay the probe must see
      // the pre-attempt state, not the previous attempt's output. The live
      // view applies tombstones ([[retireFromStore]]) — a retired doc must
      // stop matching, or the store keeps dedup-rejecting new arrivals
      // against content the upstream corpus no longer has
      val stored = liveIndexStore(spark, storeDir, excludeBatchId = batchId)
        .drop("batch_id")
      val verdicts = probeBatch(cached, initialIndex.unionAll(stored),
        thresholdE6, maxDf).persist()
      try {
        sink(verdicts, batchId)
        val admitted = cached.join(
          verdicts.filter(col("is_dup") === 0L).select("doc_id"),
          Seq("doc_id"), "left_semi")
        // dynamic partition overwrite: ONLY batch_id=<this batch> is
        // replaced; every other batch's partition is untouched
        shingleBatch(admitted.as[Doc](org.apache.spark.sql.Encoders.product[Doc]))
          .withColumn("batch_id", lit(batchId))
          .coalesce(1) // batch-bounded partition write — guide-§6 file sizing
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(storeDir)
      } finally { verdicts.unpersist(); () }
    } finally { cached.unpersist(); () }
  }

  /** Read the admitted-shingle store: `(doc_id, shingle, batch_id)`; empty
    * before the first trigger commits.
    */
  def readIndexStore(spark: SparkSession, storeDir: String): DataFrame = {
    import spark.implicits._
    val p = new org.apache.hadoop.fs.Path(storeDir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p) && fs.listStatus(p).exists(_.getPath.getName.startsWith("batch_id=")))
      // partition discovery infers batch_id from directory names as INT —
      // cast back to the long the writers put in
      spark.read.parquet(storeDir)
        .select(col("doc_id"), col("shingle"), col("batch_id").cast("long").as("batch_id"))
    else Seq.empty[(Long, Long, Long)].toDF("doc_id", "shingle", "batch_id")
  }

  /** LSM-style maintenance for the index store: fold every partition with
    * `batch_id <= upToBatchId` into ONE partition (keyed at `upToBatchId`)
    * with `targetPartitions` files, leaving later partitions as they are —
    * and apply every tombstone at or below the fold point PHYSICALLY
    * (retired docs' shingles leave the store; newer tombstones are carried
    * forward — [[IndexTombstones.compact]]). Written to a NEW directory
    * (same operational pattern as `compactBus`: compact → repoint →
    * retire), because rewriting in place would race a live stream's next
    * trigger. Only compact batches at or below the stream checkpoint's
    * committed horizon — a replay BELOW the fold point would otherwise
    * overwrite the folded partition with one batch's worth of shingles.
    * Returns rows written.
    */
  def compactIndexStore(spark: SparkSession, storeDir: String, outDir: String,
      upToBatchId: Long, targetPartitions: Int = 1): Long =
    IndexTombstones.compact(spark, readIndexStore(spark, storeDir), storeDir,
      outDir, "doc_id", upToBatchId, targetPartitions)

  /** Propagate CDC REMOVE events into the admitted-shingle store: every
    * `doc_id` in `docIds` is tombstoned at `retireBatchId`
    * ([[IndexTombstones.retire]] — replay-idempotent via dynamic partition
    * overwrite), so subsequent probes no longer match the retired docs and
    * the next [[compactIndexStore]] removes their shingles physically. A
    * re-admission at a LATER batch survives (LSM sequencing); the static
    * corpus index is out of scope (corpus deletions re-fingerprint and
    * rebuild it — [[graft.ops.AnnStore]]).
    */
  def retireFromStore(spark: SparkSession, storeDir: String,
      docIds: DataFrame, retireBatchId: Long): Long =
    IndexTombstones.retire(spark, storeDir, docIds, "doc_id", retireBatchId)

  /** The tombstone-applied live view of the store (`(doc_id, shingle,
    * batch_id)`): what probes should union with the static index.
    * `excludeBatchId` drops that batch's partition from BOTH subtrees —
    * the replay-stability exclusion [[externalBatch]] needs.
    */
  def liveIndexStore(spark: SparkSession, storeDir: String,
      excludeBatchId: Long = Long.MinValue): DataFrame = {
    val stored = readIndexStore(spark, storeDir)
      .filter(col("batch_id") =!= excludeBatchId)
    val tombs = IndexTombstones.read(spark, storeDir, "doc_id")
      .filter(col("batch_id") =!= excludeBatchId)
    IndexTombstones.applyTo(stored, tombs, "doc_id")
  }

  /** Total/live/partition/tombstone counts — what decides the compaction
    * cadence ([[IndexTombstones.StoreStats]]).
    */
  def indexStoreStats(spark: SparkSession, storeDir: String): IndexTombstones.StoreStats =
    IndexTombstones.storeStats(spark, storeDir, "doc_id",
      readIndexStore(spark, storeDir))

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
