package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.ops.{Exact, Scoring}

/** STREAMING source-divergence monitoring — the divergence family's
  * streaming rung (batch [[graft.ops.Scoring.sourceDivergence]] →
  * incremental [[graft.ops.Scoring.incrementalDivergence]] → this): each
  * trigger tokenizes ONLY its arriving documents, appends the
  * per-(source, token) count partials to a `batch_id`-partitioned store,
  * and emits the KL/cross-entropy report over everything seen so far —
  * the running "is this source drifting from the mixture" readout a
  * continuously-ingesting corpus wants. Counts are exactly mergeable
  * integers, so ONE trigger over the full corpus reproduces the batch
  * operator row-for-row (spec-pinned) and a fresh session continues from
  * the store.
  *
  * Replay safety: the store read excludes this batch's own partition and
  * the write is a dynamic-partition overwrite of it (the
  * [[StreamingAnomalies]] / [[StreamingChangepoint]] pattern).
  * Store size: vocabulary×sources rows per epoch of triggers —
  * [[compactCountStore]] folds committed partitions by integer summation
  * when trigger count outgrows vocabulary growth.
  *
  * Scale shape: per trigger one tokenize+aggregate over the batch only,
  * one store read bounded by vocabulary (never the corpus), and the
  * scoring tail over the merged vocabulary frame.
  */
object StreamingDivergence {

  /** One arriving document. */
  final case class SourcedDoc(doc_id: Long, source: String, text: String)

  def admissionStream(docs: Dataset[SourcedDoc], initialCounts: DataFrame,
      storeDir: String, sink: (DataFrame, Long) => Unit): DataStreamWriter[SourcedDoc] =
    docs.writeStream.foreachBatch { (batch: Dataset[SourcedDoc], batchId: Long) =>
      admissionBatch(batch, batchId, initialCounts, storeDir, sink)
    }

  /** One trigger's work — exposed so specs can drive batches exactly as a
    * (restarted) stream would. `initialCounts` is the static history's
    * `(source, tok, c_st)` (empty frame for a cold start).
    */
  private[graft] def admissionBatch(batch: Dataset[SourcedDoc], batchId: Long,
      initialCounts: DataFrame, storeDir: String,
      sink: (DataFrame, Long) => Unit): Unit = {
    val spark = batch.sparkSession
    val bm = Scoring.tokenCountsBySource(batch.toDF()).persist()
    try {
      val stored = readCountStore(spark, storeDir)
        .filter(col("batch_id") =!= batchId).drop("batch_id")
      val merged = initialCounts.unionByName(stored).unionByName(bm)
        .groupBy(col("source"), col("tok"))
        .agg(Exact.sumLong(col("c_st")).as("c_st"))
      sink(Scoring.divergenceOfCounts(merged), batchId)
      PartialStore.write(bm, batchId, storeDir)
    } finally { bm.unpersist(); () }
  }

  private def emptyStore(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(String, String, Long, Long)]
      .toDF("source", "tok", "c_st", "batch_id")
  }

  /** Per-trigger count partials `(source, tok, c_st, batch_id)`; empty
    * before the first trigger commits.
    */
  def readCountStore(spark: SparkSession, storeDir: String): DataFrame =
    PartialStore.read(spark, storeDir, emptyStore(spark))

  /** Fold partitions `batch_id <= upTo` into one summed sentinel
    * `batch_id = -1` ([[PartialStore.FoldedBatchId]])
    * partition written to a NEW `outDir` ([[PartialStore.compactSummed]] —
    * the repoint convention, probe-transparent by integer reassociation).
    */
  def compactCountStore(spark: SparkSession, storeDir: String, outDir: String,
      upTo: Long): Long =
    PartialStore.compactSummed(spark, storeDir, outDir, upTo,
      emptyStore(spark), Seq("source", "tok"), "c_st")
}
