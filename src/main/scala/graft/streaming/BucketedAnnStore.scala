package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.ops.Similarity

/** The (table, bucket)-BUCKETED layout for the GROWING ANN home-row store —
  * [[BucketedCorpusIngest]]'s lever transplanted to the similarity family
  * (the two accumulating stores now share the co-location design).
  * ANN_AUDIT_r20 measured the path store's growth: once the admitted store
  * outgrows the broadcast half-budget the probe join demotes to an SMJ,
  * and the store side is re-shuffled on the cell key EVERY trigger — at
  * 100 TB, moving the accumulated index per trigger is the cost that grows
  * without bound. Here the home rows live in a catalog table BUCKETED BY
  * `(table, bucket)` and SORTED within buckets, partitioned by `batch_id`
  * (the same LSM layout), so the scan itself satisfies the candidate
  * join's partitioning AND ordering: the store side exchanges nothing —
  * only the micro-batch's query buckets shuffle into the bucket layout
  * (plan pinned in BucketedAnnStoreSpec with broadcasting disabled).
  *
  * Same layout inversion as the corpus form: the STATIC index's home rows
  * are ingested INTO the table at the reserved bootstrap partition
  * ([[IngestAggregates.BootstrapBatch]]) — a `union(staticHome, scan)`
  * would erase the scan's output partitioning — and the tombstone live
  * view rides an explicit broadcast for the same reason
  * ([[IndexTombstones.applyTo]]'s `broadcastTombs`: an SMJ there would
  * re-partition the store by `cid` and destroy the cell co-location).
  * Tombstones stay path-based under `auxDir`.
  *
  * Probe/verdict semantics are IDENTICAL to [[StreamingAnn.externalBatch]]
  * over `staticHome ∪ store` — BucketedAnnStoreSpec drives the same
  * arrival/retire sequence through both forms and asserts equal verdicts;
  * replay safety is the shared contract (own-partition-excluded probe,
  * dynamic-partition-overwrite `insertInto`).
  *
  * Maintenance composes unchanged: [[compactTable]] folds live rows and
  * spends tombstones physically; a RE-BUCKETING generation bump
  * ([[StreamingAnn.rebucketStore]]'s move) is `bootstrap` over the live
  * vectors at the new recipe — the table name should carry the recipe
  * token exactly as [[StreamingAnn.storeDirFor]] does for paths.
  */
object BucketedAnnStore {

  /** The whole table as a home-row frame (bootstrap partition included). */
  def tableScan(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
      .select(col("table"), col("bucket"), col("cid"), col("ce"), col("cn"),
        col("batch_id"))

  /** Create (or replace) the bucketed store table from the static corpus
    * home rows ([[Similarity.indexHome]] shape). `nBuckets` sizes the
    * co-location layout — ≈ the cluster's target parallelism for the
    * candidate join.
    */
  def bootstrap(spark: SparkSession, table: String,
      staticHome: DataFrame, nBuckets: Int = 32): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    staticHome
      .withColumn("batch_id", lit(IngestAggregates.BootstrapBatch))
      .write.partitionBy("batch_id")
      .bucketBy(nBuckets, "table", "bucket").sortBy("table", "bucket")
      .format("parquet").saveAsTable(table)
  }

  /** The co-located pre-batch index: ONE bucketed scan (own batch
    * excluded), broadcast tombstone live view — output partitioning
    * `hashpartitioning(table, bucket, n)` survives to the candidate join.
    */
  def preBatchIndex(spark: SparkSession, table: String, auxDir: String,
      batchId: Long): DataFrame = {
    val all = tableScan(spark, table).filter(col("batch_id") =!= batchId)
    val tombs = IndexTombstones.read(spark, auxDir, "cid")
      .filter(col("batch_id") =!= batchId)
    IndexTombstones.applyTo(all, tombs, "cid", broadcastTombs = true)
      .drop("batch_id")
  }

  /** The tombstone-applied live view (monitoring / downstream reads). */
  def liveIndex(spark: SparkSession, table: String, auxDir: String): DataFrame =
    IndexTombstones.applyTo(tableScan(spark, table),
      IndexTombstones.read(spark, auxDir, "cid"), "cid", broadcastTombs = true)

  def admissionStream(vecs: Dataset[StreamingAnn.Vec], table: String,
      auxDir: String, sink: (DataFrame, Long) => Unit,
      nTables: Int = Similarity.DefaultTables, bits: Int = 5,
      probes: Int = Similarity.DefaultProbes, k: Int = 5)
      : DataStreamWriter[StreamingAnn.Vec] =
    vecs.writeStream.foreachBatch {
      (batch: Dataset[StreamingAnn.Vec], batchId: Long) =>
        ingestBatch(batch, batchId, table, auxDir, sink, nTables, bits, probes, k)
    }

  /** One trigger — [[StreamingAnn.externalBatch]]'s body on the bucketed
    * layout: probe this batch against the co-located pre-state (NEVER
    * broadcast — the layout exists so the store side needn't move; the
    * batch side is one trigger's query buckets), then `insertInto` the
    * batch's own partition (replay = overwrite).
    */
  private[graft] def ingestBatch(batch: Dataset[StreamingAnn.Vec],
      batchId: Long, table: String, auxDir: String,
      sink: (DataFrame, Long) => Unit, nTables: Int, bits: Int, probes: Int,
      k: Int): Unit = {
    val spark = batch.sparkSession
    val cached = batch.persist()
    try {
      sink(Similarity.probeIndexTopK(cached.toDF(),
        preBatchIndex(spark, table, auxDir, batchId),
        nTables, bits, probes, k, broadcastIdx = false), batchId)
      val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try Similarity.homeRowsOf(cached.toDF(), nTables, bits)
        .withColumn("batch_id", lit(batchId))
        .write.mode("overwrite").insertInto(table)
      finally prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    } finally { cached.unpersist(); () }
  }

  /** CDC REMOVE propagation — tombstones under `auxDir`, as the path store
    * keeps them under its own subtree.
    */
  def retire(spark: SparkSession, auxDir: String, vecIds: DataFrame,
      retireBatchId: Long): Long =
    IndexTombstones.retire(spark, auxDir, vecIds, "cid", retireBatchId)

  /** LSM fold: live rows at or below the fold point land in the
    * `upToBatchId` partition of a NEW bucketed table (tombstones ≤ fold
    * spent physically — bootstrap rows included); later partitions carried
    * as-is; surviving tombstones land under `outAuxDir`. Same caller
    * contract as every store fold. Returns rows written.
    */
  def compactTable(spark: SparkSession, table: String, auxDir: String,
      outTable: String, outAuxDir: String, upToBatchId: Long,
      nBuckets: Int = 32): Long = {
    val tombs = IndexTombstones.read(spark, auxDir, "cid")
    val kept = IndexTombstones.applyTo(tableScan(spark, table),
      tombs.filter(col("batch_id") <= upToBatchId), "cid")
    val folded = kept.withColumn("batch_id",
      org.apache.spark.sql.functions.when(
        col("batch_id") <= upToBatchId, lit(upToBatchId))
        .otherwise(col("batch_id")))
    val n = folded.count()
    val outTombsDir = new org.apache.hadoop.fs.Path(IndexTombstones.dir(outAuxDir))
    val fs = outTombsDir.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(outTombsDir)) { fs.delete(outTombsDir, true); () }
    val carried = tombs.filter(col("batch_id") > upToBatchId)
    if (carried.limit(1).count() > 0)
      carried.write.mode("overwrite").partitionBy("batch_id")
        .parquet(IndexTombstones.dir(outAuxDir))
    spark.sql(s"DROP TABLE IF EXISTS $outTable")
    folded.write.partitionBy("batch_id")
      .bucketBy(nBuckets, "table", "bucket").sortBy("table", "bucket")
      .format("parquet").saveAsTable(outTable)
    n
  }
}
