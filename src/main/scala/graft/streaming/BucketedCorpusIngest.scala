package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.{broadcast, col, desc, lit, row_number, when}
import org.apache.spark.sql.streaming.DataStreamWriter

/** The SHINGLE-BUCKETED store layout for CDC corpus ingestion — the second
  * structural 100 TB lever the r19 audit named (docs/TUNING.md): the probe's
  * one remaining index-sized movement is the candidate join
  * (`batch shingles ⋈ index on shingle`). On a path store that join either
  * broadcasts the batch side (fine while a trigger fits the broadcast
  * threshold) or shuffles BOTH sides — at 100 TB with fat micro-batches,
  * re-shuffling the accumulated index every trigger is the cost that grows
  * without bound. Here the index lives in a catalog table BUCKETED BY
  * `shingle` (and partitioned by `batch_id`, exactly the LSM layout the
  * path store uses), so the scan itself reports hash-partitioning on the
  * join key: the candidate join CO-LOCATES — the store side never
  * exchanges, only the batch side shuffles into the bucket layout
  * (BucketedCorpusIngestSpec pins the plan: exactly one Exchange, on the
  * probe side, with broadcasting disabled).
  *
  * Layout inversion vs [[CorpusIngest]]: the STATIC initial index is
  * ingested INTO the table at the reserved bootstrap partition
  * ([[IngestAggregates.BootstrapBatch]]) instead of being re-supplied as a
  * frame to every trigger. That is what makes the one-scan co-located
  * pre-state possible (a `union(initFrame, storeScan)` erases output
  * partitioning in Spark — union partitioning is unknown — so the init
  * content must be IN the bucketed scan), and it makes every tombstone
  * physically spendable: the static-retirement carry
  * [[CorpusIngest.compactStores]] needs does not apply here, because
  * [[compactTable]] drops retired bootstrap rows like any other store rows.
  * All sibling state (tombstones, df/size aggregates, the rejected lane)
  * stays path-based under `auxDir` — only the probed shingle rows move into
  * the table. Every [[IngestAggregates]] helper takes the table scan as its
  * `readStore` with an EMPTY initial frame: one code path serves both
  * layouts.
  *
  * The per-trigger admitted write is a dynamic-partition-overwrite
  * `insertInto` of the batch's own partition (bucketing preserved by the
  * table's catalog spec), so replay safety is identical to the path store:
  * attempt 2 overwrites what attempt 1 wrote, and every reader excludes the
  * in-flight batch's partitions.
  *
  * The tombstone live-view join and the retire anti-join ride EXPLICIT
  * broadcasts ([[IndexTombstones.applyTo]]'s `broadcastTombs`): both sets
  * are bounded (compaction spends tombstones; a retire set is one
  * trigger's), and a sort-merge join there would re-partition the store by
  * `doc_id` — destroying the shingle co-location this layout exists for.
  *
  * Probe/verdict semantics are IDENTICAL to [[CorpusIngest]] —
  * BucketedCorpusIngestSpec drives the same event sequence through both
  * forms and asserts equal verdict streams, balanced aggregate books, and
  * replay-stable state.
  */
object BucketedCorpusIngest {

  /** The whole table as a store frame `(doc_id, shingle, batch_id)` —
    * bootstrap partition included (it is just store rows at batch -inf).
    */
  def tableScan(spark: SparkSession, table: String): DataFrame =
    spark.table(table).select(col("doc_id"), col("shingle"), col("batch_id"))

  private def emptyInit(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, Long)].toDF("doc_id", "shingle")
  }

  /** Create (or replace) the bucketed store table from the static corpus
    * shingle index and seed the sibling aggregate stores under `auxDir`.
    * `nBuckets` sizes the co-location layout: pick ≈ the cluster's target
    * shuffle parallelism for the candidate join (buckets are the join's
    * max useful parallelism; more buckets also mean more small files per
    * partition write — the usual bucketing trade).
    */
  def bootstrap(spark: SparkSession, table: String, auxDir: String,
      initialIndex: DataFrame, nBuckets: Int = 32): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    initialIndex.select(col("doc_id"), col("shingle"))
      .withColumn("batch_id", lit(IngestAggregates.BootstrapBatch))
      .write.partitionBy("batch_id")
      .bucketBy(nBuckets, "shingle").sortBy("shingle")
      .format("parquet").saveAsTable(table)
    IngestAggregates.rebuild(spark, auxDir, emptyInit(spark),
      tableScan(spark, table))
  }

  /** The co-located pre-batch probe state: ONE bucketed scan (own batch
    * excluded), broadcast tombstone live view, broadcast retire anti-join —
    * output partitioning `hashpartitioning(shingle, nBuckets)` survives to
    * the candidate join.
    */
  def preBatchState(spark: SparkSession, table: String, auxDir: String,
      batchId: Long, retired: DataFrame): DataFrame = {
    val all = tableScan(spark, table).filter(col("batch_id") =!= batchId)
    val tombs = IndexTombstones.read(spark, auxDir, "doc_id")
      .filter(col("batch_id") =!= batchId)
    IndexTombstones.applyTo(all, tombs, "doc_id", broadcastTombs = true)
      .join(broadcast(retired.toDF("doc_id").distinct()), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("shingle"))
  }

  /** The tombstone-applied live view (monitoring / downstream reads). */
  def liveIndex(spark: SparkSession, table: String, auxDir: String): DataFrame =
    IndexTombstones.applyTo(tableScan(spark, table),
      IndexTombstones.read(spark, auxDir, "doc_id"), "doc_id",
      broadcastTombs = true)

  def ingestStream(events: Dataset[CorpusIngest.DocEvent], table: String,
      auxDir: String, sink: (DataFrame, Long) => Unit,
      thresholdE6: Long = 500000L, maxDf: Int = 256)
      : DataStreamWriter[CorpusIngest.DocEvent] =
    events.writeStream.foreachBatch {
      (batch: Dataset[CorpusIngest.DocEvent], batchId: Long) =>
        ingestBatch(batch, batchId, table, auxDir, sink, thresholdE6, maxDf)
    }

  /** One trigger — the [[CorpusIngest.ingestBatch]] body on the bucketed
    * layout (same collapse, retire, probe, write-order, and replay
    * contracts; see that method's comments for the rationale of each step).
    */
  private[graft] def ingestBatch(batch: Dataset[CorpusIngest.DocEvent],
      batchId: Long, table: String, auxDir: String,
      sink: (DataFrame, Long) => Unit, thresholdE6: Long, maxDf: Int): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    val w = Window.partitionBy(col("doc_id")).orderBy(desc("seq"))
    val last = batch.toDF()
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
      .persist()
    try {
      val upserts = last.filter(col("event") =!= "REMOVE")
        .select(col("doc_id"), col("text"))
        .as[StreamingDedup.Doc].persist()
      try {
        val retired = last
          .filter(col("event") === "REMOVE" || col("event") === "MODIFY")
          .select(col("doc_id"))
        IngestAggregates.ensure(spark, auxDir, emptyInit(spark),
          tableScan(spark, table), inFlightBatchId = batchId)
        // persist, not localCheckpoint — fuses into the verdicts job; safe
        // by the write order alone (see [[CorpusIngest]]'s rationale)
        val negDelta =
          if (retired.limit(1).count() > 0)
            IngestAggregates.negativeDelta(spark, auxDir, emptyInit(spark),
              batchId, retired, tableScan(spark, table)).persist()
          else Seq.empty[(Long, Long)].toDF("shingle", "delta")
        // persisted: three probe-side consumers (see [[CorpusIngest]])
        val newSh = StreamingDedup.shingleBatch(upserts).persist()
        val verdicts =
          try graft.ops.Incremental.probeWithAggregates(
              upserts.select("doc_id"), newSh,
              preBatchState(spark, table, auxDir, batchId, retired),
              IngestAggregates.preBatchDf(spark, auxDir, batchId, newSh, negDelta),
              IngestAggregates.preBatchSizes(spark, auxDir, batchId, retired),
              thresholdE6, maxDf)
            .localCheckpoint(true)
          finally { newSh.unpersist(); () }
        sink(verdicts, batchId)
        val docEnc = org.apache.spark.sql.Encoders.product[StreamingDedup.Doc]
        val rejected = upserts.join(
          verdicts.filter(col("is_dup") =!= 0L).select("doc_id"),
          Seq("doc_id"), "left_semi")
        StreamingDedup.shingleBatch(rejected.as[StreamingDedup.Doc](docEnc))
          .withColumn("batch_id", lit(batchId))
          .coalesce(1) // batch-bounded forensic lane — guide-§6 file sizing
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(CorpusIngest.rejectedDir(auxDir))
        val admitted = upserts.join(
          verdicts.filter(col("is_dup") === 0L).select("doc_id"),
          Seq("doc_id"), "left_semi")
        val admittedSh = StreamingDedup
          .shingleBatch(admitted.as[StreamingDedup.Doc](docEnc)).persist()
        try {
          IngestAggregates.writeDeltas(spark, auxDir, batchId, admittedSh, negDelta)
          // dynamic overwrite through the SESSION conf (the writer-option
          // spelling is not honored by every insertInto path) — restored
          // right after, the trigger is the only writer by contract
          val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
          spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
          try admittedSh.withColumn("batch_id", lit(batchId))
            .write.mode("overwrite").insertInto(table)
          finally prev match {
            case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
            case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
          }
          IndexTombstones.retire(spark, auxDir, retired, "doc_id", batchId)
        } finally { admittedSh.unpersist(); negDelta.unpersist(); () }
      } finally { upserts.unpersist(); () }
    } finally { last.unpersist(); () }
  }

  /** LSM compaction for the bucketed layout: live rows at or below the fold
    * point (tombstones ≤ fold applied PHYSICALLY — bootstrap rows included,
    * which is why no static-retirement carry is needed here) fold into the
    * `upToBatchId` partition of a NEW bucketed table; later partitions are
    * carried as-is; tombstones above the fold point and the sibling
    * aggregate folds land under `outAuxDir` ([[IngestAggregates.compact]]).
    * Same caller contract as every store fold: only at or below the
    * committed horizon, repoint (table name + auxDir) only after this
    * returns. Returns rows written.
    */
  def compactTable(spark: SparkSession, table: String, auxDir: String,
      outTable: String, outAuxDir: String, upToBatchId: Long,
      nBuckets: Int = 32): Long = {
    val tombs = IndexTombstones.read(spark, auxDir, "doc_id")
    val kept = IndexTombstones.applyTo(tableScan(spark, table),
      tombs.filter(col("batch_id") <= upToBatchId), "doc_id")
    val folded = kept.withColumn("batch_id",
      when(col("batch_id") <= upToBatchId, lit(upToBatchId))
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
      .bucketBy(nBuckets, "shingle").sortBy("shingle")
      .format("parquet").saveAsTable(outTable)
    // keepBootstrapSizes = false: this fold moved the table's bootstrap
    // rows into the fold partition, so the sizes mirror must follow them
    // (see IngestAggregates.compact's contract)
    IngestAggregates.compact(spark, auxDir, outAuxDir, upToBatchId,
      keepBootstrapSizes = false)
    n
  }
}
