package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col, count, lit, sum}

/** STORE-MAINTAINED probe aggregates for [[CorpusIngest]] — the first of
  * the two structural 100 TB levers the r19 ingest audit named
  * (docs/TUNING.md "streaming_ingest per-trigger cost"): the probe's
  * per-shingle document-frequency cap and per-doc size lookup used to be
  * recomputed from the RAW index every trigger — two full-index shuffles
  * whose cost grows with accumulated history. This module keeps both as
  * MERGEABLE SUMMARIES in sibling stores next to the shingle index, updated
  * per trigger with batch-sized deltas — the same mergeable-summary shape
  * the incremental ladder uses everywhere else, applied to the ingest
  * probe's own state:
  *
  *  - `<store>_sizes` — `(doc_id, n_sh, batch_id)`: one row per admission
  *    carrying the doc's shingle count. EXACTLY mirrors the main store's
  *    LSM discipline: same `batch_id` partitioning, same dynamic-partition
  *    overwrite on replay, and the SAME tombstone subtree (tombstones are
  *    doc-level, so the main store's `<store>_tombstones` applies verbatim
  *    — one retirement kills the shingle rows and the size row in one
  *    write). Live per-doc size = `sum(n_sh)` over live rows (a re-INSERT
  *    without retirement leaves two live admissions, and the raw-index
  *    row count the probe used to compute sums them the same way).
  *  - `<store>_df` — `(shingle, delta, batch_id)`: SIGNED per-shingle
  *    document-frequency deltas. Admissions append `+count` rows from the
  *    batch's own shingles; retirements append `-count` rows computed from
  *    the PRE-RETIRE live state (exactly the rows the tombstone kills, so
  *    the running sum equals the live index's df by construction — the
  *    invariant [[audit]] checks and IngestAggregatesSpec pins after every
  *    lifecycle step). Signed deltas instead of doc-attributed rows because
  *    df is additive over docs: tombstones don't need to be applied at
  *    read time, they were REALIZED as negatives when written.
  *
  * The static initial index seeds both stores at a reserved BOOTSTRAP
  * partition (`batch_id = Long.MinValue` — the same sequencing
  * [[IndexTombstones.preBatchState]] gives initial rows, so any tombstone
  * kills bootstrap aggregates exactly as it kills bootstrap shingles).
  * Bootstrap is lazy, marker-guarded ([[ready]]) and SELF-HEALING: a store
  * directory whose aggregates are missing (first trigger ever, a crashed
  * [[compact]], or adoption of a store compacted by other means) is
  * rebuilt from the initial index plus the store's current partitions —
  * [[ensure]] is a per-trigger filesystem existence check, not a job.
  *
  * Replay safety is inherited: every reader excludes the probing batch's
  * own partition in both aggregate stores, negatives are recomputed from
  * the pre-attempt state, and every write is a dynamic-partition overwrite
  * of the batch's own partition — attempt 2 writes exactly what attempt 1
  * wrote.
  *
  * Scale shape, per trigger: the df lookup is one COLUMN-PRUNED SCAN of
  * the df store filtered through a broadcast of the batch's distinct
  * shingles (shuffle volume ∝ batch, never ∝ index); the size lookup is
  * one aggregate over |admitted docs| rows (vs |index shingle rows|
  * before); the maintenance writes are batch-sized. The one remaining
  * index-sized scan per retire-carrying trigger is the negative-delta
  * semi-join — a broadcast-filtered scan with no index-side shuffle,
  * skipped entirely on pure-INSERT triggers.
  */
object IngestAggregates {

  /** Reserved batch for the static initial index's aggregates — the same
    * `Long.MinValue` sequencing [[IndexTombstones.preBatchState]] assigns
    * initial shingle rows, so tombstone arithmetic treats bootstrap
    * aggregates and bootstrap shingles identically.
    */
  val BootstrapBatch: Long = Long.MinValue

  def sizesDir(storeDir: String): String = storeDir.stripSuffix("/") + "_sizes"
  def dfDir(storeDir: String): String = storeDir.stripSuffix("/") + "_df"

  /** Marker written after a successful [[rebuild]]/[[compact]] — the
    * per-trigger existence probe [[ensure]] checks. A crash anywhere
    * between aggregate writes leaves no marker, so the next trigger
    * rebuilds from authoritative state instead of trusting a torn write.
    */
  private def markerPath(storeDir: String) =
    new org.apache.hadoop.fs.Path(sizesDir(storeDir), "_GRAFT_AGG_READY")

  def ready(spark: SparkSession, storeDir: String): Boolean = {
    val p = markerPath(storeDir)
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  /** Read the raw sizes store `(doc_id, n_sh, batch_id)`; empty before
    * bootstrap. Same partition-discovery int→long cast discipline as
    * [[StreamingDedup.readIndexStore]].
    */
  def readSizes(spark: SparkSession, storeDir: String): DataFrame = {
    import spark.implicits._
    val p = new org.apache.hadoop.fs.Path(sizesDir(storeDir))
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p) && fs.listStatus(p).exists(_.getPath.getName.startsWith("batch_id=")))
      spark.read.parquet(sizesDir(storeDir))
        .select(col("doc_id"), col("n_sh"),
          col("batch_id").cast("long").as("batch_id"))
    else Seq.empty[(Long, Long, Long)].toDF("doc_id", "n_sh", "batch_id")
  }

  /** Read the raw signed-delta df store `(shingle, delta, batch_id)`. */
  def readDf(spark: SparkSession, storeDir: String): DataFrame = {
    import spark.implicits._
    val p = new org.apache.hadoop.fs.Path(dfDir(storeDir))
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p) && fs.listStatus(p).exists(_.getPath.getName.startsWith("batch_id=")))
      spark.read.parquet(dfDir(storeDir))
        .select(col("shingle"), col("delta"),
          col("batch_id").cast("long").as("batch_id"))
    else Seq.empty[(Long, Long, Long)].toDF("shingle", "delta", "batch_id")
  }

  /** Ensure the aggregate stores exist and cover the store's current state;
    * a filesystem existence check per trigger, a [[rebuild]] only when the
    * marker is absent. `readStore` is the authoritative shingle-row frame
    * (`(doc_id, shingle, batch_id)`) — the path store's reader for
    * [[CorpusIngest]], the whole table scan for [[BucketedCorpusIngest]]
    * (which passes an EMPTY `initialIndex`: its bootstrap partition is just
    * store rows at [[BootstrapBatch]]).
    */
  /** `inFlightBatchId` (r20 ADVICE): the trigger currently being processed.
    * A self-healing rebuild during attempt 2 of a replayed batch must not
    * flatten attempt 1's own partition into the bootstrap df — the probe's
    * own-batch exclusion cannot subtract a flattened partition, so the
    * replay would see its own prior admissions in the df cap. Excluded in
    * both subtrees (store and tombstones); `Long.MaxValue` = none.
    */
  def ensure(spark: SparkSession, storeDir: String, initialIndex: DataFrame,
      readStore: DataFrame, inFlightBatchId: Long = Long.MaxValue): Unit =
    if (!ready(spark, storeDir))
      rebuild(spark, storeDir, initialIndex, readStore, inFlightBatchId)

  /** Rebuild both aggregate stores from authoritative state: the initial
    * index at the bootstrap partition plus one aggregation pass over the
    * main store's existing partitions (usually none — the first-trigger
    * bootstrap). The sizes store mirrors the main store's raw rows (dead
    * rows included — read-time tombstone application keeps them exactly as
    * live/dead as their shingle rows); the df store collapses to ONE
    * bootstrap partition holding the CURRENT live df (future tombstones
    * write their own negatives, so a flattened starting sum stays exact).
    */
  def rebuild(spark: SparkSession, storeDir: String, initialIndex: DataFrame,
      readStore: DataFrame, inFlightBatchId: Long = Long.MaxValue): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val sizesP = new org.apache.hadoop.fs.Path(sizesDir(storeDir))
    val dfP = new org.apache.hadoop.fs.Path(dfDir(storeDir))
    val fs = sizesP.getFileSystem(conf)
    if (fs.exists(sizesP)) { fs.delete(sizesP, true); () }
    if (fs.exists(dfP)) { fs.delete(dfP, true); () }
    val init = initialIndex.select(col("doc_id"), col("shingle"))
      .withColumn("batch_id", lit(BootstrapBatch))
    // the in-flight batch's own partition is excluded in BOTH subtrees
    // (r20 ADVICE): a marker-loss + replay combination must rebuild the
    // PRE-attempt state, or attempt 2's df cap would see attempt 1's own
    // admissions (they'd hide inside the flattened bootstrap sum, immune
    // to the probe's own-batch exclusion)
    val all = init.unionAll(
      readStore.select(col("doc_id"), col("shingle"), col("batch_id"))
        .filter(col("batch_id") =!= inFlightBatchId))
    // sizes: raw per-(doc, batch) counts — the exact mirror of store rows
    all.groupBy(col("doc_id"), col("batch_id"))
      .agg(count(lit(1)).as("n_sh"))
      .write.mode("overwrite").partitionBy("batch_id").parquet(sizesDir(storeDir))
    // df: the LIVE state's counts, flattened into the bootstrap partition
    val tombs = IndexTombstones.read(spark, storeDir, "doc_id")
      .filter(col("batch_id") =!= inFlightBatchId)
    IndexTombstones.applyTo(all, tombs, "doc_id")
      .groupBy(col("shingle")).agg(count(lit(1)).as("delta"))
      .withColumn("batch_id", lit(BootstrapBatch))
      .write.mode("overwrite").partitionBy("batch_id").parquet(dfDir(storeDir))
    val fsOut = markerPath(storeDir).getFileSystem(conf)
    fsOut.create(markerPath(storeDir), true).close()
  }

  /** The probe's per-doc size lookup for batch `batchId`: live sizes
    * (main-store tombstones applied, own batch excluded in BOTH subtrees)
    * minus this batch's retire set, summed per doc — `(doc_id, n_old)`,
    * row-for-row equal to `preState.groupBy(doc_id).count()` on the raw
    * index at a |docs|-sized cost.
    */
  def preBatchSizes(spark: SparkSession, storeDir: String, batchId: Long,
      retired: DataFrame): DataFrame = {
    val rows = readSizes(spark, storeDir).filter(col("batch_id") =!= batchId)
    val tombs = IndexTombstones.read(spark, storeDir, "doc_id")
      .filter(col("batch_id") =!= batchId)
    IndexTombstones.applyTo(rows, tombs, "doc_id")
      .join(retired.toDF("doc_id").distinct(), Seq("doc_id"), "left_anti")
      .groupBy(col("doc_id")).agg(sum(col("n_sh")).as("n_old"))
  }

  /** The probe's df lookup for batch `batchId`: running store sums (own
    * batch excluded) plus this batch's in-flight negative deltas, restricted
    * to the batch's own distinct shingles — `(shingle, df)` for exactly the
    * shingles the candidate join can touch. `batchShingles` rides as an
    * EXPLICIT broadcast: its lineage is the in-memory micro-batch (no stats
    * for the planner), and a trigger's distinct-shingle set is bounded by
    * the micro-batch size by construction — so the df store is scanned and
    * filtered WITHOUT an index-side shuffle, and the aggregate that follows
    * is batch-bounded.
    */
  def preBatchDf(spark: SparkSession, storeDir: String, batchId: Long,
      batchShingles: DataFrame, negDelta: DataFrame): DataFrame =
    readDf(spark, storeDir).filter(col("batch_id") =!= batchId)
      .select(col("shingle"), col("delta"))
      .unionAll(negDelta.select(col("shingle"), col("delta")))
      // no .distinct() on the build side: the broadcast hash build dedups
      // keys itself, and the distinct was one extra batch-wide shuffle per
      // trigger (r20 audit follow-up)
      .join(broadcast(batchShingles.select("shingle")), Seq("shingle"), "left_semi")
      .groupBy(col("shingle")).agg(sum(col("delta")).as("df"))

  /** This batch's negative df deltas: one `(shingle, -count)` row per
    * shingle of the retire set's PRE-RETIRE live rows — exactly the rows
    * the trigger's tombstone will kill, so writing them keeps the running
    * sum equal to the live df. PARTITION-PRUNED (r20 audit follow-up: the
    * naive form paid one full index pass per retire-carrying trigger): the
    * sizes store records every admission's batch, so one bounded collect of
    * the retire set's admission batches prunes the store scan to the
    * touched partitions — raw sizes rows are a SUPERSET of live admissions
    * (dead rows are only dropped at compaction), so no live row escapes the
    * pruning, and the tombstone apply afterwards is per-doc local. The
    * initial-index pass is skipped entirely unless the retire set actually
    * contains an initial doc (the bootstrap partition shows up in the
    * collected set). Callers skip this entirely on pure-INSERT triggers.
    */
  def negativeDelta(spark: SparkSession, storeDir: String,
      initialIndex: DataFrame, batchId: Long, retired: DataFrame,
      readStore: DataFrame): DataFrame = {
    import spark.implicits._
    val retiredKeys = retired.toDF("doc_id").distinct()
    val touched = readSizes(spark, storeDir)
      .filter(col("batch_id") =!= batchId)
      .join(broadcast(retiredKeys), Seq("doc_id"), "left_semi")
      .select(col("batch_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    // the bootstrap batch stays IN the store-side filter: for the path
    // store no such partition exists (harmless), for the bucketed table
    // the bootstrap rows ARE store rows — one code path serves both
    val storeSide = readStore
      .filter(col("batch_id") =!= batchId)
      .filter(col("batch_id").isin(touched.toSeq: _*))
    val initSide =
      if (touched.contains(BootstrapBatch))
        initialIndex.select(col("doc_id"), col("shingle"))
          .withColumn("batch_id", lit(BootstrapBatch))
      else Seq.empty[(Long, Long, Long)].toDF("doc_id", "shingle", "batch_id")
    val tombs = IndexTombstones.read(spark, storeDir, "doc_id")
      .filter(col("batch_id") =!= batchId)
    // retired-keys semi-join FIRST: it commutes with the tombstone apply
    // (both key on doc_id), and it shrinks the tombstone left-join's input
    // from every touched-partition row to just the retire set's rows —
    // under out-of-order arrival `touched` can be most of the store (the
    // r20 in-context A/B: the ordered-arrival partition prune stops
    // pruning when admissions scatter across partitions)
    IndexTombstones.applyTo(
      initSide.unionAll(storeSide)
        .join(broadcast(retiredKeys), Seq("doc_id"), "left_semi"),
      tombs, "doc_id")
      .groupBy(col("shingle")).agg((-count(lit(1))).as("delta"))
  }

  /** The per-trigger maintenance write: the admitted side's size rows and
    * positive df deltas plus the retire side's negatives, each under the
    * batch's own partition with dynamic-partition overwrite (replay
    * rewrites, never doubles). `admittedSh` must be cache-backed by the
    * caller — it is consumed twice here and once by the main-store write.
    */
  def writeDeltas(spark: SparkSession, storeDir: String, batchId: Long,
      admittedSh: DataFrame, negDelta: DataFrame): Unit = {
    admittedSh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(sizesDir(storeDir))
    admittedSh.groupBy(col("shingle")).agg(count(lit(1)).as("delta"))
      .unionAll(negDelta.select(col("shingle"), col("delta")))
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(dfDir(storeDir))
  }

  /** Compact the aggregate stores ALONGSIDE a main-store compaction to the
    * same `outDir` (callers use [[CorpusIngest.compactStores]], which runs
    * the main fold first): sizes rows at or below the fold point get
    * tombstones ≤ fold applied physically and collapse into the fold
    * partition (later partitions carried as-is — carried tombstones still
    * kill them at read time, exactly as in the main fold); df deltas at or
    * below the fold point collapse to their SUM (zero-sum shingles leave
    * the store physically — their content is gone from the index too).
    * Caller contract matches the main fold's: only compact at or below the
    * stream's committed horizon, repoint after.
    */
  /** `keepBootstrapSizes` (r20 ADVICE, high): whether the sizes store's
    * BOOTSTRAP partition survives the fold at `BootstrapBatch` instead of
    * collapsing into the fold partition. It must MIRROR what the main store
    * does with bootstrap CONTENT: the path store's initial index is
    * re-supplied per trigger and never folds (pass TRUE — folding the
    * bootstrap sizes rows made [[negativeDelta]]'s `touched` set lose
    * `BootstrapBatch`, so retiring a live initial doc AFTER compaction
    * silently skipped the initial-index pass and the maintained df
    * permanently overcounted); the bucketed table's bootstrap rows are
    * ordinary store rows that DO fold (pass FALSE — keeping the sizes rows
    * at `BootstrapBatch` there would point `touched` at a partition the
    * folded table no longer has, recreating the same miss in mirror form).
    */
  def compact(spark: SparkSession, storeDir: String, outDir: String,
      upToBatchId: Long, keepBootstrapSizes: Boolean): Unit = {
    import org.apache.spark.sql.functions.when
    val conf = spark.sessionState.newHadoopConf()
    val outSizes = new org.apache.hadoop.fs.Path(sizesDir(outDir))
    val outDf = new org.apache.hadoop.fs.Path(dfDir(outDir))
    val fs = outSizes.getFileSystem(conf)
    if (fs.exists(outSizes)) { fs.delete(outSizes, true); () }
    if (fs.exists(outDf)) { fs.delete(outDf, true); () }
    val tombs = IndexTombstones.read(spark, storeDir, "doc_id")
    val sizesKept = IndexTombstones.applyTo(readSizes(spark, storeDir),
      tombs.filter(col("batch_id") <= upToBatchId), "doc_id")
    val foldKey =
      if (keepBootstrapSizes)
        when(col("batch_id") === lit(BootstrapBatch), lit(BootstrapBatch))
          .when(col("batch_id") <= upToBatchId, lit(upToBatchId))
          .otherwise(col("batch_id"))
      else
        when(col("batch_id") <= upToBatchId, lit(upToBatchId))
          .otherwise(col("batch_id"))
    sizesKept.withColumn("batch_id", foldKey)
      .write.mode("overwrite").partitionBy("batch_id").parquet(sizesDir(outDir))
    val df = readDf(spark, storeDir)
    val folded = df.filter(col("batch_id") <= upToBatchId)
      .groupBy(col("shingle")).agg(sum(col("delta")).as("delta"))
      .filter(col("delta") =!= 0L)
      .withColumn("batch_id", lit(upToBatchId))
      .select(col("shingle"), col("delta"), col("batch_id"))
    folded.unionAll(df.filter(col("batch_id") > upToBatchId))
      .write.mode("overwrite").partitionBy("batch_id").parquet(dfDir(outDir))
    val fsOut = markerPath(outDir).getFileSystem(conf)
    fsOut.create(markerPath(outDir), true).close()
  }

  /** Invariant monitor (and the spec's per-step gate): recompute the live
    * index's per-shingle df and per-doc sizes from RAW state and diff them
    * against the maintained stores' sums. Returns (df mismatch rows, size
    * mismatch rows) — both 0 whenever maintenance kept the books. A
    * production deployment runs this at compaction cadence, not per
    * trigger.
    */
  def audit(spark: SparkSession, storeDir: String,
      initialIndex: DataFrame, readStore: DataFrame): (Long, Long) = {
    val live = IndexTombstones.applyTo(
      initialIndex.select(col("doc_id"), col("shingle"))
        .withColumn("batch_id", lit(BootstrapBatch))
        .unionAll(readStore.select(col("doc_id"), col("shingle"), col("batch_id"))),
      IndexTombstones.read(spark, storeDir, "doc_id"), "doc_id")
    val trueDf = live.groupBy(col("shingle")).agg(count(lit(1)).as("t_df"))
    val keptDf = readDf(spark, storeDir)
      .groupBy(col("shingle")).agg(sum(col("delta")).as("m_df"))
      .filter(col("m_df") =!= 0L)
    val dfBad = trueDf.join(keptDf, Seq("shingle"), "full_outer")
      .filter(col("t_df").isNull || col("m_df").isNull || col("t_df") =!= col("m_df"))
      .count()
    val trueSz = live.groupBy(col("doc_id")).agg(count(lit(1)).as("t_n"))
    val keptSz = IndexTombstones.applyTo(readSizes(spark, storeDir),
        IndexTombstones.read(spark, storeDir, "doc_id"), "doc_id")
      .groupBy(col("doc_id")).agg(sum(col("n_sh")).as("m_n"))
    val szBad = trueSz.join(keptSz, Seq("doc_id"), "full_outer")
      .filter(col("t_n").isNull || col("m_n").isNull || col("t_n") =!= col("m_n"))
      .count()
    (dfBad, szBad)
  }
}
