package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, max, when}

/** DELETION propagation for the external index stores — the loop a
  * compliance or takedown event needs closed: a CDC REMOVE for a document
  * (or vector) must reach the DERIVED state its admission created, or the
  * engine keeps matching against content the upstream table no longer has.
  * The reference's stream model carries REMOVE events as first-class
  * (`/root/reference/lib/lambda/dynamo-stream-handler.ts:18-44` — REMOVE
  * images flow through the same handler as INSERT/MODIFY); this is the
  * analytics-side analogue for the admitted-index stores.
  *
  * Design: LSM tombstones, the same discipline the stores already use for
  * growth. Retirements live in a SIBLING parquet subtree
  * (`<store>_tombstones`), partitioned by `batch_id` with dynamic partition
  * overwrite — a replayed retirement batch overwrites its own partition, so
  * deletes are exactly as replay-safe as appends. A tombstone written at
  * batch T kills store rows with `batch_id < T` — STRICTLY before (standard
  * LSM sequencing: a RE-admission of the same id at a later batch survives,
  * deletion is an event in the timeline, not a permanent ban; and rows
  * written AT T are the same trigger's replacement, which is exactly the
  * CDC MODIFY shape [[CorpusIngest]] composes: retire the prior version
  * and admit the new one in one idempotent trigger). Live reads apply
  * tombstones logically (one aggregate over the tiny tombstone set + a
  * left join); compaction applies every tombstone at or below the fold
  * point PHYSICALLY, drops those tombstones, and carries newer ones
  * forward.
  *
  * The static initial index is deliberately OUT of scope: it is
  * [[graft.ops.AnnStore]]-persisted ingest-time work keyed by the corpus
  * fingerprint — deleting from the base corpus regenerates the corpus and
  * with it the fingerprint, so the store rebuilds; tombstones cover the
  * stream-admitted state that must survive restarts WITHOUT a rebuild.
  *
  * Scale shape: the tombstone side is |retired ids| rows — orders of
  * magnitude below the store; the live-view join keys on the id and lets
  * AQE pick the (almost always broadcast) strategy. Nothing here rewrites
  * the store outside the existing compaction cadence.
  */
object IndexTombstones {

  /** The tombstone subtree for a store directory. */
  def dir(storeDir: String): String = storeDir.stripSuffix("/") + "_tombstones"

  /** Record retirements: one `(idCol, batch_id=retireBatchId)` row per
    * distinct id, written with dynamic partition overwrite — a replayed
    * retirement overwrites its own partition instead of double-writing.
    * Returns ids retired.
    */
  def retire(spark: SparkSession, storeDir: String, ids: DataFrame,
      idCol: String, retireBatchId: Long): Long = {
    // persist across the count + write so the distinct runs once — retire
    // sits on the per-trigger hot path of the CDC ingest forms
    val t = ids.toDF(idCol).distinct()
      .withColumn("batch_id", lit(retireBatchId))
      .persist()
    try {
      val n = t.count()
      // file sizing from the measured row count (guide §6): the distinct
      // used to leave shuffle-partition-many files per batch partition —
      // 32 ~KB files per trigger whose open cost every later trigger's
      // tombstone read repaid, compounding with history (r21 measured
      // +32 files/trigger on the ingest bench store). One ~16 B row is a
      // tombstone; ~4M rows per file keeps files in the tens-of-MB band
      // at any trigger size.
      t.coalesce(filesForRows(n)).write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(dir(storeDir))
      n
    } finally { t.unpersist(); () }
  }

  /** Output files for an `n`-row batch-partition write: bounded below by 1,
    * growing with the row count so a genuinely fat trigger still writes
    * parallel, well-sized files (~4M narrow rows ≈ tens of MB each).
    */
  private[streaming] def filesForRows(n: Long): Int =
    math.max(1L, (n + 3999999L) / 4000000L).toInt

  /** Read the tombstone set: `(idCol, batch_id)`; empty before the first
    * retirement commits (same existence probe as the stores' readers).
    */
  def read(spark: SparkSession, storeDir: String, idCol: String): DataFrame = {
    import spark.implicits._
    val p = new org.apache.hadoop.fs.Path(dir(storeDir))
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p) && fs.listStatus(p).exists(_.getPath.getName.startsWith("batch_id=")))
      spark.read.parquet(dir(storeDir))
        .select(col(idCol), col("batch_id").cast("long").as("batch_id"))
    else Seq.empty[(Long, Long)].toDF(idCol, "batch_id")
  }

  /** The LIVE view of a store frame (must carry `batch_id`): rows whose id
    * has no tombstone strictly after their batch. One max-aggregate over
    * the tombstones + a left join on the id — the store is never rewritten.
    * `broadcastTombs` forces a broadcast of the (bounded — compaction
    * spends them) tombstone aggregate: the join then PRESERVES the store
    * side's output partitioning, which the bucketed co-located candidate
    * join ([[BucketedCorpusIngest]]) depends on — an SMJ here would
    * re-partition the store by the id and destroy the shingle bucketing.
    */
  def applyTo(store: DataFrame, tombs: DataFrame, idCol: String,
      broadcastTombs: Boolean = false): DataFrame = {
    val agg0 = tombs.groupBy(col(idCol)).agg(max(col("batch_id")).as("tomb_batch"))
    val agg = if (broadcastTombs) org.apache.spark.sql.functions.broadcast(agg0) else agg0
    store.join(agg, Seq(idCol), "left")
      .filter(col("tomb_batch").isNull || col("batch_id") >= col("tomb_batch"))
      // the equi-join moved idCol to the front — restore the store's column
      // order (callers union the live view with position-based unionAll)
      .select(store.columns.map(col).toIndexedSeq: _*)
  }

  /** The PRE-BATCH probe state for a CDC ingest trigger
    * ([[CorpusIngest]]/[[VectorIngest]]'s shared core — one copy of the
    * union + tombstone + retire-set + column-order discipline, after the
    * join-reorder trap bit both bodies separately): the caller-supplied
    * INITIAL index rows are sequenced at batch `Long.MinValue`, so ANY
    * tombstone kills them — under CDC the static corpus content is
    * retire-able too (a MODIFY/REMOVE of a base-corpus doc must stop its
    * old version from matching, which the plain external stores leave to
    * corpus re-fingerprinting); the store side is read fresh, THIS batch's
    * partitions are excluded from BOTH subtrees (replay stability), past
    * tombstones are applied to the union, this batch's own retire set is
    * removed (its tombstone partition is the excluded one), and the result
    * carries the initial index's exact column order (positional unions
    * downstream).
    */
  def preBatchState(spark: SparkSession, storeDir: String,
      initialIndex: DataFrame, idCol: String, batchId: Long,
      retired: DataFrame, readStore: DataFrame): DataFrame =
    preBatchLive(spark, storeDir, initialIndex, idCol, batchId, readStore)
      .join(retired.toDF(idCol).distinct(), Seq(idCol), "left_anti")
      .select(initialIndex.columns.map(col).toIndexedSeq: _*)

  /** [[preBatchState]] WITHOUT the retire-set removal — the PRE-RETIRE
    * live state (initial ∪ store, own batch excluded in both subtrees,
    * past tombstones applied). The retire set's rows in it are exactly
    * what a trigger's tombstone kills — the quantity
    * [[IngestAggregates.negativeDelta]] records (via a partition-pruned
    * equivalent of this view, not this full-scan form).
    */
  def preBatchLive(spark: SparkSession, storeDir: String,
      initialIndex: DataFrame, idCol: String, batchId: Long,
      readStore: DataFrame): DataFrame = {
    val init = initialIndex.withColumn("batch_id", lit(Long.MinValue))
    val stored = readStore.filter(col("batch_id") =!= batchId)
    val tombs = read(spark, storeDir, idCol).filter(col("batch_id") =!= batchId)
    applyTo(init.unionAll(stored), tombs, idCol)
      .drop("batch_id")
      .select(initialIndex.columns.map(col).toIndexedSeq: _*)
  }

  /** Operational snapshot of a store — the compaction-decision monitor
    * (the number an operator watches to pick the fold point): total vs
    * LIVE rows (their gap is the space and probe work a compaction
    * reclaims), partition count (small-file pressure from per-trigger
    * writes), and outstanding tombstones.
    */
  final case class StoreStats(rows: Long, liveRows: Long, batches: Long,
      tombstones: Long) {
    def deadRows: Long = rows - liveRows
  }

  def storeStats(spark: SparkSession, storeDir: String, idCol: String,
      store: DataFrame): StoreStats = {
    val tombs = read(spark, storeDir, idCol)
    StoreStats(
      rows = store.count(),
      liveRows = applyTo(store, tombs, idCol).count(),
      batches = store.select(col("batch_id")).distinct().count(),
      tombstones = tombs.count())
  }

  /** Compaction with tombstone application — the shared body of both
    * stores' `compactIndexStore`: fold every partition with `batch_id <=
    * upToBatchId` into ONE partition keyed at `upToBatchId`, after
    * PHYSICALLY dropping rows killed by tombstones at or below the fold
    * point; tombstones above it still apply to future reads and are carried
    * to the output's own tombstone subtree (folded rows take `batch_id =
    * upToBatchId` ≤ any carried tombstone's batch, so the LSM ordering is
    * preserved). Written to a NEW directory (compact → repoint — in-place
    * rewrites would race a live stream's next trigger), and only ever
    * called with a fold point at or below the stream checkpoint's
    * committed horizon. Write-ordering guarantees (each closed a real
    * failure mode): BOTH output subtrees — the store AND its tombstones —
    * are deleted unconditionally up front, so nothing left by an earlier
    * completed-but-never-repointed or crashed different-fold attempt into
    * the same outDir can pair with this attempt's writes (a stale
    * tombstone subtree would phantom-delete the fresh fold; a stale store
    * paired with a fresh carried set would resurrect rows whose tombstones
    * this fold spent); and the carried tombstones are written BEFORE the
    * folded store, so a crash between the two writes leaves outDir without
    * its store subtree (visibly unfinished — `readIndexStore`'s existence
    * probe sees nothing to repoint to) rather than a complete-looking
    * store silently missing its carried deletions. Returns rows written.
    */
  def compact(spark: SparkSession, all: DataFrame, storeDir: String,
      outDir: String, idCol: String, upToBatchId: Long,
      targetPartitions: Int): Long = {
    val tombs = read(spark, storeDir, idCol)
    val kept = applyTo(all, tombs.filter(col("batch_id") <= upToBatchId), idCol)
    val folded = kept.withColumn("batch_id",
      when(col("batch_id") <= upToBatchId, lit(upToBatchId))
        .otherwise(col("batch_id")))
    val n = folded.count()
    val outTombs = new org.apache.hadoop.fs.Path(dir(outDir))
    val outStore = new org.apache.hadoop.fs.Path(outDir)
    val fs = outTombs.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(outTombs)) { fs.delete(outTombs, true); () }
    if (fs.exists(outStore)) { fs.delete(outStore, true); () }
    val carried = tombs.filter(col("batch_id") > upToBatchId)
    if (carried.limit(1).count() > 0)
      carried.write.mode("overwrite").partitionBy("batch_id").parquet(dir(outDir))
    folded.repartition(targetPartitions)
      .write.mode("overwrite").partitionBy("batch_id").parquet(outDir)
    n
  }
}
