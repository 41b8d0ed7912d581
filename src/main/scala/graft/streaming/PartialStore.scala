package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}

import graft.ops.Exact

/** The `batch_id`-partitioned partial-aggregate store every streaming
  * monitor shares (moments, daily sums, token counts): per-trigger partials
  * land as one partition via dynamic-partition overwrite (replayed batches
  * rewrite their own partition), probes exclude the probing batch's own
  * partition for replay stability, and compaction folds committed
  * partitions by exact integer summation into a NEW directory (the
  * repoint convention). Factored after the pattern's fourth copy — the
  * read-probe/overwrite/compact mechanics now exist exactly once.
  */
private[graft] object PartialStore {

  /** All partials `(payload…, batch_id)`; `empty` supplies the typed
    * frame (INCLUDING a `batch_id` long column) returned before the first
    * trigger commits, and its column order is reproduced on read.
    */
  def read(spark: SparkSession, storeDir: String, empty: DataFrame): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(storeDir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p) && fs.listStatus(p).exists(_.getPath.getName.startsWith("batch_id=")))
      spark.read.parquet(storeDir)
        .select(empty.columns.toSeq.map {
          // partition column comes back as the inferred type; pin long
          case "batch_id" => col("batch_id").cast("long").as("batch_id")
          case c => col(c)
        }: _*)
    else empty
  }

  /** Publish one trigger's partials as its own partition (idempotent under
    * replay: attempt 2 overwrites attempt 1's partition and nothing else).
    */
  def write(partials: DataFrame, batchId: Long, storeDir: String): Unit = {
    partials.withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(storeDir)
    ()
  }

  /** The partition id folded history lands in: a SENTINEL no real trigger
    * can own (foreachBatch ids are ≥ 0), so a replay of ANY batch —
    * including the fold point itself — can neither hide the folded
    * history from its own-partition-exclusion probe nor destroy it with
    * its dynamic-partition overwrite (r16 ADVICE: folding into
    * `batch_id = upTo` made safety rest on the caller never replaying
    * `upTo`). A later compaction re-folds the sentinel partition
    * (−1 ≤ upTo always), so repeated compactions compose.
    */
  val FoldedBatchId: Long = -1L

  /** Fold partitions `batch_id <= upTo` into one summed
    * `batch_id = `[[FoldedBatchId]] partition written to `outDir` —
    * probe-transparent because integer sums reassociate freely and no
    * probe excludes the sentinel. Returns the folded store's row count
    * (the frame is persisted across the count and the write, so the fold
    * runs once). CALLER CONTRACT: fold only COMMITTED batches — the
    * sentinel makes a fold-point replay non-destructive (it can no longer
    * hide or overwrite folded history), but an uncommitted batch folded
    * here would still double-count its own mass when it replays.
    */
  def compactSummed(spark: SparkSession, storeDir: String, outDir: String,
      upTo: Long, empty: DataFrame, keyCols: Seq[String], sumCol: String): Long =
    compactFolded(spark, storeDir, outDir, upTo, empty, keyCols,
      Seq(Exact.sumLong(col(sumCol)).as(sumCol)))

  /** [[compactSummed]] generalized to ANY associative-commutative per-key
    * fold (e.g. the session fold: sum counts, min start, max end, sum
    * totals) — `aggs` must name their outputs after the payload columns
    * they fold so the empty frame's column order re-selects cleanly.
    * Probe transparency needs exactly the algebraic properties
    * compactSummed's integer sums have: the fold must reassociate across
    * the partition regrouping, which every (sum, min, max) combination
    * does. CALLER CONTRACT (same as [[compactSummed]]): fold only
    * COMMITTED batches — the sentinel makes a fold-point replay
    * non-destructive, but an uncommitted batch folded here would still
    * double-count its own mass when it replays.
    */
  def compactFolded(spark: SparkSession, storeDir: String, outDir: String,
      upTo: Long, empty: DataFrame, keyCols: Seq[String], aggs: Seq[Column]): Long = {
    val all = read(spark, storeDir, empty)
    writeCompacted(all.filter(col("batch_id") <= upTo)
      .groupBy(keyCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*),
      all, upTo, empty, outDir)
  }

  /** Compaction for LAST-WRITER-WINS stores (per-key state rows where the
    * highest `batch_id` is current, not summable partials): fold keeps
    * each key's latest row ≤ upTo. Probe-transparent for the same reason
    * replay is: "latest" reassociates — max over (max of a prefix, the
    * rest) is max over all. Ties are impossible: a trigger writes at most
    * one row per key into its own partition. CALLER CONTRACT (same as
    * [[compactSummed]]): fold only COMMITTED batches — an uncommitted
    * batch's rows folded into the sentinel lose their batch_id, so a key
    * the first attempt touched but the replay does not would keep the
    * stale attempt's row as current state forever.
    */
  def compactLatest(spark: SparkSession, storeDir: String, outDir: String,
      upTo: Long, empty: DataFrame, keyCols: Seq[String]): Long = {
    val all = read(spark, storeDir, empty)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*).orderBy(col("batch_id").desc)
    writeCompacted(all.filter(col("batch_id") <= upTo)
      .withColumn("rk", org.apache.spark.sql.functions.row_number().over(w))
      .where(col("rk") === 1).drop("rk", "batch_id"),
      all, upTo, empty, outDir)
  }

  /** Shared compaction tail: sentinel-tag the folded rows, carry the
    * uncompacted partitions, write to the NEW dir, return the row count.
    */
  private def writeCompacted(foldedRows: DataFrame, all: DataFrame, upTo: Long,
      empty: DataFrame, outDir: String): Long = {
    val folded = foldedRows
      .withColumn("batch_id", lit(FoldedBatchId))
      .select(empty.columns.toSeq.map(col): _*)
      .unionByName(all.filter(col("batch_id") > upTo))
      .persist()
    try {
      val n = folded.count()
      folded.write.mode("overwrite").partitionBy("batch_id").parquet(outDir)
      n
    } finally { folded.unpersist(); () }
  }
}
