package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.{col, desc, row_number}
import org.apache.spark.sql.streaming.DataStreamWriter

/** CDC-driven corpus ingestion — the composition where the reference's
  * event model meets the data-engine state: a stream of document CDC events
  * (INSERT / MODIFY / REMOVE, the DynamoDB stream event names —
  * `/root/reference/lib/lambda/dynamo-stream-handler.ts:18-44`) maintains
  * the external admission-dedup index ([[StreamingDedup]]'s batch_id-
  * partitioned store) with full upsert/delete semantics:
  *
  *  - INSERT/MODIFY: the new text is probed against the PRE-BATCH live
  *    state (near-dup admission — the verdict goes to the sink) and, when
  *    admitted, its shingles land in this batch's partition;
  *  - MODIFY additionally RETIRES the doc's prior index rows
  *    ([[IndexTombstones]] at this batchId — the strict-before kill rule
  *    spares the same trigger's replacement, so retire-and-readmit is ONE
  *    idempotent trigger);
  *  - REMOVE retires the doc's rows, full stop;
  *  - within a trigger, the LAST event per doc wins (`seq` order — a CDC
  *    micro-batch can carry a doc's whole INSERT→MODIFY→REMOVE life).
  *
  * ORDERING CONTRACT (per key, across triggers): `seq` orders events only
  * WITHIN a trigger; ACROSS triggers, arrival order is authoritative —
  * the store and tombstone subtrees are sequenced by `batch_id`, and a
  * tombstone at batch T kills only rows with `batch_id < T`. The ingest
  * therefore assumes the upstream CDC source delivers each key's events
  * in order across triggers, which is exactly the guarantee the
  * reference's source provides (DynamoDB Streams: a given item's
  * modifications land on one shard in order —
  * `/root/reference/lib/constructs/dynamo.ts:150-156` relies on it too).
  * Under an out-of-order source, a REMOVE delivered a trigger EARLIER
  * than its INSERT cannot kill it (the later-admitted rows outrank the
  * tombstone), permanently resurrecting the doc — if such a source must
  * be tolerated, sequence the subtrees by a global `seq` instead of
  * `batch_id` (and give replays the same seq), rather than weakening the
  * strictly-before kill rule here.
  *
  * ADMISSION-DEDUP CONSEQUENCE of the MODIFY composition: the retire is
  * unconditional but the replacement is admitted only if the probe judges
  * it non-duplicate — so a MODIFY whose new text near-dups ANOTHER doc
  * leaves this doc with no PROBING index presence (by design: its content
  * is represented by the matched doc's rows; two copies would double
  * candidate volume for no recall). The forensic gap that opens — if the
  * matched doc is later REMOVEd, near-copies of the rejected text admit
  * freely, and takedown queries for the rejected content find nothing —
  * is closed by the NON-PROBING rejected lane: every rejected upsert's
  * shingle rows land in `<storeDir>_rejected` (batch_id-partitioned,
  * replay-overwriting, never read by [[IndexTombstones.preBatchState]]),
  * so lineage queries can still locate the content and its admission
  * verdict without affecting any probe.
  *
  * Probe semantics: candidates come from the post-retire pre-admit state
  * over the WHOLE index — the initial (static corpus) rows sequenced at
  * batch -inf plus the store, past tombstones applied, this batch's retire
  * set removed ([[IndexTombstones.preBatchState]]). That kills the
  * self-match trap for store-admitted AND base-corpus docs alike (a MODIFY
  * would otherwise find its own previous version at jaccard ~1 and reject
  * its replacement as a duplicate of itself), and a REMOVE — of stream or
  * corpus content — stops blocking near-copy admissions in every later
  * trigger, not just its own. This is the contract difference vs the plain
  * external stores, whose static side is retired by corpus
  * re-fingerprinting instead: under CDC, the event stream IS the
  * authority over all content.
  *
  * Replay safety is inherited end-to-end: the probe excludes this batch's
  * own partitions in BOTH subtrees (store and tombstones), and the shingle
  * and tombstone writes are dynamic-partition overwrites — attempt 2 of a
  * batch sees exactly the state attempt 1 saw and rewrites exactly what
  * attempt 1 wrote.
  *
  * Scale shape (r20): the probe's per-shingle df cap and per-doc sizes are
  * STORE-MAINTAINED ([[IngestAggregates]] — mergeable sibling stores
  * updated with batch-sized deltas), so per trigger the raw index is
  * consumed ONCE (the candidate join, O(batch shingles ⋈ index)) plus one
  * broadcast-filtered scan on retire-carrying triggers (the negative df
  * deltas); the df lookup shuffles batch-bounded rows, the size lookup
  * aggregates |docs| rows, all writes are batch-sized, and the
  * within-trigger last-event collapse is a window over one batch. The two
  * full-index shuffles the r19 audit attributed to the recompute probe are
  * gone — per-trigger cost no longer re-aggregates accumulated history.
  */
object CorpusIngest {

  /** One document CDC event. `seq` orders events within a trigger (the
    * stream position); REMOVE rows carry empty `text`.
    */
  final case class DocEvent(seq: Long, doc_id: Long, event: String, text: String)

  /** The NON-PROBING rejected-shingle lane for a store (see the
    * admission-dedup consequence in the object scaladoc).
    */
  def rejectedDir(storeDir: String): String =
    storeDir.stripSuffix("/") + "_rejected"

  /** Two-thread pool for the concurrent middle of the write tail (the
    * aggregate deltas ∥ the admitted partition — see [[ingestBatch]]).
    * Spark action submission is thread-safe; two is exactly the
    * concurrency the tail has.
    */
  private lazy val tailEc: scala.concurrent.ExecutionContext =
    scala.concurrent.ExecutionContext.fromExecutorService(
      java.util.concurrent.Executors.newFixedThreadPool(2,
        (r: Runnable) => {
          val t = new Thread(r, "graft-ingest-tail")
          t.setDaemon(true)
          t
        }))

  /** Read the rejected lane: shingle rows + `batch_id` for every upsert the
    * probe refused — the forensic/takedown lineage of content the index
    * does NOT represent. Empty (with the store's shingle schema) before any
    * rejection commits.
    */
  def readRejectedLane(spark: SparkSession, storeDir: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(rejectedDir(storeDir))
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p) && fs.listStatus(p).exists(_.getPath.getName.startsWith("batch_id=")))
      // partition discovery infers batch_id as INT — cast back to the long
      // the writer put in (same discipline as the sibling store readers)
      spark.read.parquet(rejectedDir(storeDir))
        .select(col("doc_id"), col("shingle"),
          col("batch_id").cast("long").as("batch_id"))
    else {
      import spark.implicits._
      StreamingDedup.shingleBatch(spark.emptyDataset[StreamingDedup.Doc])
        .withColumn("batch_id",
          org.apache.spark.sql.functions.lit(0L))
        .limit(0)
    }
  }

  /** `writeFilesPerBatch`: output files per batch-partition write (admitted
    * shingles, rejected lane) — guide-§6 file sizing. A micro-batch's
    * shingle rows are batch-bounded by construction, and the pre-r21 shape
    * (shuffle-partition-many ~100 KB files per trigger) made every later
    * trigger's store scan pay the accumulated open cost; 1 is right for
    * micro-batches up to ~hundreds of MB, a fat-trigger deployment sizes
    * it to trigger volume / target file size.
    */
  def ingestStream(events: Dataset[DocEvent], initialIndex: DataFrame,
      storeDir: String, sink: (DataFrame, Long) => Unit,
      thresholdE6: Long = 500000L, maxDf: Int = 256,
      writeFilesPerBatch: Int = 1): DataStreamWriter[DocEvent] =
    events.writeStream.foreachBatch { (batch: Dataset[DocEvent], batchId: Long) =>
      ingestBatch(batch, batchId, initialIndex, storeDir, sink, thresholdE6,
        maxDf, writeFilesPerBatch)
    }

  /** One trigger's work — exposed so specs can drive batches exactly as a
    * (restarted) stream would, batchIds included.
    *
    * r20: the probe runs against the STORE-MAINTAINED aggregates
    * ([[IngestAggregates]] — the first structural 100 TB lever the r19
    * audit named): the per-shingle df cap and per-doc sizes come from
    * mergeable sibling stores updated with batch-sized deltas, so the two
    * full-index shuffles the recompute probe paid every trigger are gone;
    * the raw index is consumed ONCE (the candidate join) plus one
    * broadcast-filtered scan on retire-carrying triggers (the negative df
    * deltas). Verdicts are bit-identical to the recompute probe
    * (IngestAggregatesSpec drives both side by side through the full
    * lifecycle).
    */
  private[graft] def ingestBatch(batch: Dataset[DocEvent], batchId: Long,
      initialIndex: DataFrame, storeDir: String, sink: (DataFrame, Long) => Unit,
      thresholdE6: Long, maxDf: Int, writeFilesPerBatch: Int = 1): Unit = {
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
        // retire set: REMOVEs plus the prior version of every MODIFY (an
        // INSERT seen for a doc with prior rows would be an upstream replay
        // artifact; retiring only declared MODIFYs keeps INSERT pure-append)
        val retired = last
          .filter(col("event") === "REMOVE" || col("event") === "MODIFY")
          .select(col("doc_id"))
        // lazy, marker-guarded aggregate bootstrap (first trigger ever, or
        // self-healing after a torn compaction) — a filesystem existence
        // check on every later trigger
        IngestAggregates.ensure(spark, storeDir, initialIndex,
          StreamingDedup.readIndexStore(spark, storeDir),
          inFlightBatchId = batchId)
        // persist, not localCheckpoint (r20 in-context wall fix): a
        // separate eager checkpoint job put the negative-delta store scan
        // on the trigger's CRITICAL PATH; persisted-lazy, it materializes
        // INSIDE the verdicts checkpoint job (its scan runs in parallel
        // stages with the pre-state scan) and is reused by the aggregate
        // write. Invalidation-proof by the write order alone: its lineage
        // reads the index store + tombstones, and every consumer runs
        // BEFORE the first write to either path (rejected/sizes/df are
        // non-overlapping sibling dirs) — so even a dropped cache would
        // recompute from unchanged inputs.
        val negDelta =
          if (retired.limit(1).count() > 0)
            IngestAggregates.negativeDelta(spark, storeDir, initialIndex,
              batchId, retired,
              StreamingDedup.readIndexStore(spark, storeDir)).persist()
          else Seq.empty[(Long, Long)].toDF("shingle", "delta")
        // persisted: the maintained probe consumes the batch's shingles
        // THREE times (the df-lookup broadcast build, the candidate join,
        // the per-doc size agg) — unpersisted lineage re-ran the shingling
        // mapPartitions per consumer (r20 in-context bench regression,
        // measured via the sections-only A/B against the recompute probe)
        val newSh = StreamingDedup.shingleBatch(upserts).persist()
        // post-retire pre-admit state over the WHOLE index — initial rows
        // included, sequenced at batch -inf so past tombstones kill them
        // too (a MODIFY of a base-corpus doc must not self-match its own
        // static shingles and reject its replacement; a REMOVE of one must
        // stop blocking near-copy admissions in every later trigger)
        val preState = IndexTombstones.preBatchState(spark, storeDir,
          initialIndex, "doc_id", batchId, retired,
          StreamingDedup.readIndexStore(spark, storeDir))
        val verdicts =
          try graft.ops.Incremental.probeWithAggregates(
              upserts.select("doc_id"), newSh, preState,
              IngestAggregates.preBatchDf(spark, storeDir, batchId, newSh, negDelta),
              IngestAggregates.preBatchSizes(spark, storeDir, batchId, retired),
              thresholdE6, maxDf)
            .localCheckpoint(true)
          finally { newSh.unpersist(); () } // lc is eager — consumers are done
        sink(verdicts, batchId)
        // WRITE ORDER (r19 rule, r20 shape): `verdicts` and `negDelta` are
        // lineage-truncated, so the probe can no longer be silently
        // recomputed by a path refresh — but the ORDER still carries the
        // crash-window contracts: the rejected lane first (an admitted doc
        // must never exist without its lineage row), the maintained
        // aggregates and the admitted partition next, the tombstones LAST
        // (a tombstone kills only batch_id strictly below its own, so the
        // admitted rows it follows are never its victims; every write is a
        // dynamic-partition overwrite, so any crash window replays to the
        // identical state).
        val docEnc = org.apache.spark.sql.Encoders.product[StreamingDedup.Doc]
        val rejected = upserts.join(
          verdicts.filter(col("is_dup") =!= 0L).select("doc_id"),
          Seq("doc_id"), "left_semi")
        StreamingDedup.shingleBatch(rejected.as[StreamingDedup.Doc](docEnc))
          .withColumn("batch_id", org.apache.spark.sql.functions.lit(batchId))
          .coalesce(writeFilesPerBatch)
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(rejectedDir(storeDir))
        val admitted = upserts.join(
          verdicts.filter(col("is_dup") === 0L).select("doc_id"),
          Seq("doc_id"), "left_semi")
        // consumed three times (sizes, df positives, store write); its
        // lineage reads only the cached batch and checkpointed verdicts,
        // so the persist is refresh-proof
        val admittedSh = StreamingDedup
          .shingleBatch(admitted.as[StreamingDedup.Doc](docEnc)).persist()
        try {
          // the aggregate-store deltas and the admitted partition are
          // mutually independent (disjoint sibling dirs, both reading only
          // the cached admittedSh / persisted negDelta) and the write-order
          // contract constrains them only relative to the rejected lane
          // (before) and the tombstones (after) — so they run as
          // CONCURRENT jobs (guide §2.6: overlap independent jobs; the
          // serial tail paid one scheduler round-trip per write on
          // batch-sized data). Both must COMMIT before the tombstone
          // write, which Await guarantees. A cold admittedSh cache is
          // block-locked per partition, so the racing jobs materialize it
          // once between them.
          val fAgg = scala.concurrent.Future {
            IngestAggregates.writeDeltas(spark, storeDir, batchId, admittedSh, negDelta)
          }(tailEc)
          val fStore = scala.concurrent.Future {
            admittedSh
              .withColumn("batch_id", org.apache.spark.sql.functions.lit(batchId))
              .coalesce(writeFilesPerBatch)
              .write.mode("overwrite")
              .option("partitionOverwriteMode", "dynamic")
              .partitionBy("batch_id")
              .parquet(storeDir)
          }(tailEc)
          scala.concurrent.Await.result(fAgg,
            scala.concurrent.duration.Duration.Inf)
          scala.concurrent.Await.result(fStore,
            scala.concurrent.duration.Duration.Inf)
          IndexTombstones.retire(spark, storeDir, retired, "doc_id", batchId)
        } finally { admittedSh.unpersist(); negDelta.unpersist(); () }
      } finally { upserts.unpersist(); () }
    } finally { last.unpersist(); () }
  }

  /** Compaction for a CDC-ingest store: the main fold
    * ([[StreamingDedup.compactIndexStore]] — tombstones applied physically,
    * carried set forward) plus the aggregate stores' sibling folds
    * ([[IngestAggregates.compact]]), all under `outDir`. The aggregate fold
    * runs only when `storeDir` actually carries aggregates — compacting a
    * plain [[StreamingDedup]] store through here stays valid (the missing
    * marker makes the next [[ingestBatch]] against `outDir` rebuild them).
    * Returns main-store rows written.
    *
    * STATIC-RETIREMENT CARRY (r20 bug fix): [[ingestBatch]] lets CDC events
    * retire INITIAL-index content, but the initial frame is re-supplied to
    * every trigger rather than stored — so a tombstone that kills an
    * initial doc can never be spent by physically dropping rows. The plain
    * fold treats every tombstone at or below the fold point as spent; a
    * retired STATIC doc's near-copies would silently start admitting again
    * after compaction (and takedown'd static content would resurrect in the
    * probe). Here tombstones on initial-index docs are CARRIED at their
    * original batch ids regardless of the fold point. LSM sequencing stays
    * valid: folded store rows take `batch_id = upToBatchId` ≥ any carried
    * tombstone's batch, so only the initial rows (at batch -inf) keep
    * dying. The carried set is bounded by |initial docs ever retired| —
    * monotone but tiny next to the store, and spendable the day the corpus
    * re-fingerprints (a rebuilt initial index makes them moot).
    */
  def compactStores(spark: SparkSession, storeDir: String, outDir: String,
      initialIndex: DataFrame, upToBatchId: Long,
      targetPartitions: Int = 1): Long = {
    val n = StreamingDedup.compactIndexStore(spark, storeDir, outDir,
      upToBatchId, targetPartitions)
    val initTombs = IndexTombstones.read(spark, storeDir, "doc_id")
      .filter(col("batch_id") <= upToBatchId)
      .join(initialIndex.select(col("doc_id")).distinct(),
        Seq("doc_id"), "left_semi")
    // append: the main fold wrote only batch_id > upToBatchId partitions
    // under outDir's tombstone subtree, disjoint from these by construction
    if (initTombs.limit(1).count() > 0)
      initTombs.write.mode("append").partitionBy("batch_id")
        .parquet(IndexTombstones.dir(outDir))
    if (IngestAggregates.ready(spark, storeDir))
      // keepBootstrapSizes = true: the path store's initial index never
      // folds, so its sizes mirror must stay at BootstrapBatch — the
      // retire-after-compact negative-delta gate depends on it (r20 ADVICE)
      IngestAggregates.compact(spark, storeDir, outDir, upToBatchId,
        keepBootstrapSizes = true)
    n
  }
}
