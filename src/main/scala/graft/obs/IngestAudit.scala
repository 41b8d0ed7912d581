package graft.obs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.streaming.{CorpusIngest, IndexTombstones, IngestAggregates, StreamingDedup}

/** Diagnosis main for the `streaming_ingest` bench section's per-row cost
  * (r18 verdict item 3: 719 rows/s, 8.1 cpu-ms/row — attribute probe-join
  * vs shingle-build vs tombstone maintenance). Drives the SAME synthesized
  * workload as [[StreamingBench.ingestE2e]] ([[StreamingBench
  * .synthIngestEvents]]) in `seq`-contiguous slices, runs each slice once
  * through the REAL [[CorpusIngest.ingestBatch]] (so the store/tombstone
  * subtrees evolve exactly as the bench's do), then re-measures that
  * trigger's stages separately with [[ScopedMetrics]]:
  *
  *  - `collapse`       — last-event-per-doc window over the batch
  *  - `shingle_batch`  — shingling the surviving upserts
  *  - `prestate`       — ONE pass through the pre-batch live-state lineage
  *                       (store read ∪ initial, tombstone agg+join, retire
  *                       anti-join) — the "tombstone maintenance" cost
  *  - `probe_cached`   — the RECOMPUTE probe join against a PERSISTED
  *                       pre-state — the r19 irreducible-cost baseline
  *  - `probe_recompute`— the r19 production shape (pre-state as a lineage,
  *                       recomputed by each of the recompute probe's THREE
  *                       index consumptions: df-cap agg, per-doc sizes,
  *                       candidate join) — the comparison baseline for the
  *                       maintained form
  *  - `probe_maintained` — the r20 production shape: negative deltas (on
  *                       retire-carrying triggers) + store-maintained
  *                       df/size lookups + ONE candidate join, verdicts
  *                       localCheckpoint'ed exactly as [[CorpusIngest
  *                       .ingestBatch]] runs it
  *
  * Stage measurements replay against the same `batchId` AFTER the real
  * trigger committed — [[IndexTombstones.preBatchState]] excludes the
  * probing batch's own partitions, so each stage sees exactly the state
  * the real trigger saw (the replay-stability contract doubling as a
  * measurement harness). Prints one JSON line (and writes args(0), default
  * `INGEST_AUDIT.json`) with per-stage totals across slices.
  */
object IngestAudit {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nSlices = 8
    val arrivalCopies = 64
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val docs = graft.ops.Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val indexSh = graft.ops.Dedup.shingles(docs.filter(col("doc_id") % 10 =!= 0)).persist()
    indexSh.count() // pre-materialized static state, as in the bench
    val events = StreamingBench.synthIngestEvents(spark, sfDir, arrivalCopies).persist()
    val total = events.count()
    val store = graft.ops.Scratch.dir("graft_ingestaudit") + "/store/idx"

    val stages = scala.collection.mutable.LinkedHashMap
      .empty[String, (Double, Double)] // wall_s, cpu_s
    def timed[A](body: => A): (A, Double, Double) = {
      var out: Option[A] = None
      val t0 = System.nanoTime()
      val (_, snap) = ScopedMetrics.measure(spark) { out = Some(body) }
      (out.get, (System.nanoTime() - t0) / 1e9, snap.executorCpuNs / 1e9)
    }
    def measure[A](name: String)(body: => A): A = {
      val (out, wall, cpu) = timed(body)
      val (w0, c0) = stages.getOrElse(name, (0.0, 0.0))
      stages(name) = (w0 + wall, c0 + cpu)
      out
    }
    val pathSlices = scala.collection.mutable.ArrayBuffer.empty[(Int, Double, Double)]
    val bucketedSlices = scala.collection.mutable.ArrayBuffer.empty[(Int, Double, Double)]
    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    // RANDOM=1 assigns events to slices by hash instead of seq ranges —
    // the bench's `repartition(nFiles)` arrival shape, where a doc's
    // admission / MODIFY / REMOVE scatter across triggers and the
    // negative-delta partition prune stops pruning (the r20 in-context
    // regression's reproduction shape)
    val randomSplit = sys.env.contains("SPARK_GRAFT_INGEST_AUDIT_RANDOM")
    def sliceOf(i: Int) =
      if (randomSplit)
        events.filter(pmod(hash(col("doc_id"), col("seq")), lit(nSlices)) === i)
      else {
        val lo = i.toLong * arrivalCopies / nSlices
        val hi = (i + 1).toLong * arrivalCopies / nSlices
        events.filter(col("seq") >= lo && col("seq") < hi)
      }
    (0 until nSlices).foreach { i =>
      val batch = sliceOf(i).as[CorpusIngest.DocEvent].persist()
      batch.count()
      // the real trigger — evolves the store exactly as the bench's does
      locally {
        val (_, wall, cpu) = timed {
          CorpusIngest.ingestBatch(batch, i.toLong, indexSh, store,
            (df, _) => { df.count(); () }, thresholdE6 = 500000L, maxDf = 256)
        }
        pathSlices += ((i, wall, cpu))
        val (w0, c0) = stages.getOrElse("full_trigger", (0.0, 0.0))
        stages("full_trigger") = (w0 + wall, c0 + cpu)
      }
      // stage replay against the same batchId: own partitions excluded, so
      // every stage sees the state the real trigger saw
      val w = Window.partitionBy(col("doc_id")).orderBy(desc("seq"))
      val last = measure("collapse") {
        val l = batch.toDF()
          .withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
          .persist()
        l.count()
        l
      }
      val upserts = last.filter(col("event") =!= "REMOVE")
        .select(col("doc_id"), col("text"))
        .as[StreamingDedup.Doc].persist()
      upserts.count()
      measure("shingle_batch") { noop(StreamingDedup.shingleBatch(upserts)) }
      val retired = last
        .filter(col("event") === "REMOVE" || col("event") === "MODIFY")
        .select(col("doc_id"))
      def preState = IndexTombstones.preBatchState(spark, store,
        indexSh, "doc_id", i.toLong, retired,
        StreamingDedup.readIndexStore(spark, store))
      measure("prestate") { noop(preState) }
      val cached = preState.persist()
      cached.count() // materialize OUTSIDE the probe_cached window
      measure("probe_cached") {
        noop(StreamingDedup.probeBatch(upserts, cached, 500000L, 256))
      }
      cached.unpersist()
      measure("probe_recompute") {
        noop(StreamingDedup.probeBatch(upserts, preState, 500000L, 256))
      }
      val verdicts = measure("probe_maintained") {
        val negDelta =
          if (retired.limit(1).count() > 0)
            IngestAggregates.negativeDelta(spark, store, indexSh, i.toLong,
              retired, StreamingDedup.readIndexStore(spark, store))
              .localCheckpoint(true)
          else Seq.empty[(Long, Long)].toDF("shingle", "delta")
        val newSh = StreamingDedup.shingleBatch(upserts).persist()
        try graft.ops.Incremental.probeWithAggregates(
            upserts.select("doc_id"), newSh, preState,
            IngestAggregates.preBatchDf(spark, store, i.toLong, newSh, negDelta),
            IngestAggregates.preBatchSizes(spark, store, i.toLong, retired),
            500000L, 256)
          .localCheckpoint(true)
        finally { newSh.unpersist(); () }
      }
      // the write tail, replayed idempotently (dynamic-partition overwrite
      // of the SAME batch partitions with identical content — exactly the
      // at-least-once replay the store contract absorbs)
      // production order (the r19 WRITE ORDER RULE): rejected, admitted,
      // tombstones LAST — a store/tombstone write before the last verdicts
      // consumer refreshes a read path and recomputes the whole probe (the
      // pre-fix ordering measured exactly one extra probe in tail_rejected)
      val docEnc = org.apache.spark.sql.Encoders.product[StreamingDedup.Doc]
      measure("tail_rejected") {
        val side = upserts.join(
          verdicts.filter(col("is_dup") =!= 0L).select("doc_id"),
          Seq("doc_id"), "left_semi")
        StreamingDedup.shingleBatch(side.as[StreamingDedup.Doc](docEnc))
          .withColumn("batch_id", lit(i.toLong))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(CorpusIngest.rejectedDir(store))
      }
      val admitted = upserts.join(
        verdicts.filter(col("is_dup") === 0L).select("doc_id"),
        Seq("doc_id"), "left_semi")
      val admittedSh = StreamingDedup
        .shingleBatch(admitted.as[StreamingDedup.Doc](docEnc)).persist()
      measure("tail_aggregates") {
        val negDelta =
          if (retired.limit(1).count() > 0)
            IngestAggregates.negativeDelta(spark, store, indexSh, i.toLong,
              retired, StreamingDedup.readIndexStore(spark, store))
              .localCheckpoint(true)
          else Seq.empty[(Long, Long)].toDF("shingle", "delta")
        IngestAggregates.writeDeltas(spark, store, i.toLong, admittedSh, negDelta)
      }
      measure("tail_admitted") {
        admittedSh
          .withColumn("batch_id", lit(i.toLong))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(store)
      }
      measure("tail_tombstone") {
        IndexTombstones.retire(spark, store, retired, "doc_id", i.toLong)
      }
      admittedSh.unpersist()
      upserts.unpersist(); last.unpersist(); batch.unpersist()
      ()
    }
    // ---- BUCKETED regime (lever b, r20): the same slice sequence through
    // BucketedCorpusIngest — per-slice wall/cpu recorded separately, so the
    // local no-regression claim (and any co-location cpu effect: the
    // bucketed+sorted scan feeds the candidate SMJ with neither exchange
    // nor sort on the store side) is read off the artifact. The NETWORK
    // claim stays plan-shape evidence (docs/TUNING.md) — one box has no
    // network to save.
    locally {
      import graft.streaming.BucketedCorpusIngest
      val table = "graft_ingestaudit_bucketed"
      val aux = graft.ops.Scratch.dir("graft_ingestaudit_baux") + "/store/idx"
      BucketedCorpusIngest.bootstrap(spark, table, aux, indexSh,
        nBuckets = cpus.toInt)
      (0 until nSlices).foreach { i =>
        val batch = sliceOf(i).as[CorpusIngest.DocEvent].persist()
        batch.count()
        val (_, wall, cpu) = timed {
          BucketedCorpusIngest.ingestBatch(batch, i.toLong, table, aux,
            (df, _) => { df.count(); () }, thresholdE6 = 500000L, maxDf = 256)
        }
        bucketedSlices += ((i, wall, cpu))
        batch.unpersist()
        ()
      }
      spark.sql(s"DROP TABLE IF EXISTS $table")
      ()
    }
    events.unpersist()

    def r2(v: Double) = math.rint(v * 100) / 100.0
    val body = stages.map { case (k, (wall, cpu)) =>
      s""""$k":{"wall_s":${r2(wall)},"cpu_s":${r2(cpu)}}"""
    }.mkString(",")
    def sliceJson(s: Seq[(Int, Double, Double)]) = s.map { case (i, w, c) =>
      s"""{"batch":$i,"wall_s":${r2(w)},"cpu_s":${r2(c)}}"""
    }.mkString("[", ",", "]")
    val json = s"""{"metric":"ingest_audit","input_rows":$total,""" +
      s""""slices":$nSlices,$body,""" +
      s""""path_triggers":${sliceJson(pathSlices.toSeq)},""" +
      s""""bucketed_triggers":${sliceJson(bucketedSlices.toSeq)},""" +
      s""""sf":"$sfDir"}"""
    val outPath = if (args.nonEmpty) args(0) else "INGEST_AUDIT.json"
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(json)
    spark.stop()
  }
}
