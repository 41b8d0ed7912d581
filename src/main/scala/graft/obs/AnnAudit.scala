package graft.obs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Similarity
import graft.streaming.StreamingAnn

/** Diagnosis main for the `streaming_ann` bench section (r19 verdict item
  * 3: 44.5 cpu-s / 51k rows, 1.2k rows/s — the second-costliest monitor):
  * attribute per-trigger cost across the probe's stages and answer the one
  * scale question that matters — does ANY stage grow with accumulated
  * store size?
  *
  * Drives the SAME synthesized arrival workload as
  * [[StreamingBench.annE2e]] (every 10th embedding × `arrivalCopies`
  * replicas under fresh ids in bits 40+) in rep-contiguous slices, and
  * measures two regimes with [[ScopedMetrics]]:
  *
  *  - STATIC (the bench's shape — [[StreamingAnn.admissionStream]]): per
  *    slice, `full_trigger` (the complete probe, as the bench runs it),
  *    then the replayed stages — `probe_side` (norms + multi-probe bucket
  *    explode of the batch: pure map work ∝ batch), `candidate_join`
  *    (query buckets ⋈ static index home rows with the exact-cosine
  *    score), leaving top-k (the rank window + post-prune distinct) as
  *    full − candidate. `candidates` records the per-slice candidate-row
  *    volume — the boundedness claim (~nTables × (1+probes) × targetBucket
  *    per vector) made measurable.
  *  - GROWING ([[StreamingAnn.externalBatch]] — the production
  *    accumulating-store form): per-trigger wall/cpu recorded SEPARATELY
  *    per slice alongside the store's accumulated row count, so growth
  *    with history is read directly off the artifact instead of argued.
  *
  * Prints one JSON line (and writes args(0), default `ANN_AUDIT.json`).
  */
object AnnAudit {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nSlices = 8
    val arrivalCopies = 256
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val emb = graft.ops.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val corpusN = emb.count()
    val bits = Similarity.adaptiveBits(corpusN)
    val nTables = Similarity.DefaultTables
    val probes = Similarity.DefaultProbes
    // the bench's broadcast gate, verbatim
    val broadcastIdx = corpusN * nTables * 300L < 50L * 1024 * 1024
    val idxHome = Similarity.indexHome(Similarity.lshIndex(spark, sfDir,
      nTables, bits, probes, excludeMod = 10)).persist()
    idxHome.count() // pre-materialized state, as in the bench

    val arrivals = emb.filter(col("vec_id") % 10 === 0)
      .withColumn("rep", explode(expr(s"sequence(0, ${arrivalCopies - 1})")))
      .select(
        (col("vec_id") + shiftleft(col("rep").cast("long"), 40)).as("vec_id"),
        col("embedding"), col("rep"))
      .persist()
    val total = arrivals.count()

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
    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def sliceOf(i: Int) = {
      val lo = i.toLong * arrivalCopies / nSlices
      val hi = (i + 1).toLong * arrivalCopies / nSlices
      arrivals.filter(col("rep") >= lo && col("rep") < hi)
        .select(col("vec_id"), col("embedding")).as[StreamingAnn.Vec]
    }

    // ---- STATIC regime: the bench's per-trigger shape, staged ----
    var candRows = 0L
    (0 until nSlices).foreach { i =>
      val batch = sliceOf(i).persist()
      batch.count()
      measure("full_trigger") {
        noop(StreamingAnn.probeBatch(batch, idxHome, nTables, bits, probes,
          k = 5, broadcastIdx = broadcastIdx))
      }
      val side = measure("probe_side") {
        val s = Similarity.probeSide(batch.toDF(), nTables, bits, probes)
        noop(s)
        s
      }
      // noop, not count(): a bare count would let column pruning drop the
      // sim expression entirely and charge every dot product to the top-k
      // stage instead (the first cut of this audit did exactly that)
      val cands = Similarity.probeCandidates(side, idxHome, broadcastIdx)
      measure("candidate_join") { noop(cands) }
      candRows += cands.count()
      batch.unpersist()
      ()
    }

    // ---- GROWING regime: per-trigger cost vs accumulated store ----
    val store = graft.ops.Scratch.dir("graft_annaudit") + "/store/idx"
    val growing = (0 until nSlices).map { i =>
      val batch = sliceOf(i).persist()
      batch.count()
      val (_, wall, cpu) = timed {
        StreamingAnn.externalBatch(batch, i.toLong, idxHome, store,
          (df, _) => { df.count(); () }, nTables, bits, probes, 5, broadcastIdx)
      }
      batch.unpersist()
      val storeRows = StreamingAnn.readIndexStore(spark, store).count()
      (i, wall, cpu, storeRows)
    }

    def r2(v: Double) = math.rint(v * 100) / 100.0
    val staticBody = stages.map { case (k, (wall, cpu)) =>
      s""""$k":{"wall_s":${r2(wall)},"cpu_s":${r2(cpu)}}"""
    }.mkString(",")
    val growBody = growing.map { case (i, wall, cpu, rows) =>
      s"""{"batch":$i,"wall_s":${r2(wall)},"cpu_s":${r2(cpu)},"store_rows":$rows}"""
    }.mkString(",")
    val json = s"""{"metric":"ann_audit","input_rows":$total,""" +
      s""""slices":$nSlices,"corpus_n":$corpusN,"bits":$bits,""" +
      s""""broadcast_idx":$broadcastIdx,"static":{$staticBody,""" +
      s""""candidates":$candRows},"growing":[$growBody],"sf":"$sfDir"}"""
    val outPath = if (args.nonEmpty) args(0) else "ANN_AUDIT.json"
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(json)
    spark.stop()
  }
}
