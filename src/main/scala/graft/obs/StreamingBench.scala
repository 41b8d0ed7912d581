package graft.obs

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.attr.{Json, JsonParser}
import graft.cdc.{CdcConfig, CdcPipeline}
import graft.synth.CdcSynth

/** Streaming throughput evidence: drives the REAL CDC pipeline
  * ([[CdcPipeline.stream]] — DSv2 source → record program → claim-check +
  * parquet bus sink, exactly-once) end-to-end over synthesized wire-form
  * records and reports rows/sec + micro-batch latency from the engine's own
  * `StreamingQueryProgress`. Bench appends the result as the `"streaming"`
  * section of BENCH.json; StreamingSpec asserts the stats populate.
  */
object StreamingBench {

  final case class StreamStats(
      inputRows: Long, busRows: Long, batches: Long,
      wallSec: Double, rowsPerSec: Double, avgBatchMs: Double)

  /** Serialize a synth [[graft.cdc.CdcRecord]] back to the stream-record
    * wire shape (FIXTURES.md §A1): Keys/Images are nested JSON OBJECTS on
    * the wire, which [[CdcSynth.records]] carries as marshalled strings.
    */
  private def wireLine(eventID: String, eventName: String, size: Long,
      keys: String, newImage: Option[String], oldImage: Option[String]): String = {
    val ddb = Vector.newBuilder[(String, Json)]
    ddb += ("SizeBytes" -> Json.JNum.of(size))
    ddb += ("Keys" -> JsonParser.parse(keys))
    newImage.foreach(n => ddb += ("NewImage" -> JsonParser.parse(n)))
    oldImage.foreach(o => ddb += ("OldImage" -> JsonParser.parse(o)))
    Json.obj(
      "eventID" -> Json.JStr(eventID),
      "eventName" -> Json.JStr(eventName),
      "dynamodb" -> Json.JObj(ddb.result())).print
  }

  /** One e2e run at the given scale dir. Input JSON lines are written with
    * Spark (`nFiles` files — the micro-batch split granularity for the
    * file-arrival source), never collected to the driver.
    */
  def cdcE2e(spark: SparkSession, d: String, nFiles: Int = 8): StreamStats = {
    import spark.implicits._
    val base = graft.ops.Scratch.dir("graft_streambench")
    val in = s"$base/in"
    val lines = CdcSynth.records(spark, d).map { r =>
      val p = r.dynamodb.get
      wireLine(r.eventID.get, r.eventName.get, p.SizeBytes.getOrElse(0L),
        p.Keys.get, p.NewImage, p.OldImage)
    }
    lines.repartition(nFiles).write.text(in)
    val inputRows = spark.read.text(in).count()

    val cfg = CdcConfig(eventSource = "bench", blobDir = s"$base/blobs")
    val t0 = System.nanoTime()
    val q = CdcPipeline.stream(spark, in, s"$base/bus", s"$base/ckpt", cfg).start()
    q.awaitTermination()
    val wall = (System.nanoTime() - t0) / 1e9
    // recentProgress is a ring capped at numRecentProgressUpdates (100), so
    // the true batch COUNT comes from the last batchId; avgBatchMs is an
    // average over the retained tail — fine for latency evidence, and exact
    // whenever the run fits the ring (it does at the bench scales)
    val progress = q.recentProgress.toSeq
    val batches = Option(q.lastProgress).map(_.batchId + 1)
      .getOrElse(progress.size.toLong)
    val batchMs = progress.flatMap(p => Option(p.durationMs.get("triggerExecution")).map(_.toLong))
    val busRows = spark.read.parquet(s"$base/bus").count()
    StreamStats(
      inputRows = inputRows,
      busRows = busRows,
      batches = batches,
      wallSec = wall,
      rowsPerSec = if (wall > 0) inputRows / wall else 0.0,
      avgBatchMs = if (batchMs.nonEmpty) batchMs.sum.toDouble / batchMs.size else 0.0)
  }
}
