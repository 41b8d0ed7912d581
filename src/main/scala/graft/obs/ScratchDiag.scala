package graft.obs

// TEMPORARY r21 diagnostic — not part of the engine surface; removed or
// kept dev-only. Runs a few ingest triggers and reports store file counts
// and per-trigger job breakdown.
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ScratchDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.streaming.{CorpusIngest, StreamingDedup}
    val docs = graft.ops.Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val indexSh = graft.ops.Dedup.shingles(docs.filter(col("doc_id") % 10 =!= 0)).persist()
    indexSh.count()
    val events = StreamingBench.synthIngestEvents(spark, sfDir, 64).persist()
    events.count()
    val store = graft.ops.Scratch.dir("graft_diag") + "/store/idx"
    def countFiles(dir: String): Int = {
      val p = new java.io.File(dir)
      if (!p.exists()) 0
      else {
        val out = new scala.collection.mutable.ArrayBuffer[java.io.File]
        def walk(f: java.io.File): Unit =
          if (f.isDirectory) f.listFiles().foreach(walk)
          else if (f.getName.endsWith(".parquet")) out += f
        walk(p); out.size
      }
    }
    (0 until 4).foreach { i =>
      val lo = i.toLong * 8; val hi = lo + 8
      val batch = events.filter(col("seq") >= lo && col("seq") < hi)
        .as[CorpusIngest.DocEvent].persist()
      batch.count()
      val t0 = System.nanoTime()
      CorpusIngest.ingestBatch(batch, i.toLong, indexSh, store,
        (df, _) => { df.count(); () }, thresholdE6 = 500000L, maxDf = 256)
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"DIAG trigger=$i wall=$wall%.2f store_files=${countFiles(store)} " +
        f"sizes=${countFiles(store + "_sizes")} df=${countFiles(store + "_df")} " +
        f"tomb=${countFiles(store + "_tombstones")} rej=${countFiles(store + "_rejected")}")
      batch.unpersist()
      ()
    }
    spark.stop()
  }
}
