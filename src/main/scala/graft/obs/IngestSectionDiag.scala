package graft.obs

// TEMPORARY r21 diagnostic — run the streaming_ingest bench section alone.
import org.apache.spark.sql.SparkSession

object IngestSectionDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val reps = if (args.nonEmpty) args(0).toInt else 2
    (1 to reps).foreach { rep =>
      val (st, snap) = ScopedMetrics.measure(spark) {
        StreamingBench.ingestE2e(spark, sfDir)
      }
      println(f"INGESTDIAG rep=$rep wall=${st.wallSec}%.2f cpu=${snap.executorCpuNs / 1e9}%.2f " +
        f"batches=${st.batches} steady_rps=${st.steadyRowsPerSec}%.1f gcMs=${snap.jvmGcMs}")
    }
    spark.stop()
  }
}
