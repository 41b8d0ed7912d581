package graft.obs

// TEMPORARY r21 diagnostic — row counts and stage breakdown of daily_drift.
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object DriftDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    def phase[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val (r, snap) = ScopedMetrics.measure(spark)(f)
      val w = (System.nanoTime() - t0) / 1e9
      println(f"DRIFTDIAG $name%-14s wall=$w%6.2f cpu=${snap.executorCpuNs / 1e9}%6.2f " +
        f"tasks=${snap.tasks}%4d swMB=${snap.shuffleWriteMb}%7.2f gcMs=${snap.jvmGcMs}")
      r
    }
    val ev = graft.ops.Tables.events(spark, sfDir)
    println("events rows=" + ev.count())
    val df = graft.ops.Temporal.dailyDrift(spark, sfDir)
    phase("warmup")(df.write.mode("overwrite").format("noop").save())
    (1 to 2).foreach { _ =>
      phase("drift_noop") {
        graft.ops.Temporal.dailyDrift(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
      }
    }
    // histogram cardinality
    val h: org.apache.spark.sql.DataFrame =
      graft.ops.Memo(spark, s"ev_dayhist|$sfDir|1000") {
        sys.error("memo should be hot"): org.apache.spark.sql.DataFrame
      }
    println("hist rows=" + h.count() +
      " typedays=" + h.select("event_type", "day").distinct().count())
    spark.stop()
  }
}
