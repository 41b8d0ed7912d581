package graft.obs

import org.apache.spark.sql.SparkSession

/** Diagnosis main: split one registered query's wall into CONSTRUCTION
  * (the `SparkEntry.queries` thunk — where Memo builds and any eager
  * driver actions like the percentile-split head/histogram run) and
  * EXECUTION (the noop write of the returned frame), per rep. The bench
  * reports one fused number; when a query's warm wall looks wrong, this
  * says which half owns it. Usage:
  * `SPARK_GRAFT_SF_DIR=... runMain graft.obs.QueryDissect <query> [reps]`.
  */
object QueryDissect {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: QueryDissect <queryName> [reps]")
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val fn = graft.SparkEntry.queries(name)
    (1 to reps).foreach { rep =>
      val t0 = System.nanoTime()
      val (df, cSnap) = ScopedMetrics.measure(spark) { fn(spark, sfDir) }
      val t1 = System.nanoTime()
      val (_, eSnap) = ScopedMetrics.measure(spark) {
        df.write.mode("overwrite").format("noop").save()
      }
      val t2 = System.nanoTime()
      def r2(v: Double) = math.rint(v * 100) / 100.0
      println(s"DISSECT $name rep=$rep" +
        s" construct_s=${r2((t1 - t0) / 1e9)} construct_cpu_s=${r2(cSnap.executorCpuNs / 1e9)}" +
        s" exec_s=${r2((t2 - t1) / 1e9)} exec_cpu_s=${r2(eSnap.executorCpuNs / 1e9)}")
    }
    spark.stop()
  }
}
