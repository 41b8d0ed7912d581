import org.apache.spark.sql.SparkSession
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    val d = "/root/testdata/sf0.01"
    for (n <- Seq("timeseries_gapfill", "bloom_semi_join", "bm25_scores", "editdist_pairs", "scd2_dimension")) {
      println(s"===== $n")
      println(graft.SparkEntry.queries(n)(spark, d).queryExecution.executedPlan.toString.take(3500))
    }
    spark.stop()
  }
}
