package graft.obs

// TEMPORARY r21 diagnostic — phase-level breakdown of pagerank_bipartite.
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object PrDiag {
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
    import graft.ops.Tables

    (1 to 2).foreach { rep =>
      def phase[T](name: String)(f: => T): T = {
        val t0 = System.nanoTime()
        val (r, snap) = ScopedMetrics.measure(spark)(f)
        val w = (System.nanoTime() - t0) / 1e9
        println(f"PRDIAG rep=$rep $name%-14s wall=$w%6.2f cpu=${snap.executorCpuNs / 1e9}%6.2f " +
          f"tasks=${snap.tasks}%4d swMB=${snap.shuffleWriteMb}%7.2f gcMs=${snap.jvmGcMs}")
        r
      }
      val li = Tables.lineitem(spark, sfDir)
        .select((col("l_partkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
        .distinct().persist()
      phase("li")(li.count())
      val edges = li.unionAll(li.select(col("dst").as("src"), col("src").as("dst")))
      val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
        .select(col("src").as("node"), col("deg")).persist()
      val n = phase("deg")(deg.count())
      val nodes = deg.select("node")
      val basePart = 150000000L / n
      var ranks = nodes.withColumn("rank_e9", lit(1000000000L / n))
      (1 to 3).foreach { i =>
        val prev = ranks
        ranks = graft.ops.Graph.iterate(edges, deg, nodes, ranks, basePart, useBroadcast = true)
        phase(s"iter$i") { ranks.persist().count() }
        if (i > 1) prev.unpersist()
        ()
      }
      li.unpersist(); deg.unpersist()
      phase("orderBy") {
        ranks.orderBy("node").write.mode("overwrite").format("noop").save()
      }
      ranks.unpersist()
      ()
    }
    spark.stop()
  }
}
