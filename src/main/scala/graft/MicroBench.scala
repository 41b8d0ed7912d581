package graft

import org.apache.spark.sql.SparkSession

/** Iteration harness: time a SUBSET of SparkEntry queries, each `reps`
  * times, in one warmed session — the inner loop for performance work that
  * [[Bench]] (full sweep, driver contract) is too slow for.
  *
  * Usage: runMain graft.MicroBench <sfDir> <reps> <query> [query ...]
  * Rep 1 includes any cold memoized builds; later reps show the steady
  * state, so the delta exposes how much of a query's bench cost is shared
  * index construction vs its own plan.
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: MicroBench <sfDir> <reps> <query> [query ...]")
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    for (t <- Seq("lineitem", "orders", "customer", "supplier", "part",
        "nation", "region", "documents", "embeddings"))
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => () }
    try graft.ops.Tables.events(spark, sfDir).count()
    catch { case _: Throwable => () }
    // mirror Bench's warmup so rep-1 numbers line up with BENCH.json
    try graft.ops.Warm.sharedFrames(spark, sfDir)
    catch { case _: Throwable => () }
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query '$name'; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      // stderr is sbt's log channel; markers on stdout survive the noise
      println(f"MICROBENCH $name%s ${times.map(t => f"$t%.3f").mkString(" ")}")
    }
    spark.stop()
  }
}
