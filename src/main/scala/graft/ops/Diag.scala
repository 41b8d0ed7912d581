package graft.ops

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

// temporary profiling harness (not part of the library surface)
object Diag {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"DIAG $label ${(System.nanoTime() - t0) / 1e9}%.3f"); r
    }

    @volatile var stages = List.empty[(Int, Long, Long, Int, String)]
    @volatile var jobs = List.empty[(Int, Long)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
        stages = (si.stageId, wall, si.taskMetrics.executorRunTime,
          si.numTasks, si.name.take(60)) :: stages
      }
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs = (js.jobId, js.time) :: jobs
    })

    time("warm")(Warm.sharedFrames(spark, d))
    stages = Nil; jobs = Nil
    val df = Similarity.annTopK(spark, d, recallQueries = 0)
    time("ann_topk_production") {
      df.write.mode("overwrite").format("noop").save()
    }
    println("DIAGPLAN " + df.queryExecution.executedPlan.toString)
    println(s"DIAG production jobs=${jobs.size} stages=${stages.size}")
    stages.reverse.foreach { case (id, wall, run, nt, nm) =>
      println(f"DIAG stage $id%3d wall ${wall / 1e3}%6.2f runSum ${run / 1e3}%7.2f tasks $nt%3d  $nm")
    }
    spark.stop()
  }
}
