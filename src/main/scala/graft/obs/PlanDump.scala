package graft.obs

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev utility for the optimization rounds: dump `explain("formatted")` of
  * named registered queries to `<outDir>/<query><suffix>.txt` — the
  * before/after plan receipts `plans/r21/` carries. Usage:
  * `runMain graft.obs.PlanDump <outDir> <suffix> <query> [query ...]`
  * (suffix `_before` / `_after`; `-` for none). SF dir from
  * SPARK_GRAFT_SF_DIR, defaulting to sf0.1 like Bench.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <suffix> <query> [query ...]")
    val outDir = Paths.get(args(0))
    val suffix = if (args(1) == "-") "" else args(1)
    val names = args.drop(2).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.debug.maxToStringFields", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(outDir)
    names.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query '$name'"))
      val df = fn(spark, sfDir)
      val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      Files.write(outDir.resolve(s"$name$suffix.txt"),
        plan.getBytes(StandardCharsets.UTF_8))
      println(s"PLANDUMP wrote $name$suffix.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
