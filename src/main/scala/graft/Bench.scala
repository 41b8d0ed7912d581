package graft
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times every SparkEntry query at the SF
  * in SPARK_GRAFT_SF_DIR and emits ONE metric JSON line.
  *
  * The JSON is (a) written to a file — args(0) if given, else ./BENCH.json —
  * and (b) printed as the final stdout line. Round-1 lesson: printing alone
  * is not parseable — sbt prefixes stdout with "[info] " and Spark WARNs can
  * land mid-stream, so the file is the reliable channel.
  *
  * Queries are executed through the `noop` datasource sink, not `.count()`:
  * count() lets Catalyst prune projections down to the scan, which would
  * under-report every narrow per-row operator; noop forces the full plan to
  * run while writing nothing.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.debug.maxToStringFields", "2000") // no truncation WARN near the metric line
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // Untimed warmup: JVM/codegen/parquet-footer costs land here, not on
    // whichever query happens to run first.
    spark.range(1000000).selectExpr("sum(id)").collect()
    try spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    catch { case _: Throwable => () }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    val outPath = if (args.nonEmpty) args(0) else "BENCH.json"
    Files.write(Paths.get(outPath), (json + "\n").getBytes(StandardCharsets.UTF_8))
    spark.stop()
    // Final line of output, after the Spark shutdown noise.
    println(json)
  }
}
