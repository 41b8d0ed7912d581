package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Evidence that the engine-NATIVE skew path works on this build: AQE's
  * skew-join split ([[VariantOps]]' `Skew` object is the declarative
  * salting alternative — docs/TUNING.md compares the two). The spec
  * induces a hot join key whose shuffle partition exceeds the (lowered)
  * skew threshold, and asserts (a) AQE actually split it — the final plan
  * advertises `skew=true` — and (b) results equal the non-adaptive run.
  */
class AqeSkewSpec extends SparkSuite {

  test("AQE skew-join splits a hot-key partition; results equal the plain run") {
    val confs = Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // production defaults (256 MB) scaled to test data: a partition is
      // "skewed" over 1 MB and 2x the median, split to ~1 MB chunks
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1m",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1m",
      // the skew rule only fires on a shuffled sort-merge join
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      // allow the split even where it costs the downstream agg an extra
      // exchange (the split partitioning no longer satisfies hash(k))
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true")
    val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      // 90% of rows share key 0 — the "celebrity user" shape; padding makes
      // the hot partition comfortably exceed the lowered threshold
      val fact = spark.range(200000).select(
        when(pmod(col("id"), lit(10)) =!= 0, lit(0L))
          .otherwise(pmod(col("id"), lit(97))).as("k"),
        col("id").as("v"),
        // sha2 of the row id: INCOMPRESSIBLE padding — skew detection reads
        // compressed shuffle sizes, so constant padding would vanish
        sha2(concat(lit("pad"), col("id").cast("string")), 256).as("pad"))
      val dim = spark.range(97).select(col("id").as("k"), (col("id") * 2).as("w"))
      // the agg reads pad so column pruning cannot drop it pre-shuffle
      val joined = fact.join(dim, "k")
        .groupBy("k").agg(count(lit(1)).as("n"),
          (sum("v") + sum(length(col("pad"))) - lit(64L) * count(lit(1))).as("sv"))
      val rows = joined.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted

      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true") || plan.contains("skewed"),
        s"AQE did not split the skewed partition:\n${plan.take(1500)}")

      // same query, adaptive off: identical result set
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val plainRows = fact.join(dim, "k")
        .groupBy("k").agg(count(lit(1)).as("n"),
          (sum("v") + sum(length(col("pad"))) - lit(64L) * count(lit(1))).as("sv"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
      assert(rows.sameElements(plainRows))
      // 180000 non-multiples of 10, plus multiples of 970 (0 via both arms)
      assert(rows.exists { case (k, n, _) => k == 0L && n >= 180000L })
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
