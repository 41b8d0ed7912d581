package graft.streaming

import org.apache.spark.sql.functions.{broadcast, col}

import graft.SparkSuite

/** TEMPORARY mechanics probe for the shingle-bucketed store layout (r20
  * lever b) — answers, on THIS Spark build:
  *  1. can a partitioned (batch_id) + bucketed (shingle) datasource table
  *     take per-partition dynamic-overwrite inserts?
  *  2. does a join on the bucket column against a non-bucketed side plan
  *     with NO Exchange on the bucketed side (only the probe side shuffles)?
  */
class BucketedExperimentSpec extends SparkSuite {

  test("bucketed+partitioned table: insert mechanics and exchange-free join side") {
    import spark.implicits._
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    val tbl = "graft_bexp"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    val d0 = Seq((1L, 10L, 0L), (2L, 20L, 0L), (3L, 30L, 0L))
      .toDF("doc_id", "shingle", "batch_id")
    d0.write.partitionBy("batch_id").bucketBy(4, "shingle").sortBy("shingle")
      .format("parquet").saveAsTable(tbl)

    // per-trigger append of a NEW partition via dynamic-overwrite insertInto
    val d1 = Seq((4L, 10L, 1L), (5L, 40L, 1L)).toDF("doc_id", "shingle", "batch_id")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    d1.write.mode("overwrite").insertInto(tbl)
    assert(spark.table(tbl).count() == 5L)

    // replay: same partition rewritten, not doubled
    d1.write.mode("overwrite").insertInto(tbl)
    assert(spark.table(tbl).count() == 5L)

    // join on shingle with broadcast off: bucketed side must not exchange
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val probe = Seq((100L, 10L), (101L, 40L)).toDF("new_id", "shingle")
      val joined = spark.table(tbl).join(probe, "shingle")
      val plan = joined.queryExecution.executedPlan.toString
      info(plan)
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(exchanges == 1, s"expected 1 exchange (probe side only):\n$plan")
      assert(joined.count() == 3L)

      // and with an explicit broadcast on a small doc-keyed dimension first
      // (the tombstone shape): partitioning must survive the broadcast join
      val tomb = Seq((1L, 5L)).toDF("doc_id", "tomb_batch")
      val lively = spark.table(tbl).join(broadcast(tomb), Seq("doc_id"), "left")
        .filter(col("tomb_batch").isNull || col("batch_id") >= col("tomb_batch"))
        .select(spark.table(tbl).columns.map(col).toIndexedSeq: _*)
      val j2 = lively.join(probe, "shingle")
      val plan2 = j2.queryExecution.executedPlan.toString
      val ex2 = "Exchange hashpartitioning".r.findAllIn(plan2).size
      assert(ex2 == 1, s"expected 1 exchange after broadcast tombstones:\n$plan2")
      assert(j2.count() == 2L)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.enabled")
      spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      ()
    }
  }
}
