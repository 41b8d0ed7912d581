package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.SparkSuite
import graft.ops.Similarity

/** The (table, bucket)-bucketed growing ANN store: verdicts identical to
  * the path-store [[StreamingAnn.externalBatch]] across the
  * arrive/retire lifecycle, the candidate join co-locates (exactly one
  * cell-key exchange — the batch side — with broadcasting disabled),
  * replay rewrites the table partition, and compaction folds the table
  * while spending tombstones physically (bootstrap rows included).
  */
class BucketedAnnStoreSpec extends SparkSuite {

  private def unit(i: Int): Array[Float] =
    Array.tabulate(64)(j => if (j == i) 1f else 0f)

  private def collectTopk(df: DataFrame): Set[(Long, Long, Long, Double)] =
    df.collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet

  test("bucketed == path-store verdicts across the lifecycle; replay stable; compaction physical") {
    import spark.implicits._
    val corpus = (1L to 4L).map(i => StreamingAnn.Vec(i, unit(i.toInt)))
    val staticHome = Similarity.homeRowsOf(
      corpus.toDF("vec_id", "embedding"), nTables = 8, bits = 3).cache()
    val table = "graft_bann_equiv"
    val aux = graft.ops.Scratch.dir("bann_aux").toString + "/idx"
    val pathStore = graft.ops.Scratch.dir("bann_path").toString + "/idx"
    BucketedAnnStore.bootstrap(spark, table, staticHome, nBuckets = 4)
    try {
      var bGot = Set.empty[(Long, Long, Long, Double)]
      var pGot = Set.empty[(Long, Long, Long, Double)]
      def runBoth(id: Long, vs: StreamingAnn.Vec*): Unit = {
        BucketedAnnStore.ingestBatch(vs.toDS(), id, table, aux,
          (df, _) => bGot = collectTopk(df), nTables = 8, bits = 3,
          probes = 2, k = 3)
        StreamingAnn.externalBatch(vs.toDS(), id, staticHome, pathStore,
          (df, _) => pGot = collectTopk(df), nTables = 8, bits = 3,
          probes = 2, k = 3, broadcastIdx = true)
        assert(bGot == pGot, s"batch $id: bucketed $bGot != path $pGot")
      }
      // admit A; its copy A' must find it from the STORE; retire A; a later
      // copy must find only A'
      runBoth(0L, StreamingAnn.Vec(100L, unit(10)))
      runBoth(1L, StreamingAnn.Vec(200L, unit(10)), StreamingAnn.Vec(300L, unit(20)))
      assert(bGot.exists(v => v._1 == 200L && v._3 == 100L && math.abs(v._4 - 1.0) < 1e-9))
      BucketedAnnStore.retire(spark, aux, Seq(100L).toDF("cid"), 2L)
      StreamingAnn.retireFromStore(spark, pathStore, Seq(100L).toDF("cid"), 2L)
      runBoth(3L, StreamingAnn.Vec(400L, unit(10)))
      assert(bGot.exists(v => v._1 == 400L && v._3 == 200L && math.abs(v._4 - 1.0) < 1e-9))
      assert(!bGot.exists(_._3 == 100L), s"retired vector leaked: $bGot")

      // replay batch 3: verdicts + table row count stable
      val rows = spark.table(table).count()
      val before = bGot
      BucketedAnnStore.ingestBatch(
        Seq(StreamingAnn.Vec(400L, unit(10))).toDS(), 3L, table, aux,
        (df, _) => bGot = collectTopk(df), nTables = 8, bits = 3,
        probes = 2, k = 3)
      assert(bGot == before, "replay changed the verdicts")
      assert(spark.table(table).count() == rows, "replay changed the table")

      // compaction: live rows fold, the retired vector and its tombstone
      // are gone physically, and the compacted table serves equal probes
      val out = "graft_bann_compacted"
      val outAux = graft.ops.Scratch.dir("bann_outaux").toString + "/idx"
      try {
        val live = BucketedAnnStore.liveIndex(spark, table, aux).count()
        val n = BucketedAnnStore.compactTable(spark, table, aux, out, outAux,
          upToBatchId = 3L, nBuckets = 4)
        assert(n == live, s"fold wrote $n, live was $live")
        assert(!spark.table(out).select("cid").collect()
          .map(_.getLong(0)).contains(100L), "retired cid survived the fold")
        assert(IndexTombstones.read(spark, outAux, "cid").count() == 0L)
        var cGot = Set.empty[(Long, Long, Long, Double)]
        BucketedAnnStore.ingestBatch(
          Seq(StreamingAnn.Vec(500L, unit(10))).toDS(), 4L, out, outAux,
          (df, _) => cGot = collectTopk(df), nTables = 8, bits = 3,
          probes = 2, k = 3)
        assert(cGot.exists(v => v._1 == 500L && v._3 == 200L &&
          math.abs(v._4 - 1.0) < 1e-9), cGot.toString)
        assert(!cGot.exists(_._3 == 100L))
      } finally { spark.sql(s"DROP TABLE IF EXISTS $out"); () }
    } finally { spark.sql(s"DROP TABLE IF EXISTS $table"); () }
  }

  test("candidate join co-locates: one cell-key exchange, on the batch side only") {
    import spark.implicits._
    val corpus = (1L to 4L).map(i => StreamingAnn.Vec(i, unit(i.toInt)))
    val staticHome = Similarity.homeRowsOf(
      corpus.toDF("vec_id", "embedding"), nTables = 8, bits = 3).cache()
    val table = "graft_bann_plan"
    val aux = graft.ops.Scratch.dir("bann_plan_aux").toString + "/idx"
    BucketedAnnStore.bootstrap(spark, table, staticHome, nBuckets = 4)
    try {
      // a real trigger + a tombstone first, so the plan reflects the full
      // production shape
      BucketedAnnStore.ingestBatch(
        Seq(StreamingAnn.Vec(100L, unit(10))).toDS(), 0L, table, aux,
        (_, _) => (), nTables = 8, bits = 3, probes = 2, k = 3)
      BucketedAnnStore.retire(spark, aux, Seq(2L).toDF("cid"), 1L)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val probe = Similarity.probeSide(
          Seq(StreamingAnn.Vec(900L, unit(10))).toDF("vec_id", "embedding"),
          nTables = 8, bits = 3, probes = 2)
        val joined = probe.join(
          BucketedAnnStore.preBatchIndex(spark, table, aux, 1L),
          Seq("table", "bucket"))
        val plan = joined.queryExecution.executedPlan.toString
        // cell-key exchanges only: the tombstone aggregate's internal cid
        // exchange (|tombstones| rows, under its BroadcastExchange) is not
        // index movement
        val exchanges = "Exchange hashpartitioning\\(table".r.findAllIn(plan).size
        assert(exchanges == 1,
          s"store side must not exchange (bucketed co-location):\n$plan")
        assert(plan.contains("Bucketed: true"), s"expected a bucketed scan in:\n$plan")
        assert(joined.count() > 0)
      } finally {
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.enabled")
      }
    } finally { spark.sql(s"DROP TABLE IF EXISTS $table"); () }
  }
}
