package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.SparkSuite

/** The shingle-bucketed store layout (r20 lever b): verdicts identical to
  * the path-store [[CorpusIngest]] across the CDC lifecycle, the candidate
  * join co-locates (exactly ONE exchange — the batch side — with
  * broadcasting disabled), replay rewrites the table partition, and
  * compaction folds the table + aux stores while physically spending
  * static-content tombstones (no carry needed in this layout).
  */
class BucketedCorpusIngestSpec extends SparkSuite {

  private val tA = "alpha beta gamma delta epsilon first document tail with several words"
  private val tB = "totally different second body of text sharing nothing at all whatsoever"
  private val tF = "replacement text for the static corpus document after its modify event"
  private val staticText =
    "wholly separate static corpus sentence that overlaps with no stream text"

  private def ev(seq: Long, id: Long, e: String, t: String) =
    CorpusIngest.DocEvent(seq, id, e, t)

  private def collectVerdicts(df: DataFrame): Seq[(Long, Long, Long, Long)] =
    df.collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sorted

  private def bucketedTrigger(table: String, aux: String, batchId: Long,
      events: Seq[CorpusIngest.DocEvent]): Seq[(Long, Long, Long, Long)] = {
    import spark.implicits._
    var out = Seq.empty[(Long, Long, Long, Long)]
    BucketedCorpusIngest.ingestBatch(events.toDS(), batchId, table, aux,
      (df, _) => out = collectVerdicts(df), thresholdE6 = 500000L, maxDf = 256)
    out
  }

  private def pathTrigger(store: String, init: DataFrame, batchId: Long,
      events: Seq[CorpusIngest.DocEvent]): Seq[(Long, Long, Long, Long)] = {
    import spark.implicits._
    var out = Seq.empty[(Long, Long, Long, Long)]
    CorpusIngest.ingestBatch(events.toDS(), batchId, init, store,
      (df, _) => out = collectVerdicts(df), thresholdE6 = 500000L, maxDf = 256)
    out
  }

  test("bucketed ≡ path-store verdicts across the lifecycle, books balanced") {
    import spark.implicits._
    val init = graft.ops.Dedup.shingles(
      Seq((900L, staticText)).toDF("doc_id", "text")).cache()
    val store = graft.ops.Scratch.dir("bci_path").toString + "/idx"
    val table = "graft_bci_equiv"
    val aux = graft.ops.Scratch.dir("bci_aux").toString + "/idx"
    BucketedCorpusIngest.bootstrap(spark, table, aux, init, nBuckets = 4)
    try {
      val batches = Seq(
        0L -> Seq(ev(0, 1, "INSERT", tA), ev(1, 2, "INSERT", tB)),
        1L -> Seq(ev(0, 3, "INSERT", tA + " near copy"), ev(1, 2, "MODIFY", tB + " revised text")),
        2L -> Seq(ev(0, 1, "REMOVE", ""), ev(1, 900, "MODIFY", tF)),
        3L -> Seq(ev(0, 4, "INSERT", tA + " second copy"),
          ev(1, 5, "INSERT", staticText + " near copy"),
          ev(2, 6, "INSERT", tF + " near copy")))
      batches.foreach { case (b, events) =>
        val got = bucketedTrigger(table, aux, b, events)
        val want = pathTrigger(store, init, b, events)
        assert(got == want, s"batch $b: bucketed $got != path $want")
        val books = IngestAggregates.audit(spark, aux,
          Seq.empty[(Long, Long)].toDF("doc_id", "shingle"),
          BucketedCorpusIngest.tableScan(spark, table))
        assert(books == ((0L, 0L)), s"batch $b books: $books")
      }
      // spot semantics: batch 3 ADMITTED doc 4 (tA's line: doc 1 removed,
      // doc 3 rejected) and doc 5 (the retired static text's line) — so
      // batch 4's near-copies must match those STREAM-admitted docs
      val m = bucketedTrigger(table, aux, 4L,
        Seq(ev(0, 7, "INSERT", tA + " third copy"),
          ev(1, 8, "INSERT", staticText + " another copy")))
        .map(r => r._1 -> ((r._2, r._4))).toMap
      assert(m(7L) == ((4L, 1L)) && m(8L) == ((5L, 1L)), m.toString)

      // replay batch 4: verdicts + table + aggregates stable
      val rows = spark.table(table).count()
      val again = bucketedTrigger(table, aux, 4L,
        Seq(ev(0, 7, "INSERT", tA + " third copy"),
          ev(1, 8, "INSERT", staticText + " another copy")))
      assert(again.map(r => r._1 -> ((r._2, r._4))).toMap == m)
      assert(spark.table(table).count() == rows, "replay changed the table")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table"); ()
    }
  }

  test("candidate join co-locates: one exchange, on the batch side only") {
    import spark.implicits._
    val init = graft.ops.Dedup.shingles(
      Seq((900L, staticText), (901L, tA), (902L, tB)).toDF("doc_id", "text")).cache()
    val table = "graft_bci_plan"
    val aux = graft.ops.Scratch.dir("bci_plan_aux").toString + "/idx"
    BucketedCorpusIngest.bootstrap(spark, table, aux, init, nBuckets = 4)
    try {
      // a real trigger first, so the plan reflects the full production
      // shape: store partitions, a tombstone, a non-empty retire set
      bucketedTrigger(table, aux, 0L, Seq(ev(0, 1, "INSERT", tF), ev(1, 901, "REMOVE", "")))
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val retired = Seq(902L).toDF("doc_id")
        val pre = BucketedCorpusIngest.preBatchState(spark, table, aux, 1L, retired)
        // probe with surviving content (doc 900's static text — doc 901
        // was REMOVEd in trigger 0, doc 902 is in this batch's retire set)
        val probe = StreamingDedup.shingleBatch(
          Seq(StreamingDedup.Doc(50L, staticText + " probe copy")).toDS())
          .withColumnRenamed("doc_id", "new_id")
        val joined = probe.join(pre, "shingle")
        val plan = joined.queryExecution.executedPlan.toString
        // count SHINGLE-keyed exchanges only: the tombstone aggregate's
        // internal doc_id exchange (|tombstones| rows, under its
        // BroadcastExchange) is not index movement
        val exchanges = "Exchange hashpartitioning\\(shingle".r.findAllIn(plan).size
        assert(exchanges == 1,
          s"store side must not exchange (bucketed co-location):\n$plan")
        assert(plan.contains("Bucketed: true"),
          s"expected a bucketed scan in:\n$plan")
        // and the join actually finds the surviving content
        assert(joined.count() > 0)
      } finally {
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.enabled")
      }
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table"); ()
    }
  }

  test("real stream: ingestStream drives the bucketed lifecycle through foreachBatch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val init = graft.ops.Dedup.shingles(
      Seq((900L, staticText)).toDF("doc_id", "text")).cache()
    val table = "graft_bci_stream"
    val aux = graft.ops.Scratch.dir("bci_stream_aux").toString + "/idx"
    BucketedCorpusIngest.bootstrap(spark, table, aux, init, nBuckets = 4)
    try {
      val stream = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[CorpusIngest.DocEvent]
      val got = scala.collection.mutable.Map.empty[Long, Seq[(Long, Long, Long, Long)]]
      val q = BucketedCorpusIngest.ingestStream(stream.toDS(), table, aux,
        (df, id) => { got(id) = collectVerdicts(df); () },
        thresholdE6 = 500000L, maxDf = 256).start()
      // trigger 0: two inserts; trigger 1: a near-copy of A (must reject
      // against trigger 0's STORED admission) + a MODIFY of the static doc
      // (retire + readmit); trigger 2: REMOVE doc 1
      stream.addData(ev(0, 1, "INSERT", tA), ev(1, 2, "INSERT", tB))
      q.processAllAvailable()
      stream.addData(ev(0, 3, "INSERT", tA + " near copy"),
        ev(1, 900, "MODIFY", tF))
      q.processAllAvailable()
      stream.addData(ev(0, 1, "REMOVE", ""))
      q.processAllAvailable()
      q.stop()
      // verdict semantics across the stream boundary: batch 0 admitted
      // both; batch 1 rejected the near-copy against batch 0's admission
      // and admitted the static replacement
      val m0 = got(0L).map(r => r._1 -> r._4).toMap
      assert(m0 == Map(1L -> 0L, 2L -> 0L), got(0L).toString)
      val m1 = got(1L).map(r => r._1 -> ((r._2, r._4))).toMap
      assert(m1(3L) == ((1L, 1L)) && m1(900L) == ((-1L, 0L)), got(1L).toString)
      // live view after the three triggers: doc 1 removed, the static
      // content retired-and-replaced by stream doc 900, doc 3 rejected
      // (rejected lane, never the index)
      val liveIds = BucketedCorpusIngest.liveIndex(spark, table, aux)
        .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
      assert(liveIds == Set(2L, 900L), s"live ids: $liveIds")
      val books = IngestAggregates.audit(spark, aux,
        Seq.empty[(Long, Long)].toDF("doc_id", "shingle"),
        BucketedCorpusIngest.tableScan(spark, table))
      assert(books == ((0L, 0L)), books.toString)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table"); ()
    }
  }

  test("compactTable folds live state and spends static tombstones physically") {
    import spark.implicits._
    val init = graft.ops.Dedup.shingles(
      Seq((900L, staticText)).toDF("doc_id", "text")).cache()
    val table = "graft_bci_compact"
    val out = "graft_bci_compacted"
    val aux = graft.ops.Scratch.dir("bci_c_aux").toString + "/idx"
    val outAux = graft.ops.Scratch.dir("bci_c_outaux").toString + "/idx"
    BucketedCorpusIngest.bootstrap(spark, table, aux, init, nBuckets = 4)
    try {
      bucketedTrigger(table, aux, 0L, Seq(ev(0, 1, "INSERT", tA)))
      bucketedTrigger(table, aux, 1L, Seq(ev(0, 900, "MODIFY", tF))) // retire STATIC
      bucketedTrigger(table, aux, 2L, Seq(ev(0, 1, "REMOVE", "")))
      val live = BucketedCorpusIngest.liveIndex(spark, table, aux).count()
      val n = BucketedCorpusIngest.compactTable(spark, table, aux, out, outAux,
        upToBatchId = 2L, nBuckets = 4)
      assert(n == live, s"fold wrote $n, live was $live")
      // the bootstrap partition's retired rows are GONE physically —
      // no tombstones needed in the compacted aux to keep them dead
      assert(spark.table(out).filter(
        col("batch_id") === IngestAggregates.BootstrapBatch).count() == 0L)
      val books = IngestAggregates.audit(spark, outAux,
        Seq.empty[(Long, Long)].toDF("doc_id", "shingle"),
        BucketedCorpusIngest.tableScan(spark, out))
      assert(books == ((0L, 0L)), books.toString)
      // probing the compacted table: retired static stays dead, removed
      // stream doc stays dead, the static replacement still matches
      val m = bucketedTrigger(out, outAux, 3L,
        Seq(ev(0, 20, "INSERT", staticText + " with a tail"),
          ev(1, 21, "INSERT", tA + " with a tail"),
          ev(2, 22, "INSERT", tF + " with a tail")))
        .map(r => r._1 -> ((r._2, r._4))).toMap
      assert(m(20L) == ((-1L, 0L)) && m(21L) == ((-1L, 0L)), m.toString)
      assert(m(22L) == ((900L, 1L)), m.toString)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      spark.sql(s"DROP TABLE IF EXISTS $out"); ()
    }
  }
}
