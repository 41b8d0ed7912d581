package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSuite
import graft.cdc.{CdcConfig, CdcPipeline}
import graft.streaming.ImagePairing.ItemWrite

class StreamingSpec extends SparkSuite {

  test("ImagePairing: INSERT then MODIFY with correct old/new images, diffed downstream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[ItemWrite]
    val paired = ImagePairing.pair(mem.toDS())
    val events = CdcPipeline.events(paired, CdcConfig(eventSource = "stream-spec"))
    val q = events.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("paired_out").start()

    mem.addData(
      ItemWrite("U#1", "A", 1000L, """{"name":"Ada","n":1}"""),
      ItemWrite("U#1", "A", 2000L, """{"name":"Ada","n":2}"""),
      ItemWrite("U#2", "B", 1500L, """{"x":true}"""))
    q.processAllAvailable()
    // no-op write in a later batch must be suppressed
    mem.addData(ItemWrite("U#2", "B", 2500L, """{"x":true}"""))
    q.processAllAvailable()
    val out = spark.table("paired_out").collect()
      .map(r => (r.getAs[String]("eventID"), r.getAs[String]("operation"),
        r.getAs[Seq[String]]("attributesChanged").mkString(","),
        r.getAs[String]("before"), r.getAs[String]("after")))
      .sortBy(_._1)
    q.stop()
    assert(out.map(_._1).toSeq == Seq("w-U#1-A-1000", "w-U#1-A-2000", "w-U#2-B-1500"))
    val modify = out(1)
    assert(modify._2 == "MODIFY" && modify._3 == "n")
    assert(modify._4 == """{"n":1}""" && modify._5 == """{"n":2}""")
  }

  test("ImagePairing: ttl expiry emits REMOVE with the last image") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[ItemWrite]
    val paired = ImagePairing.pair(mem.toDS(), ttlMs = 1L)
    val q = paired.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("ttl_out").start()
    mem.addData(ItemWrite("U#9", "Z", 100L, """{"v":42}"""))
    // a processing-time-timeout query keeps scheduling empty batches, so poll
    // the sink for the expiry instead of waiting for quiescence
    val deadline = System.currentTimeMillis() + 60000
    var ops = Array.empty[(String, String)]
    while (System.currentTimeMillis() < deadline &&
        !ops.exists { case (id, op) => id == "ttl-U#9-Z-100" && op == "REMOVE" }) {
      Thread.sleep(200)
      ops = spark.table("ttl_out").collect()
        .map(r => (r.getAs[String]("eventID"), r.getAs[String]("eventName")))
    }
    q.stop()
    assert(ops.exists { case (id, op) => id == "ttl-U#9-Z-100" && op == "REMOVE" },
      s"no ttl REMOVE seen, got: ${ops.mkString(",")}")
  }

  test("ImagePairing state runs on the RocksDB state store provider") {
    // 100 TB posture: HDFS-backed in-memory state dies when live keys exceed
    // executor heap; RocksDB spills to local disk. Same operator, same
    // results — only the provider changes.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[ItemWrite]
      val q = ImagePairing.pair(mem.toDS()).writeStream.outputMode(OutputMode.Append)
        .format("memory").queryName("rocks_out").start()
      mem.addData(ItemWrite("U#1", "A", 1000L, """{"n":1}"""))
      q.processAllAvailable()
      mem.addData(ItemWrite("U#1", "A", 2000L, """{"n":2}""")) // state survives batches
      q.processAllAvailable()
      val ops = spark.table("rocks_out").collect()
        .map(r => (r.getAs[String]("eventID"), r.getAs[String]("eventName"))).sorted
      q.stop()
      assert(ops.toSeq == Seq("w-U#1-A-1000" -> "INSERT", "w-U#1-A-2000" -> "MODIFY"))
    } finally prev match {
      case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("streaming dedupByEventId: duplicates across micro-batches collapse") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[graft.cdc.BusEvent]
    val q = CdcPipeline.dedupByEventId(mem.toDS())
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("dedup_stream_out").start()
    def ev(id: String) = graft.cdc.BusEvent("s", "dynamo.item.changed", "{}", id)
    mem.addData(ev("e-1"), ev("e-1"), ev("e-2")) // dup within a batch
    q.processAllAvailable()
    mem.addData(ev("e-1"), ev("e-3")) // redelivery in a LATER batch (state hit)
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("dedup_stream_out").collect()
      .map(_.getAs[String]("eventID")).sorted
    assert(ids.toSeq == Seq("e-1", "e-2", "e-3"))
  }

  test("WindowedAgg.sessions: gap merges within, splits across; closes on watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[WindowedAgg.Event]
    val agg = WindowedAgg.sessions(mem.toDS(), gap = "10 minutes", watermark = "5 minutes")
    val q = agg.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("sess_out").start()
    def t(min: Int) = new Timestamp(min * 60000L)
    mem.addData(
      WindowedAgg.Event(t(1), "click", 1.0),
      WindowedAgg.Event(t(5), "click", 2.0),   // within gap → same session
      WindowedAgg.Event(t(30), "click", 4.0))  // > gap later → new session
    q.processAllAvailable()
    mem.addData(WindowedAgg.Event(t(120), "click", 8.0)) // advance watermark, close all
    q.processAllAvailable()
    mem.addData(WindowedAgg.Event(t(180), "click", 0.0))
    q.processAllAvailable()
    val rows = spark.table("sess_out").collect()
      .map(r => (r.getAs[Timestamp]("sess_start").getTime / 60000,
        r.getAs[Long]("n"), r.getAs[Double]("total"))).sortBy(_._1)
    q.stop()
    assert(rows.contains((1L, 2L, 3.0)), s"merged session missing: ${rows.mkString(",")}")
    assert(rows.contains((30L, 1L, 4.0)), s"split session missing: ${rows.mkString(",")}")
  }

  test("WindowedAgg: tumbling windows close on watermark; late rows dropped") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[WindowedAgg.Event]
    val agg = WindowedAgg.tumbling(mem.toDS(), window = "10 minutes", watermark = "5 minutes")
    val q = agg.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("win_out").start()
    def t(min: Int) = new Timestamp(min * 60000L)
    mem.addData(
      WindowedAgg.Event(t(1), "click", 1.0),
      WindowedAgg.Event(t(2), "click", 2.0),
      WindowedAgg.Event(t(11), "view", 5.0))
    q.processAllAvailable()
    // advance watermark far past the first window, then send a LATE click at t=3
    mem.addData(WindowedAgg.Event(t(40), "view", 1.0))
    q.processAllAvailable()
    mem.addData(WindowedAgg.Event(t(3), "click", 100.0)) // late: watermark is 35min
    q.processAllAvailable()
    mem.addData(WindowedAgg.Event(t(60), "view", 1.0)) // close remaining windows
    q.processAllAvailable()
    val rows = spark.table("win_out").collect()
      .map(r => (r.getAs[Timestamp]("win_start").getTime / 60000, r.getAs[String]("eventType"),
        r.getAs[Long]("n"), r.getAs[Double]("total")))
      .sortBy(x => (x._1, x._2))
    q.stop()
    // first click window has n=2 total=3.0 — the late 100.0 never lands
    assert(rows.contains((0L, "click", 2L, 3.0)))
    assert(!rows.exists { case (w, tpe, _, tot) => tpe == "click" && tot > 3.0 })
  }

  test("watermark_recommendation delay admits >=99% of arrivals on a live tumbling stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val F = org.apache.spark.sql.functions
    // The shipped testdata arrives perfectly ordered (zero lateness), so
    // the demonstration synthesizes a deterministic late tail: ~1.5% of
    // arrivals regress ~8 inter-event gaps (inside the p99 recommendation)
    // and ~0.5% regress most of the time span (beyond it — these are the
    // rows the watermark is ALLOWED to drop).
    val smallMs = 100000000L   // ~1.2 days; avg per-type gap is ~3.6 h
    val bigMs = 2000000000L    // ~23 days of a ~30-day span
    val perturbed = graft.ops.Tables.events(spark, sf)
      .select(F.col("event_type"), F.col("event_id"),
        graft.ops.Sessions.msFloor(spark, sf).as("ms0"))
      .withColumn("ms", F.col("ms0") -
        F.when(F.col("event_id") % 211 === 0, bigMs)
          .when(F.col("event_id") % 67 === 0, smallMs).otherwise(0L))
      .select("event_type", "event_id", "ms")
    val late = graft.ops.Temporal.lateFrameOf(perturbed, 65536L).persist()
    val recs = graft.ops.Temporal.watermarkRecommendationOf(late).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(4)))
    assert(recs.nonEmpty)
    recs.foreach { case (tpe, _, _, ppm) =>
      assert(ppm >= 990000L, s"$tpe recommendation admits < 99% by its own account") }
    // not vacuous: some type has arrivals later than its recommendation
    val maxLate = late.groupBy(F.col("event_type"))
      .agg(F.max(F.col("late_ms")).as("m")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(recs.exists { case (tpe, _, d, _) => maxLate(tpe) > d },
      "every type's max lateness is within its recommendation — nothing to drop")
    val arrivals = perturbed.collect().sortBy(_.getLong(1))
      .map(r => (r.getString(0), r.getLong(2)))
    var droppedSomewhere = false
    recs.foreach { case (tpe, n, delayMs, _) =>
      // per-type stream (the recommendation is per type; a shared stream's
      // global watermark would charge one type's lateness to another)
      val mine = arrivals.collect { case (t, ms) if t == tpe =>
        WindowedAgg.Event(new Timestamp(ms), t, 0.0) }
      val mem = MemoryStream[WindowedAgg.Event]
      val agg = WindowedAgg.tumbling(mem.toDS(), window = "1 day",
        watermark = s"$delayMs milliseconds")
      val name = s"wm_rec_out_$tpe"
      val q = agg.writeStream.outputMode(OutputMode.Update)
        .format("memory").queryName(name).start()
      // replay in ARRIVAL order in chunks: the watermark advances between
      // batches, so arrivals later than the delay are genuinely dropped
      mine.grouped(math.max(1, mine.length / 16)).foreach { chunk =>
        mem.addData(chunk.toSeq); q.processAllAvailable()
      }
      // update mode emits a window's running count each time it changes;
      // the final count per window is the max emitted
      val admitted = spark.table(name).groupBy(F.col("win_start"))
        .agg(F.max(F.col("n")).as("n")).agg(F.sum(F.col("n")))
        .collect().head.getLong(0)
      q.stop()
      assert(admitted * 1000000L >= 990000L * n,
        s"$tpe: recommended ${delayMs}ms admitted only $admitted of $n")
      assert(admitted <= n)
      if (admitted < n) droppedSomewhere = true
    }
    late.unpersist()
    assert(droppedSomewhere,
      "no stream dropped anything — the late tail never exercised the watermark")
  }

  test("StreamJoin: on-time match; out-of-bound + late rows never match; watermark evicts state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sm = MemoryStream[StreamJoin.Signup]
    val pm = MemoryStream[StreamJoin.Purchase]
    val joined = StreamJoin.purchasesNearSignup(sm.toDS(), pm.toDS(),
      watermark = "10 minutes", boundMinutes = 60)
    val q = joined.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("ssj_out").start()
    // times start at t(100): an event at the INITIAL watermark (epoch 0)
    // would be dropped as late before the join ever sees it
    def t(min: Int) = new Timestamp(min * 60000L)
    sm.addData(StreamJoin.Signup(1L, t(100)), StreamJoin.Signup(2L, t(100)))
    pm.addData(StreamJoin.Purchase(1L, t(110), 5.0)) // within 60 min of signup: matches
    pm.addData(StreamJoin.Purchase(1L, t(190), 7.0)) // outside the bound: must not match
    q.processAllAvailable()
    // advance BOTH watermarks far past the signups (global watermark = min)
    sm.addData(StreamJoin.Signup(99L, t(400)))
    pm.addData(StreamJoin.Purchase(98L, t(400), 1.0))
    q.processAllAvailable()
    // watermark updates at batch end — run one more batch so eviction executes
    sm.addData(StreamJoin.Signup(97L, t(401)))
    pm.addData(StreamJoin.Purchase(96L, t(401), 1.0))
    q.processAllAvailable()
    // LATE purchase behind the watermark for buffered signup user 2: dropped
    pm.addData(StreamJoin.Purchase(2L, t(105), 100.0))
    q.processAllAvailable()
    val rows = spark.table("ssj_out").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Double]("amount")))
    val removed = q.recentProgress.flatMap(_.stateOperators.map(_.numRowsRemoved)).sum
    q.stop()
    assert(rows.contains((1L, 5.0)), s"on-time match missing: ${rows.mkString(",")}")
    assert(!rows.exists(_._2 == 7.0), "out-of-bound purchase must not match")
    assert(!rows.exists(_._2 == 100.0), "late purchase behind the watermark must not match")
    assert(removed > 0, "watermark advance must evict join state")
  }

  test("StreamJoin left_outer: unmatched signup emits NULL row only after the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sm = MemoryStream[StreamJoin.Signup]
    val pm = MemoryStream[StreamJoin.Purchase]
    val joined = StreamJoin.purchasesNearSignup(sm.toDS(), pm.toDS(),
      watermark = "10 minutes", boundMinutes = 60, joinType = "left_outer")
    val q = joined.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("ssj_outer").start()
    def t(min: Int) = new Timestamp(min * 60000L)
    sm.addData(StreamJoin.Signup(1L, t(100)), StreamJoin.Signup(2L, t(100)))
    pm.addData(StreamJoin.Purchase(1L, t(110), 5.0)) // user 1 converts; user 2 never does
    q.processAllAvailable()
    def collected() = spark.table("ssj_outer").collect()
      .map(r => (r.getAs[Long]("user_id"), Option(r.getAs[Any]("amount"))))
    // BEFORE the watermark passes signup+bound, the unmatched signup must
    // NOT have emitted — a match could still arrive
    assert(!collected().exists(r => r._1 == 2L),
      s"null row emitted too early: ${collected().mkString(",")}")
    // advance both watermarks past signup time + bound + watermark delay
    sm.addData(StreamJoin.Signup(99L, t(400)))
    pm.addData(StreamJoin.Purchase(98L, t(400), 1.0))
    q.processAllAvailable()
    sm.addData(StreamJoin.Signup(97L, t(401)))
    pm.addData(StreamJoin.Purchase(96L, t(401), 1.0))
    q.processAllAvailable()
    val rows = collected()
    q.stop()
    assert(rows.contains((1L, Some(5.0))), s"matched row missing: ${rows.mkString(",")}")
    assert(rows.contains((2L, None)), s"watermark-late NULL row missing: ${rows.mkString(",")}")
  }

  test("StreamStatic enrichment: dim columns attach per batch; missing dim row survives as NULL") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val pm = MemoryStream[StreamJoin.Purchase]
    val users = Seq((1L, "GOLD"), (3L, "SILVER")).toDF("userId", "segment")
    val q = StreamJoin.enrichPurchases(pm.toDS(), users)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("enrich_out").start()
    def t(min: Int) = new Timestamp(min * 60000L)
    pm.addData(StreamJoin.Purchase(1L, t(100), 5.0), StreamJoin.Purchase(2L, t(101), 7.0))
    q.processAllAvailable()
    pm.addData(StreamJoin.Purchase(3L, t(102), 9.0)) // second batch joins the same static dim
    q.processAllAvailable()
    val rows = spark.table("enrich_out").collect()
      .map(r => (r.getAs[Long]("userId"), Option(r.getAs[String]("segment")))).toSet
    q.stop()
    assert(rows == Set((1L, Some("GOLD")), (2L, None), (3L, Some("SILVER"))), rows.toString)
  }

  test("StreamingBench e2e stats populate (the BENCH.json streaming section)") {
    val st = graft.obs.StreamingBench.cdcE2e(spark, sf, nFiles = 4, maxFilesPerTrigger = 1)
    assert(st.inputRows > 0, "no synth input written")
    // the record program suppresses no-op MODIFYs, so bus <= input but > 0
    assert(st.busRows > 0 && st.busRows <= st.inputRows, st.toString)
    // bounded admission: 4 files at 1 file/trigger MUST drain as >= 4
    // micro-batches (the round-7/8 contract the single-cold-batch run
    // failed), and the steady stats exclude batch 0
    assert(st.batches >= 4, s"bounded admission not honored: $st")
    assert(st.wallSec > 0 && st.rowsPerSec > 0, st.toString)
    assert(st.avgBatchMs > 0, s"durationMs not surfaced: $st")
    assert(st.steadyAvgBatchMs > 0 && st.steadyRowsPerSec > 0,
      s"steady-state stats not populated: $st")
  }

  test("StreamingBench admission-dedup stats populate (the streaming_dedup section)") {
    val st = graft.obs.StreamingBench.dedupE2e(spark, sf, nFiles = 4, maxFilesPerTrigger = 1)
    assert(st.inputRows > 0, "no stream docs written")
    // every arriving doc gets exactly one verdict row
    assert(st.busRows == st.inputRows, st.toString)
    assert(st.batches >= 4, s"bounded admission not honored: $st")
    assert(st.steadyAvgBatchMs > 0 && st.steadyRowsPerSec > 0,
      s"steady-state stats not populated: $st")
  }

  test("StreamingBench admission-ANN stats populate (the streaming_ann section)") {
    val st = graft.obs.StreamingBench.annE2e(spark, sf, nFiles = 4, maxFilesPerTrigger = 1)
    assert(st.inputRows > 0, "no stream vectors written")
    // every arriving vector gets at most k verdict rows (0 if no candidate
    // shares a probed bucket); some must land for the section to mean much
    assert(st.busRows > 0, st.toString)
    assert(st.batches >= 4, s"bounded admission not honored: $st")
    assert(st.steadyAvgBatchMs > 0 && st.steadyRowsPerSec > 0,
      s"steady-state stats not populated: $st")
  }

  test("StreamingBench CDC-ingest stats populate (the streaming_ingest section)") {
    val st = graft.obs.StreamingBench.ingestE2e(spark, sf, nFiles = 4,
      maxFilesPerTrigger = 1, arrivalCopies = 8)
    assert(st.inputRows > 0, "no events written")
    // 3 of every 4 events are upserts; each surviving (last-event-wins)
    // upsert doc gets one verdict row, so the count is bounded above by the
    // upsert share and below by 0 — nonzero for the section to mean much
    assert(st.busRows > 0 && st.busRows <= st.inputRows * 3 / 4, st.toString)
    assert(st.batches >= 4, s"bounded ingestion not honored: $st")
    assert(st.steadyAvgBatchMs > 0 && st.steadyRowsPerSec > 0,
      s"steady-state stats not populated: $st")
  }

  test("StreamingBench sessionization stats populate (the streaming_sessions section)") {
    val st = graft.obs.StreamingBench.sessionsE2e(spark, sf, nFiles = 4,
      maxFilesPerTrigger = 1)
    assert(st.inputRows > 0, "no events written")
    // busRows is the post-run liveSessionTable fold: >0 and <= one session
    // per event; equality to the batch table is StreamingSessionsSpec's job
    assert(st.busRows > 0 && st.busRows <= st.inputRows, st.toString)
    assert(st.batches >= 4, s"bounded admission not honored: $st")
    assert(st.steadyAvgBatchMs > 0 && st.steadyRowsPerSec > 0,
      s"steady-state stats not populated: $st")
  }

  test("StreamingBench transition-matrix stats populate (the streaming_transitions section)") {
    val st = graft.obs.StreamingBench.transitionsE2e(spark, sf, nFiles = 4,
      maxFilesPerTrigger = 1)
    assert(st.inputRows > 0, "no events written")
    // the final running matrix is at most |event types|² rows — tiny, but
    // it must be nonzero for the section to mean anything
    assert(st.busRows > 0 && st.busRows <= st.inputRows, st.toString)
    assert(st.batches >= 4, s"bounded admission not honored: $st")
    assert(st.steadyAvgBatchMs > 0 && st.steadyRowsPerSec > 0,
      s"steady-state stats not populated: $st")
  }

  test("StreamingBench attribution stats populate (the streaming_attribution section)") {
    val st = graft.obs.StreamingBench.attributionE2e(spark, sf, nFiles = 4,
      maxFilesPerTrigger = 1)
    assert(st.inputRows > 0, "no events written")
    // the final live readout is at most |touch types| rows — tiny, but it
    // must be nonzero for the section to mean anything; equality to the
    // batch scheme is StreamingAttributionSpec's job
    assert(st.busRows > 0 && st.busRows <= 3, st.toString)
    assert(st.batches >= 4, s"bounded admission not honored: $st")
    assert(st.steadyAvgBatchMs > 0 && st.steadyRowsPerSec > 0,
      s"steady-state stats not populated: $st")
  }

  test("StreamingDedup: per-micro-batch probe equals the batch operator across 2 triggers") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.ops.Tables.documents(spark, sf).select("doc_id", "text")
      .as[(Long, String)].collect()
    val newDocs = docs.filter(_._1 % 10 == 0).map { case (i, t) => StreamingDedup.Doc(i, t) }
    assert(newDocs.nonEmpty)
    val indexSh = graft.ops.Dedup.shingles(
      docs.filterNot(_._1 % 10 == 0).toSeq.toDF("doc_id", "text")).cache()
    val stream = MemoryStream[StreamingDedup.Doc]
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    val q = StreamingDedup.admissionStream(stream.toDS(), indexSh, (df, _) =>
      buf.synchronized {
        buf ++= df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      }).start()
    // two triggers: the index is static, verdicts must not depend on how
    // the batch is split across micro-batches
    val (b1, b2) = newDocs.splitAt(newDocs.length / 2)
    stream.addData(b1.toSeq); q.processAllAvailable()
    stream.addData(b2.toSeq); q.processAllAvailable()
    q.stop()
    val want = graft.ops.Incremental.incrementalDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(buf.toSet == want, s"stream ${buf.size} rows vs batch ${want.size}")
    assert(buf.size == newDocs.length, "a doc was probed twice or lost across triggers")
  }

  test("StreamingDedup growing index: batch 2 dedups against batch 1's admitted docs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // static corpus is unrelated; batch 1 admits a novel doc; batch 2
    // carries a near-copy of it — only a GROWING index can catch that
    val base = "the quick brown fox jumps over the lazy dog again and again until dawn breaks"
    val corpusDoc = "entirely different static corpus content with no overlap at all here truly"
    val indexSh = graft.ops.Dedup.shingles(
      Seq((900L, corpusDoc)).toDF("doc_id", "text")).cache()
    val stream = MemoryStream[StreamingDedup.Doc]
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    val q = StreamingDedup.admissionStreamGrowing(stream.toDS(), indexSh, (df, _) =>
      buf.synchronized {
        buf ++= df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      }).start()
    stream.addData(StreamingDedup.Doc(1L, base)); q.processAllAvailable()
    stream.addData(StreamingDedup.Doc(2L, base + " with one extra tail"),
      StreamingDedup.Doc(3L, "totally novel second batch material unrelated to anything before"))
    q.processAllAvailable()
    q.stop()
    val verdicts = buf.map(r => r._1 -> ((r._2, r._4))).toMap
    // batch 1: novel vs the static corpus — admitted
    assert(verdicts(1L) == ((-1L, 0L)), s"doc 1: ${verdicts(1L)}")
    // batch 2: the near-copy matches doc 1 FROM THE GROWN INDEX as a dup
    assert(verdicts(2L)._1 == 1L && verdicts(2L)._2 == 1L, s"doc 2: ${verdicts(2L)}")
    // and the unrelated doc stays admitted
    assert(verdicts(3L) == ((-1L, 0L)), s"doc 3: ${verdicts(3L)}")
    assert(verdicts.size == 3 && buf.size == 3)
  }

  test("StreamingDedup external index: closed-loop verdicts; REPLAYED batch does not double-append") {
    import spark.implicits._
    val store = graft.ops.Scratch.dir("dedup_store").toString + "/idx"
    val base = "the quick brown fox jumps over the lazy dog again and again until dawn breaks"
    val indexSh = graft.ops.Dedup.shingles(
      Seq((900L, "entirely different static corpus content with no overlap at all here truly"))
        .toDF("doc_id", "text")).cache()
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    val sink: (org.apache.spark.sql.DataFrame, Long) => Unit = (df, _) =>
      buf.synchronized {
        buf ++= df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      }
    def run(batchId: Long, docs: StreamingDedup.Doc*): Unit =
      StreamingDedup.externalBatch(docs.toDS(), batchId, indexSh, store, sink, 500000L, 256)
    // batch 0 admits a novel doc; batch 1's near-copy must match it from
    // the STORE (closed loop through external state, not session memory)
    run(0L, StreamingDedup.Doc(1L, base))
    run(1L, StreamingDedup.Doc(2L, base + " with one extra tail"),
      StreamingDedup.Doc(3L, "totally novel second batch material unrelated to anything before"))
    val verdicts = buf.map(r => r._1 -> ((r._2, r._4))).toMap
    assert(verdicts(1L) == ((-1L, 0L)) && verdicts(2L) == ((1L, 1L)) &&
      verdicts(3L) == ((-1L, 0L)), verdicts.toString)
    val storeAfter = StreamingDedup.readIndexStore(spark, store)
    val rowsAfter = storeAfter.count()
    val batchesAfter = storeAfter.select("batch_id").distinct().collect()
      .map(_.getLong(0)).toSet
    assert(batchesAfter == Set(0L, 1L), s"store partitions: $batchesAfter")
    // REPLAY batch 1 (restart-after-sink-failure shape): verdicts identical
    // (probe excluded its own partition) and the store is byte-for-byte the
    // same rowset — overwrite-by-partition, not append
    buf.clear()
    run(1L, StreamingDedup.Doc(2L, base + " with one extra tail"),
      StreamingDedup.Doc(3L, "totally novel second batch material unrelated to anything before"))
    val replayVerdicts = buf.map(r => r._1 -> ((r._2, r._4))).toMap
    assert(replayVerdicts == Map(2L -> ((1L, 1L)), 3L -> ((-1L, 0L))), replayVerdicts.toString)
    // fresh read: the pre-replay frame's file listing is stale after the
    // partition overwrite (exactly the property under test)
    val storeReplayed = StreamingDedup.readIndexStore(spark, store)
    assert(storeReplayed.count() == rowsAfter,
      "replay double-appended the index store")
    // compaction folds batches <= 1 into one partition, preserving the rowset
    val compacted = graft.ops.Scratch.dir("dedup_store_c").toString + "/idx"
    val n = StreamingDedup.compactIndexStore(spark, store, compacted, upToBatchId = 1L)
    assert(n == rowsAfter)
    val cStore = StreamingDedup.readIndexStore(spark, compacted)
    assert(cStore.count() == rowsAfter)
    assert(cStore.select("batch_id").distinct().collect().map(_.getLong(0)).toSet == Set(1L))
    // the compacted store serves the same probe state: doc/shingle pairs equal
    assert(cStore.select("doc_id", "shingle").except(
      storeReplayed.select("doc_id", "shingle")).count() == 0)
  }

  test("StreamingDedup tombstones: retired doc stops matching, re-admission survives, compaction deletes physically") {
    import spark.implicits._
    val store = graft.ops.Scratch.dir("dedup_store_t").toString + "/idx"
    val base = "the quick brown fox jumps over the lazy dog again and again until dawn breaks"
    val indexSh = graft.ops.Dedup.shingles(
      Seq((900L, "entirely different static corpus content with no overlap at all here truly"))
        .toDF("doc_id", "text")).cache()
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    val sink: (org.apache.spark.sql.DataFrame, Long) => Unit = (df, _) =>
      buf.synchronized {
        buf ++= df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      }
    def run(batchId: Long, docs: StreamingDedup.Doc*): Unit =
      StreamingDedup.externalBatch(docs.toDS(), batchId, indexSh, store, sink, 500000L, 256)
    def verdicts = buf.map(r => r._1 -> ((r._2, r._4))).toMap

    // batch 0 admits doc 1; batch 1's near-copy is rejected against it
    run(0L, StreamingDedup.Doc(1L, base))
    run(1L, StreamingDedup.Doc(2L, base + " with one extra tail"))
    assert(verdicts(1L) == ((-1L, 0L)) && verdicts(2L) == ((1L, 1L)), verdicts.toString)

    // CDC REMOVE for doc 1 at batch 2: the same near-copy arriving at batch
    // 3 must now be ADMITTED — the store no longer matches retired content
    // (doc 2 was rejected, so it never joined the store either)
    assert(StreamingDedup.retireFromStore(spark, store, Seq(1L).toDF("doc_id"), 2L) == 1L)
    buf.clear()
    run(3L, StreamingDedup.Doc(4L, base + " with one extra tail"))
    assert(verdicts(4L) == ((-1L, 0L)),
      s"retired doc must stop matching: ${verdicts(4L)}")

    // replayed retirement overwrites its own partition — no double tombstone
    StreamingDedup.retireFromStore(spark, store, Seq(1L).toDF("doc_id"), 2L)
    assert(IndexTombstones.read(spark, store, "doc_id").count() == 1L)

    // the RE-admission (batch 3 > tombstone batch 2) is live: batch 4's
    // copy matches doc 4, not the long-gone doc 1
    buf.clear()
    run(4L, StreamingDedup.Doc(5L, base + " with one extra tail"))
    assert(verdicts(5L) == ((4L, 1L)),
      s"re-admitted near-copy must be the new match: ${verdicts(5L)}")
    val liveIds = StreamingDedup.liveIndexStore(spark, store)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(liveIds == Set(4L), s"live view: $liveIds")

    // the compaction-decision monitor sees the dead weight before the fold
    val pre = StreamingDedup.indexStoreStats(spark, store)
    assert(pre.deadRows > 0 && pre.tombstones == 1 && pre.batches >= 2,
      s"pre-compaction stats: $pre")
    assert(pre.liveRows == StreamingDedup.liveIndexStore(spark, store).count())

    // compaction applies the tombstone PHYSICALLY (doc 1's shingles leave
    // the store, the spent tombstone is dropped) and preserves the live view
    val compacted = graft.ops.Scratch.dir("dedup_store_tc").toString + "/idx"
    val liveRows = StreamingDedup.liveIndexStore(spark, store).count()
    val n = StreamingDedup.compactIndexStore(spark, store, compacted, upToBatchId = 4L)
    assert(n == liveRows)
    val post = StreamingDedup.indexStoreStats(spark, compacted)
    assert(post.deadRows == 0 && post.tombstones == 0 && post.batches == 1,
      s"post-compaction stats: $post")
    val cIds = StreamingDedup.readIndexStore(spark, compacted)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(cIds == Set(4L), s"compacted store: $cIds")
    assert(IndexTombstones.read(spark, compacted, "doc_id").count() == 0L,
      "spent tombstones must not be carried past the fold point")
    assert(StreamingDedup.liveIndexStore(spark, compacted)
      .select("doc_id", "shingle").except(
        StreamingDedup.liveIndexStore(spark, store)
          .select("doc_id", "shingle")).count() == 0)
  }
}
