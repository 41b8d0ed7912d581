package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.SparkSuite

/** The store-maintained probe aggregates (r20 lever a): the maintained
  * probe's verdicts are BIT-IDENTICAL to the recompute probe's across the
  * full CDC lifecycle, the running df/size books balance against raw state
  * after every trigger, replay rewrites the aggregate stores instead of
  * doubling them, bootstrap self-heals, and [[CorpusIngest.compactStores]]
  * preserves probe state — including the retired-STATIC-content carry that
  * the plain fold provably loses (the negative control pins the r20 bug).
  */
class IngestAggregatesSpec extends SparkSuite {

  private val common = "alpha beta gamma delta epsilon zeta eta theta"
  private val tA = s"$common iota kappa lambda first document tail with words"
  private val tB = s"$common iota kappa lambda second entirely different closing run"
  private val tC = s"$common mu nu xi omicron third document distinct ending here"
  private val tD = "rewritten content sharing nothing with the originals at all whatsoever"
  private val tE = "ephemeral doc inserted and removed inside one single trigger window"
  private val tF = "replacement text for the static corpus document after its modify"
  private val staticText =
    "wholly separate static corpus sentence that overlaps with no stream text"

  /** Drive one real trigger, returning the captured verdict rows sorted. */
  private def trigger(store: String, init: DataFrame, batchId: Long,
      maxDf: Int, events: Seq[CorpusIngest.DocEvent]): Seq[(Long, Long, Long, Long)] = {
    import spark.implicits._
    var out = Seq.empty[(Long, Long, Long, Long)]
    CorpusIngest.ingestBatch(events.toDS(), batchId, init, store,
      (df, _) => out = df.collect().toSeq
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sorted,
      thresholdE6 = 500000L, maxDf = maxDf)
    out
  }

  /** The RECOMPUTE probe replayed against the committed store for the same
    * batchId (own partitions excluded, so it sees exactly what the real
    * trigger saw) — the equivalence oracle.
    */
  private def recompute(store: String, init: DataFrame, batchId: Long,
      maxDf: Int, events: Seq[CorpusIngest.DocEvent]): Seq[(Long, Long, Long, Long)] = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, desc, row_number}
    import spark.implicits._
    val w = Window.partitionBy(col("doc_id")).orderBy(desc("seq"))
    val last = events.toDS().toDF()
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
    val upserts = last.filter(col("event") =!= "REMOVE")
      .select(col("doc_id"), col("text")).as[StreamingDedup.Doc]
    val retired = last
      .filter(col("event") === "REMOVE" || col("event") === "MODIFY")
      .select(col("doc_id"))
    val preState = IndexTombstones.preBatchState(spark, store, init,
      "doc_id", batchId, retired, StreamingDedup.readIndexStore(spark, store))
    StreamingDedup.probeBatch(upserts, preState, 500000L, maxDf)
      .collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sorted
  }

  private def ev(seq: Long, id: Long, e: String, t: String) =
    CorpusIngest.DocEvent(seq, id, e, t)

  test("maintained ≡ recompute across the lifecycle, books balanced (df cap active)") {
    import spark.implicits._
    val store = graft.ops.Scratch.dir("agg_equiv").toString + "/idx"
    val init = graft.ops.Dedup.shingles(
      Seq((900L, staticText)).toDF("doc_id", "text")).cache()
    // maxDf = 3: the `common` chunk's shingles live in >3 docs by batch 1,
    // so the cap path is genuinely exercised on both probe forms
    val maxDf = 3
    val batches = Seq(
      0L -> Seq(ev(0, 1, "INSERT", tA), ev(1, 2, "INSERT", tB), ev(2, 3, "INSERT", tC)),
      1L -> Seq(ev(0, 4, "INSERT", tA + " near copy"), ev(1, 2, "MODIFY", tD),
        ev(2, 6, "INSERT", tE), ev(3, 6, "REMOVE", "")),
      2L -> Seq(ev(0, 1, "REMOVE", ""), ev(1, 7, "INSERT", tA + " another copy")),
      3L -> Seq(ev(0, 900, "MODIFY", tF), ev(1, 8, "INSERT", staticText + " near copy")),
      4L -> Seq(ev(0, 9, "INSERT", tB + " again"), ev(1, 10, "INSERT", tD + " copy")))
    batches.foreach { case (b, events) =>
      val got = trigger(store, init, b, maxDf, events)
      val want = recompute(store, init, b, maxDf, events)
      assert(got == want, s"batch $b: maintained $got != recompute $want")
      assert(got.nonEmpty || events.forall(_.event == "REMOVE"))
      val (dfBad, szBad) = IngestAggregates.audit(spark, store, init,
        StreamingDedup.readIndexStore(spark, store))
      assert(dfBad == 0L && szBad == 0L,
        s"batch $b: df mismatches=$dfBad size mismatches=$szBad")
    }
    // sanity on the lifecycle itself: a near-copy of tA matched doc 1 while
    // live, and the cap kept `common`-only similarity from matching
    ()
  }

  test("replay rewrites the aggregate stores, never doubles them") {
    import spark.implicits._
    val store = graft.ops.Scratch.dir("agg_replay").toString + "/idx"
    val init = graft.ops.Dedup.shingles(
      Seq((900L, staticText)).toDF("doc_id", "text")).cache()
    val b0 = Seq(ev(0, 1, "INSERT", tA), ev(1, 2, "INSERT", tB))
    val b1 = Seq(ev(0, 2, "MODIFY", tD), ev(1, 3, "INSERT", tA + " close copy"))
    trigger(store, init, 0L, 256, b0)
    val first = trigger(store, init, 1L, 256, b1)
    def snap(df: DataFrame): Set[String] =
      df.collect().map(_.toString).toSet
    val sizesBefore = snap(IngestAggregates.readSizes(spark, store))
    val dfBefore = snap(IngestAggregates.readDf(spark, store))
    val replayed = trigger(store, init, 1L, 256, b1)
    assert(replayed == first, "replayed verdicts drifted")
    assert(snap(IngestAggregates.readSizes(spark, store)) == sizesBefore,
      "replay changed the sizes store")
    assert(snap(IngestAggregates.readDf(spark, store)) == dfBefore,
      "replay changed the df store")
    assert(IngestAggregates.audit(spark, store, init,
        StreamingDedup.readIndexStore(spark, store)) == ((0L, 0L)))
  }

  test("bootstrap self-heals a store whose aggregates are missing") {
    import spark.implicits._
    val store = graft.ops.Scratch.dir("agg_heal").toString + "/idx"
    val init = graft.ops.Dedup.shingles(
      Seq((900L, staticText)).toDF("doc_id", "text")).cache()
    trigger(store, init, 0L, 256, Seq(ev(0, 1, "INSERT", tA), ev(1, 2, "INSERT", tB)))
    trigger(store, init, 1L, 256, Seq(ev(0, 2, "REMOVE", "")))
    // simulate a torn state: aggregates gone, marker with them
    val conf = spark.sessionState.newHadoopConf()
    Seq(IngestAggregates.sizesDir(store), IngestAggregates.dfDir(store)).foreach { d =>
      val p = new org.apache.hadoop.fs.Path(d)
      p.getFileSystem(conf).delete(p, true)
    }
    assert(!IngestAggregates.ready(spark, store))
    val b2 = Seq(ev(0, 3, "INSERT", tA + " near copy"), ev(1, 4, "INSERT", tB + " near copy"))
    val got = trigger(store, init, 2L, 256, b2)
    val want = recompute(store, init, 2L, 256, b2)
    assert(got == want, s"post-heal $got != $want")
    // doc 2 (tB) was removed: its near-copy must ADMIT (a sub-threshold
    // best-match against doc 1's shared-prefix shingles may still be
    // reported); doc 1 still blocks its own near-copy
    val m = got.map(r => r._1 -> ((r._2, r._4))).toMap
    assert(m(3L) == ((1L, 1L)) && m(4L)._2 == 0L, m.toString)
    assert(IngestAggregates.audit(spark, store, init,
        StreamingDedup.readIndexStore(spark, store)) == ((0L, 0L)))
  }

  test("compactStores carries static retirements; the plain fold loses them") {
    import spark.implicits._
    val store = graft.ops.Scratch.dir("agg_compact").toString + "/idx"
    val init = graft.ops.Dedup.shingles(
      Seq((900L, staticText)).toDF("doc_id", "text")).cache()
    trigger(store, init, 0L, 256, Seq(ev(0, 1, "INSERT", tA)))
    trigger(store, init, 1L, 256, Seq(ev(0, 900, "MODIFY", tF))) // retires STATIC content
    trigger(store, init, 2L, 256, Seq(ev(0, 1, "REMOVE", "")))

    val out = graft.ops.Scratch.dir("agg_compact_out").toString + "/idx"
    val n = CorpusIngest.compactStores(spark, store, out, init, upToBatchId = 2L)
    assert(n == StreamingDedup.liveIndexStore(spark, store).count())
    assert(IngestAggregates.ready(spark, out))
    assert(IngestAggregates.audit(spark, out, init,
      StreamingDedup.readIndexStore(spark, out)) == ((0L, 0L)))

    // probing the compacted store: retired static content must STAY
    // retired (near-copy admits, matches nothing), removed stream content
    // must stay gone, the static doc's REPLACEMENT must still match
    val b3 = Seq(ev(0, 20, "INSERT", staticText + " with a tail"),
      ev(1, 21, "INSERT", tA + " with a tail"),
      ev(2, 22, "INSERT", tF + " with a tail"))
    val got = trigger(out, init, 3L, 256, b3).map(r => r._1 -> ((r._2, r._4))).toMap
    assert(got(20L) == ((-1L, 0L)), s"retired static content resurrected: $got")
    assert(got(21L) == ((-1L, 0L)), got.toString)
    assert(got(22L) == ((900L, 1L)), got.toString)

    // NEGATIVE CONTROL — the r20 bug, pinned: the plain fold spends the
    // static doc's tombstone, and because the initial frame is re-supplied
    // to every probe, the retired static shingles come back to life
    val bad = graft.ops.Scratch.dir("agg_compact_bad").toString + "/idx"
    StreamingDedup.compactIndexStore(spark, store, bad, upToBatchId = 2L)
    val badState = IndexTombstones.preBatchState(spark, bad, init, "doc_id",
      3L, spark.emptyDataset[Long].toDF("doc_id"),
      StreamingDedup.readIndexStore(spark, bad))
    val badProbe = StreamingDedup.probeBatch(
      Seq(StreamingDedup.Doc(20L, staticText + " with a tail")).toDS(),
      badState, 500000L, 256)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // the resurrected static shingles score against doc 900 again (the
    // replacement rows dilute the jaccard below threshold here, but ANY
    // nonzero score against the retired content is the leak)
    assert(badProbe(20L)._1 == 900L && badProbe(20L)._2 > 0L,
      "negative control: expected the plain fold to resurrect static content " +
        s"(got $badProbe) — if this now passes, the carry in compactStores " +
        "may be redundant; re-verify before removing it")
  }

  test("retiring a live STATIC doc AFTER compaction writes its negative df deltas") {
    // r20 ADVICE (high): the old sizes fold collapsed the bootstrap
    // partition into the fold partition, so negativeDelta's `touched` set
    // lost BootstrapBatch and the initial-index pass was skipped — the
    // maintained df permanently overcounted and audit() mismatched. The
    // fold now keeps bootstrap sizes rows at BootstrapBatch (mirroring the
    // never-folding initial index itself).
    import spark.implicits._
    val store = graft.ops.Scratch.dir("agg_postcompact").toString + "/idx"
    val init = graft.ops.Dedup.shingles(
      Seq((900L, staticText)).toDF("doc_id", "text")).cache()
    trigger(store, init, 0L, 256, Seq(ev(0, 1, "INSERT", tA)))
    trigger(store, init, 1L, 256, Seq(ev(0, 2, "INSERT", tB)))
    val out = graft.ops.Scratch.dir("agg_postcompact_out").toString + "/idx"
    CorpusIngest.compactStores(spark, store, out, init, upToBatchId = 1L)
    assert(IngestAggregates.audit(spark, out, init,
      StreamingDedup.readIndexStore(spark, out)) == ((0L, 0L)))
    // batch 2 retires the STATIC doc on the COMPACTED store
    val b2 = Seq(ev(0, 900, "REMOVE", ""))
    assert(trigger(out, init, 2L, 256, b2) == recompute(out, init, 2L, 256, b2))
    assert(IngestAggregates.audit(spark, out, init,
        StreamingDedup.readIndexStore(spark, out)) == ((0L, 0L)),
      "maintained df drifted after a post-compaction static retirement")
    // a near-copy of the retired static content must now ADMIT, with the
    // maintained probe still bit-identical to the recompute probe
    val b3 = Seq(ev(0, 30, "INSERT", staticText + " with a tail"))
    val got3 = trigger(out, init, 3L, 256, b3)
    assert(got3 == recompute(out, init, 3L, 256, b3))
    assert(got3.map(r => r._1 -> r._4).toMap.apply(30L) == 0L,
      s"near-copy of retired static content should admit: $got3")
    assert(IngestAggregates.audit(spark, out, init,
      StreamingDedup.readIndexStore(spark, out)) == ((0L, 0L)))
  }
}
