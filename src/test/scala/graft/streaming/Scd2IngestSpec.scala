package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.ops.{Sessions, Tables, Temporal}

/** Streaming SCD2 maintenance: the streamed store must reproduce the batch
  * [[Temporal.scd2Dimension]] EXACTLY — trigger-split-invariant, replay-
  * idempotent, compaction-transparent. The parity gate is full row equality
  * of the queryable dimension view, not a sample.
  */
class Scd2IngestSpec extends SparkSuite {

  private def dimEvents = {
    import spark.implicits._
    Tables.events(spark, sf)
      .withColumn("ms", Sessions.msFloor(spark, sf))
      .select(col("event_id"), col("user_id"), col("event_type"), col("ms"))
      .as[Scd2Ingest.DimEvent]
  }

  private def batchDim = Temporal.scd2Dimension(spark, sf).collect().toSeq

  test("streamed dimension equals the batch SCD2 build, across splits, replay, compaction") {
    import spark.implicits._
    val all = dimEvents.collect().sortBy(_.event_id)
    val expected = batchDim

    // 4 triggers split on event_id quartiles — global event_id order
    // preserves each user's order, the contract's requirement
    val store = graft.ops.Scratch.dir("scd2_ingest").toString + "/dim"
    val cuts = Seq(all.length / 4, all.length / 2, 3 * all.length / 4, all.length)
    var lo = 0
    cuts.zipWithIndex.foreach { case (hi, i) =>
      Scd2Ingest.ingestBatch(all.slice(lo, hi).toSeq.toDS(), i.toLong, store)
      lo = hi
    }
    assert(Scd2Ingest.dimension(spark, store).collect().toSeq == expected,
      "streamed dimension diverged from the batch build")

    // the store holds exactly the collapsed change rows (OP-8 suppression)
    assert(Scd2Ingest.readStore(spark, store).count() == expected.size.toLong)

    // replaying the LAST trigger is invisible (own-partition overwrite +
    // own-partition-excluded probe)
    val rowsBefore = Scd2Ingest.readStore(spark, store).count()
    Scd2Ingest.ingestBatch(all.slice(cuts(2), cuts(3)).toSeq.toDS(), 3L, store)
    assert(Scd2Ingest.readStore(spark, store).count() == rowsBefore)
    assert(Scd2Ingest.dimension(spark, store).collect().toSeq == expected)

    // a DIFFERENT trigger split reaches the same dimension
    val store2 = graft.ops.Scratch.dir("scd2_ingest_b").toString + "/dim"
    Scd2Ingest.ingestBatch(all.take(all.length / 3).toSeq.toDS(), 0L, store2)
    Scd2Ingest.ingestBatch(all.drop(all.length / 3).toSeq.toDS(), 1L, store2)
    assert(Scd2Ingest.dimension(spark, store2).collect().toSeq == expected,
      "dimension depends on the trigger split")

    // compaction folds committed partitions and leaves the dimension intact
    val compacted = graft.ops.Scratch.dir("scd2_ingest_c").toString + "/dim"
    val n = Scd2Ingest.compactStore(spark, store, compacted, upToBatchId = 3L)
    assert(n == rowsBefore)
    assert(Scd2Ingest.dimension(spark, compacted).collect().toSeq == expected)
  }

  test("batch bootstrap + streamed tail equals the full batch build") {
    import spark.implicits._
    val all = dimEvents.collect().sortBy(_.event_id)
    val expected = batchDim
    val mid = all(all.length / 2).event_id

    // history by batch: build the dimension over events <= mid and seed
    // the store with its version-open rows (bootstrap strips the derived
    // columns — ms is the version's valid_from)
    val store = graft.ops.Scratch.dir("scd2_ingest_boot").toString + "/dim"
    // the prefix's batch build: one trigger over the prefix IS it (the
    // single-trigger==batch equality is pinned by the first test)
    val prefixEvents = all.filter(_.event_id <= mid)
    val prefixStore = graft.ops.Scratch.dir("scd2_ingest_boot_prefix").toString + "/dim"
    Scd2Ingest.ingestBatch(prefixEvents.toSeq.toDS(), 0L, prefixStore)
    val prefixDim = Scd2Ingest.dimension(spark, prefixStore)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("valid_from_ms").as("ms"))
    val seeded = Scd2Ingest.bootstrap(spark, store, prefixDim)
    assert(seeded > 0)

    // future by stream: two triggers over the tail
    val tail = all.filter(_.event_id > mid)
    Scd2Ingest.ingestBatch(tail.take(tail.length / 2).toSeq.toDS(), 0L, store)
    Scd2Ingest.ingestBatch(tail.drop(tail.length / 2).toSeq.toDS(), 1L, store)
    assert(Scd2Ingest.dimension(spark, store).collect().toSeq == expected,
      "bootstrap + streamed tail diverged from the full batch build")
  }

  test("model check: random event sequences under random order-preserving splits") {
    import spark.implicits._
    // the r15 vector-ingest model-check pattern applied here: the streamed
    // dimension must be invariant to HOW the (order-preserving) trigger
    // boundary dice fall — any divergence from the single-trigger build is
    // a cross-trigger state bug by construction
    val rnd = new scala.util.Random(20260814L)
    (1 to 4).foreach { iter =>
      val evs = (1L to 60L).map { id =>
        Scd2Ingest.DimEvent(id, rnd.nextInt(4).toLong, s"T${rnd.nextInt(3)}", id * 10L)
      }
      val ref = graft.ops.Scratch.dir(s"scd2_model_ref_$iter").toString + "/dim"
      Scd2Ingest.ingestBatch(evs.toDS(), 0L, ref)
      val expected = Scd2Ingest.dimension(spark, ref).collect().toSeq

      val store = graft.ops.Scratch.dir(s"scd2_model_$iter").toString + "/dim"
      val nCuts = 1 + rnd.nextInt(5)
      val cuts = (Seq.fill(nCuts)(1 + rnd.nextInt(evs.length - 1)).distinct.sorted
        :+ evs.length).distinct
      var lo = 0
      cuts.zipWithIndex.foreach { case (hi, i) =>
        Scd2Ingest.ingestBatch(evs.slice(lo, hi).toDS(), i.toLong, store)
        lo = hi
      }
      assert(Scd2Ingest.dimension(spark, store).collect().toSeq == expected,
        s"iter $iter: split at $cuts diverged from the single-trigger build")
    }
  }

  test("a mid-stream state change spanning triggers opens exactly one version") {
    import spark.implicits._
    val store = graft.ops.Scratch.dir("scd2_ingest_span").toString + "/dim"
    // trigger 0: user 1 at state A (two no-op repeats collapse)
    Scd2Ingest.ingestBatch(Seq(
      Scd2Ingest.DimEvent(1L, 1L, "A", 100L),
      Scd2Ingest.DimEvent(2L, 1L, "A", 200L)).toDS(), 0L, store)
    // trigger 1: ANOTHER repeat of A (cross-trigger no-op — must not open a
    // version), then the real change to B
    Scd2Ingest.ingestBatch(Seq(
      Scd2Ingest.DimEvent(3L, 1L, "A", 300L),
      Scd2Ingest.DimEvent(4L, 1L, "B", 400L)).toDS(), 1L, store)
    val dim = Scd2Ingest.dimension(spark, store).collect()
    assert(dim.map(r => (r.getLong(1), r.getString(2))).toSeq == Seq((1L, "A"), (4L, "B")))
    // ranges chain across the trigger boundary and only the last is open
    assert(dim.head.getLong(3) == 100L && dim.head.getLong(4) == 400L
      && dim.head.getLong(5) == 0L)
    assert(dim.last.getLong(3) == 400L && dim.last.isNullAt(4)
      && dim.last.getLong(5) == 1L)
  }
}
