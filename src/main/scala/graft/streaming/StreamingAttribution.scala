package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.ops.{Exact, Temporal}

/** STREAMING multi-touch attribution — the attribution family's streaming
  * rung (batch [[graft.ops.Temporal.touchAttribution]] /
  * `positionAttribution` / `decayAttribution` → incremental
  * `incrementalAttribution` et al. → this), and the first monitor to
  * COMPOSE two of the [[PartialStore]] algebras the way the incremental
  * rung composes its two persisted summaries:
  *
  *   - a SUMMED-PARTIAL store of finished per-type attribution aggregates
  *     — each trigger attributes exactly the purchases IT delivered (their
  *     credit is final: a later touch is never strictly before an already
  *     seen purchase under the data contract), and per-type
  *     `(n_touches, n_purchases, credit_ppm_sum)` rows merge by plain sums
  *     because the purchase sets are disjoint across triggers (even the
  *     DISTINCT purchase counts add);
  *   - an LWW WINDOW-TAIL store of each user's trailing-`W` touches —
  *     one PACKED row per user (the tail as an array column), because a
  *     slide DROPS touches and drop is not expressible as a summed or
  *     row-keyed-latest algebra; packing makes the whole tail one
  *     last-writer-wins value ([[PartialStore.compactLatest]] keyed by
  *     user). Tail sufficiency is the incremental rung's argument
  *     verbatim: any future purchase has `t_p ≥` the user's max touch time
  *     seen so far, hence its window floor `t_p − W` can never reach below
  *     `user_max − W`, which is exactly what the slide keeps.
  *
  * The credit scheme is a parameter — the SAME readout functions the batch
  * and incremental rungs aggregate with
  * ([[graft.ops.Temporal.linearReadout]] / `positionReadout` /
  * `decayReadout`), so all three schemes ride this one monitor and the
  * shared-tail convention carries to streaming: the tail is
  * credit-scheme-agnostic (it is just touches with their `t_t` and
  * tie-break `t_id`), so N schemes over one stream need ONE tail store and
  * N cheap per-type aggregate stores.
  *
  * Each trigger emits the LIVE per-type attribution over everything seen
  * so far: static history aggregate ⊕ stored partials ⊕ this batch's
  * partial — rows ∝ touch types, a constant.
  *
  * DATA CONTRACT (the funnel monitor's two clauses): triggers deliver each
  * user's events in `event_id` order across batches (contiguous slices),
  * and `ms` is monotone in `event_id` per user. Replay safety is the
  * [[PartialStore]] contract — both probes exclude the probing batch's own
  * partition, both writes are dynamic-partition overwrites of that
  * partition.
  */
object StreamingAttribution {

  /** One arriving event, pre-floored to epoch ms. */
  final case class AttrEvent(user_id: Long, event_id: Long,
      event_type: String, ms: Long)

  /** One tail entry — field names are load-bearing: the packed array's
    * element type must match what `struct(t_t, t_id, touch_type)` writes
    * so the empty frame and the parquet store unpack identically.
    */
  final case class TailTouch(t_t: Long, t_id: Long, touch_type: String)

  def admissionStream(events: Dataset[AttrEvent], initialTail: DataFrame,
      initialAgg: DataFrame, tailDir: String, aggDir: String, windowMs: Long,
      readout: DataFrame => DataFrame,
      sink: (DataFrame, Long) => Unit): DataStreamWriter[AttrEvent] =
    events.writeStream.foreachBatch { (batch: Dataset[AttrEvent], batchId: Long) =>
      admissionBatch(batch, batchId, initialTail, initialAgg, tailDir, aggDir,
        windowMs, readout, sink)
    }

  /** One trigger's work — exposed so specs can drive batches exactly as a
    * (restarted) stream would. `initialTail` is the static history's
    * per-user trailing-window touches `(user_id, touch_type, t_t, t_id)`
    * (the incremental rung's `evattrtail-v2` shape; [[emptyTailTable]] for
    * a cold start); `initialAgg` its finished per-type aggregate
    * ([[emptyAggTable]] for a cold start).
    */
  private[graft] def admissionBatch(batch: Dataset[AttrEvent], batchId: Long,
      initialTail: DataFrame, initialAgg: DataFrame, tailDir: String,
      aggDir: String, windowMs: Long, readout: DataFrame => DataFrame,
      sink: (DataFrame, Long) => Unit): Unit = {
    val spark = batch.sparkSession
    val b = batch.toDF()
    val touches = Temporal.attrTouchesOf(b)
    val purchases = Temporal.attrPurchasesOf(b)
    val stored = readTailStore(spark, tailDir)
      .filter(col("batch_id") =!= batchId)
    // current per-user packed tail: latest row per user across the static
    // history (tagged below every real batch) and the store
    val current = latestPerUser(
      packTail(initialTail).withColumn("batch_id", lit(Long.MinValue))
        .unionByName(stored)).persist()
    try {
      // this batch's purchases attribute against (purchasing users' stored
      // tails) ∪ (this batch's touches) — the window filter strictly-before
      // t_p makes same-batch later touches drop out exactly as in the
      // batch twin, so the partial equals the full-log recompute's share
      val tailTouches = unpackTail(current.join(
        purchases.select("user_id").distinct(), Seq("user_id"), "left_semi"))
      val partial = readout(Temporal.touchWindowJoin(purchases,
        tailTouches.unionByName(touches), windowMs)).persist()
      try {
        val storedAgg = readAggStore(spark, aggDir)
          .filter(col("batch_id") =!= batchId).drop("batch_id")
        sink(liveReadout(initialAgg.unionByName(storedAgg).unionByName(partial)),
          batchId)
        PartialStore.write(partial, batchId, aggDir)
        // tail slide: only users the batch TOUCHED change (a purchase
        // alone never moves a tail) — rows ∝ touched users, never the
        // user universe
        val touchedUsers = touches.select("user_id").distinct()
        val newTail = packTail(slideTail(
          unpackTail(current.join(touchedUsers, Seq("user_id"), "left_semi"))
            .unionByName(touches), windowMs))
        PartialStore.write(newTail, batchId, tailDir)
      } finally { partial.unpersist(); () }
    } finally { current.unpersist(); () }
  }

  /** Per-type sums over any stack of finished partials — the merge the
    * disjoint-purchase-sets argument licenses.
    */
  def liveReadout(partials: DataFrame): DataFrame =
    partials.groupBy(col("touch_type"))
      .agg(Exact.sumLong(col("n_touches")).as("n_touches"),
        Exact.sumLong(col("n_purchases")).as("n_purchases"),
        Exact.sumLong(col("credit_ppm_sum")).as("credit_ppm_sum"))
      .orderBy("touch_type")

  /** The LWW read: highest batch_id per user is current. */
  private def latestPerUser(rows: DataFrame): DataFrame =
    rows.withColumn("rk", row_number().over(
      Window.partitionBy(col("user_id")).orderBy(col("batch_id").desc)))
      .where(col("rk") === 1).drop("rk")

  /** Per-user trailing-window slide over exploded touches. */
  private def slideTail(touches: DataFrame, windowMs: Long): DataFrame =
    touches.withColumn("user_max",
      max(col("t_t")).over(Window.partitionBy(col("user_id"))))
      .where(col("t_t") >= col("user_max") - lit(windowMs))
      .select(col("user_id"), col("touch_type"), col("t_t"), col("t_id"))

  /** Exploded `(user_id, touch_type, t_t, t_id)` → one packed row per user
    * (sorted for deterministic bytes under replay).
    */
  private def packTail(exploded: DataFrame): DataFrame =
    exploded.groupBy(col("user_id"))
      .agg(sort_array(collect_list(
        struct(col("t_t"), col("t_id"), col("touch_type")))).as("tail"))

  private def unpackTail(packed: DataFrame): DataFrame =
    packed.select(col("user_id"), explode(col("tail")).as("t"))
      .select(col("user_id"), col("t.touch_type").as("touch_type"),
        col("t.t_t").as("t_t"), col("t.t_id").as("t_id"))

  /** The exploded tail shape with no rows — the cold-start `initialTail`. */
  def emptyTailTable(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, String, Long, Long)]
      .toDF("user_id", "touch_type", "t_t", "t_id")
  }

  /** The per-type aggregate shape with no rows — the cold-start
    * `initialAgg`.
    */
  def emptyAggTable(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(String, Long, Long, Long)]
      .toDF("touch_type", "n_touches", "n_purchases", "credit_ppm_sum")
  }

  private def emptyTailStore(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, Seq[TailTouch])].toDF("user_id", "tail")
      .withColumn("batch_id", lit(0L)).limit(0)
  }

  private def emptyAggStore(spark: SparkSession): DataFrame =
    emptyAggTable(spark).withColumn("batch_id", lit(0L)).limit(0)

  /** Per-trigger packed changed-user tails `(user_id, tail, batch_id)`. */
  def readTailStore(spark: SparkSession, storeDir: String): DataFrame =
    PartialStore.read(spark, storeDir, emptyTailStore(spark))

  /** Per-trigger finished per-type partials `(touch_type, …, batch_id)`. */
  def readAggStore(spark: SparkSession, storeDir: String): DataFrame =
    PartialStore.read(spark, storeDir, emptyAggStore(spark))

  /** Keep each user's latest packed tail `batch_id <= upTo` as the
    * sentinel partition in a NEW `outDir`.
    */
  def compactTailStore(spark: SparkSession, storeDir: String, outDir: String,
      upTo: Long): Long =
    PartialStore.compactLatest(spark, storeDir, outDir, upTo,
      emptyTailStore(spark), Seq("user_id"))

  /** Fold committed per-type partials `batch_id <= upTo` by exact sums. */
  def compactAggStore(spark: SparkSession, storeDir: String, outDir: String,
      upTo: Long): Long =
    PartialStore.compactFolded(spark, storeDir, outDir, upTo,
      emptyAggStore(spark), Seq("touch_type"),
      Seq(Exact.sumLong(col("n_touches")).as("n_touches"),
        Exact.sumLong(col("n_purchases")).as("n_purchases"),
        Exact.sumLong(col("credit_ppm_sum")).as("credit_ppm_sum")))
}
