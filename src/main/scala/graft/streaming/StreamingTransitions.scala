package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{Exact, Sessions}

/** STREAMING transition-matrix monitoring — the transitions family's
  * streaming rung (batch [[graft.ops.Sessions.eventTransitions]] →
  * incremental [[graft.ops.Sessions.incrementalTransitions]] → this), and
  * the first COMPOSITE-STORE monitor: lag-derived aggregates need BOTH
  * store algebras at once. Pair counts are summed partials (the
  * anomalies/cohort shape); the per-user last-event type is
  * LAST-WRITER-WINS boundary state (the funnel shape). Each trigger
  * derives the current boundary state, counts its within-batch pairs
  * PLUS the one boundary pair per user the trigger boundary cut
  * (last-known type → first batch type), emits the running matrix over
  * everything seen, and publishes its pair partials and superseding
  * last-type rows as its own partitions in the two stores.
  *
  * DATA CONTRACT: same two clauses as the incremental rung — per-user
  * `event_id`-ordered delivery across triggers (contiguous slices; an
  * interleaved slice would break every consecutive pair, which is
  * exactly why the mod-sliced incremental ops can't do lag-derived
  * state).
  *
  * Replay safety is the [[PartialStore]] contract on BOTH stores (probes
  * exclude the probing batch's own partition, so a replay re-derives the
  * same boundary state, the same boundary pairs, and rewrites identical
  * partitions); compaction composes the two folds —
  * [[PartialStore.compactSummed]] for pairs,
  * [[PartialStore.compactLatest]] for the state.
  */
object StreamingTransitions {

  /** One arriving event. */
  final case class TypedEvent(event_id: Long, user_id: Long, event_type: String)

  def admissionStream(events: Dataset[TypedEvent], pairsDir: String,
      lastDir: String, sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[TypedEvent] =
    events.writeStream.foreachBatch { (batch: Dataset[TypedEvent], batchId: Long) =>
      admissionBatch(batch, batchId, pairsDir, lastDir, sink)
    }

  /** One trigger's work — exposed so specs can drive batches exactly as
    * a (restarted) stream would.
    */
  private[graft] def admissionBatch(batch: Dataset[TypedEvent], batchId: Long,
      pairsDir: String, lastDir: String, sink: (DataFrame, Long) => Unit): Unit = {
    val spark = batch.sparkSession
    val storedPairs = readPairStore(spark, pairsDir)
      .filter(col("batch_id") =!= batchId).drop("batch_id")
    val lastState = latestPerUser(readLastStore(spark, lastDir)
      .filter(col("batch_id") =!= batchId)).persist()
    try {
      val bdf = batch.toDF().persist()
      try {
        val within = Sessions.pairCounts(bdf)
        val firstOf = bdf.groupBy(col("user_id"))
          .agg(expr("min_by(event_type, event_id)").as("first_type"))
        val boundary = lastState.join(firstOf, Seq("user_id"))
          .groupBy(col("last_type").as("prev_type"),
            col("first_type").as("next_type"))
          .agg(count(lit(1)).as("n"))
        val newPairs = within.unionByName(boundary)
          .groupBy(col("prev_type"), col("next_type"))
          .agg(Exact.sumLong(col("n")).as("n"))
          .persist()
        try {
          sink(Sessions.transitionsOfPairs(storedPairs.unionByName(newPairs)),
            batchId)
          PartialStore.write(newPairs, batchId, pairsDir)
          // superseding last-type rows for exactly the users this batch
          // touched (LWW: the highest batch_id wins on read)
          PartialStore.write(
            bdf.groupBy(col("user_id"))
              .agg(expr("max_by(event_type, event_id)").as("last_type")),
            batchId, lastDir)
        } finally { newPairs.unpersist(); () }
      } finally { bdf.unpersist(); () }
    } finally { lastState.unpersist(); () }
  }

  /** The LWW read: highest batch_id per user is the current last type. */
  private def latestPerUser(rows: DataFrame): DataFrame =
    rows.withColumn("rk", row_number().over(
      Window.partitionBy(col("user_id")).orderBy(col("batch_id").desc)))
      .where(col("rk") === 1)
      .select(col("user_id"), col("last_type"))

  private def emptyPairStore(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(String, String, Long, Long)]
      .toDF("prev_type", "next_type", "n", "batch_id")
  }

  private def emptyLastStore(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, String, Long)].toDF("user_id", "last_type", "batch_id")
  }

  /** Per-trigger pair partials `(prev_type, next_type, n, batch_id)`. */
  def readPairStore(spark: SparkSession, storeDir: String): DataFrame =
    PartialStore.read(spark, storeDir, emptyPairStore(spark))

  /** Per-trigger superseding last-type rows `(user_id, last_type,
    * batch_id)`.
    */
  def readLastStore(spark: SparkSession, storeDir: String): DataFrame =
    PartialStore.read(spark, storeDir, emptyLastStore(spark))

  /** Summed fold for the pair store. */
  def compactPairStore(spark: SparkSession, storeDir: String, outDir: String,
      upTo: Long): Long =
    PartialStore.compactSummed(spark, storeDir, outDir, upTo,
      emptyPairStore(spark), Seq("prev_type", "next_type"), "n")

  /** Latest-per-user fold for the state store. */
  def compactLastStore(spark: SparkSession, storeDir: String, outDir: String,
      upTo: Long): Long =
    PartialStore.compactLatest(spark, storeDir, outDir, upTo,
      emptyLastStore(spark), Seq("user_id"))
}
