package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental-maintenance and runtime-pruning operators: signed-delta
  * materialized-view maintenance (the aggregate-side consumer of a CDC
  * feed) and bloom-filter join pruning (runtime semi-join reduction).
  */
object Incremental {

  /** Incremental materialized-view maintenance with retractions: merge a
    * stored per-customer aggregate snapshot with a CDC delta batch instead
    * of recomputing from scratch.
    *
    * The MV is (n_orders, total_c2) per o_custkey. The snapshot covers
    * orders before `split`; the delta batch carries INSERT rows (+1, +c2)
    * for new orders and REMOVE rows (-1, -c2) retracting the snapshot's
    * 'F'-status orders (the reference's stream emits exactly these
    * INSERT/REMOVE envelopes — `dynamo-stream-handler.ts:66-75`; this is
    * the subscriber that folds them into an aggregate). Groups whose count
    * reaches zero are dropped, so exact cancellation is exercised.
    *
    * Scale shape: the snapshot is already aggregated (|keys| rows); the
    * delta is one scan producing signed unit rows; the merge is a single
    * hash aggregation with map-side partial combine. Cost is O(delta +
    * |keys|) — never O(full history), which is the entire point of
    * maintaining an MV under CDC.
    */
  def mvIncrementalApply(spark: SparkSession, d: String,
                         split: String = "1999-01-01"): DataFrame = {
    val ord = Tables.orders(spark, d)
      .withColumn("c2", Exact.c2(col("o_totalprice")))
    val splitTs = to_timestamp(lit(split))
    // Stored snapshot: pre-aggregated partials for the pre-split world.
    val snapshot = ord.filter(col("o_orderdate") < splitTs)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("dn"), Exact.sumLong(col("c2")).as("dc2"))
    // CDC delta batch: +1 per new order, -1 retracting each pre-split 'F'.
    val inserts = ord.filter(col("o_orderdate") >= splitTs)
      .select(col("o_custkey"), lit(1L).as("dn"), col("c2").as("dc2"))
    val removes = ord.filter(col("o_orderdate") < splitTs && col("o_orderstatus") === "F")
      .select(col("o_custkey"), lit(-1L).as("dn"), (-col("c2")).as("dc2"))
    snapshot.select(col("o_custkey"), col("dn"), col("dc2"))
      .unionAll(inserts)
      .unionAll(removes)
      .groupBy(col("o_custkey"))
      .agg(Exact.sumLong(col("dn")).as("n_orders"), Exact.sumLong(col("dc2")).as("total_c2"))
      .filter(col("n_orders") > 0)
      .orderBy("o_custkey")
  }

  /** Incremental JOIN-view maintenance — the join-side counterpart of
    * [[mvIncrementalApply]]: V = orders ⋈ customer maintained under deltas
    * on BOTH inputs by the textbook IVM algebra
    *
    *   ΔV = ΔA⁺⋈B_old ∪ A_old⋈ΔB ∪ ΔA⁺⋈ΔB ∪ (−1)·ΔA⁻⋈B_full
    *
    * where ΔA⁺ = post-split orders, ΔA⁻ = retracted pre-split 'F' orders
    * (the CDC REMOVE envelopes), and ΔB = late-arriving customer rows
    * (c_custkey ≡ 0 mod 10). The retraction term joins the FULL dimension:
    * a cancelled row must cancel regardless of whether its partner arrived
    * in the snapshot or the delta. Every term carries a sign; the final
    * aggregate folds signs, so the result equals the from-scratch join on
    * the post-delta state — the oracle checks exactly that, certifying the
    * algebra, not a shortcut.
    *
    * Scale shape: in production V_old is the STORED view (read back, not
    * recomputed — here it is recomputed only to feed the union, since this
    * query owns no storage); every delta term joins a SMALL delta against
    * one big side, so maintenance cost is O(|ΔA|·fanout + |ΔB|·fanout +
    * |V|) per batch — never a re-join of the full inputs.
    */
  def mvJoinDelta(spark: SparkSession, d: String,
                  split: String = "1999-01-01"): DataFrame = {
    val splitTs = to_timestamp(lit(split))
    val ord = Tables.orders(spark, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        col("o_orderstatus"), Exact.c2(col("o_totalprice")).as("c2"))
    val cust = Tables.customer(spark, d).select(col("c_custkey"), col("c_mktsegment"))
    val aOld = ord.filter(col("o_orderdate") < splitTs)
    val aIns = ord.filter(col("o_orderdate") >= splitTs)
    val aRem = ord.filter(col("o_orderdate") < splitTs && col("o_orderstatus") === "F")
    val bOld = cust.filter(col("c_custkey") % 10 =!= 0)
    val bNew = cust.filter(col("c_custkey") % 10 === 0)
    def term(a: DataFrame, b: DataFrame, sign: Int): DataFrame =
      a.join(b, col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment"), lit(sign.toLong).as("sign"), col("c2"))
    term(aOld, bOld, 1)        // V_old (stored in production)
      .unionAll(term(aIns, bOld, 1))  // ΔA⁺ ⋈ B_old
      .unionAll(term(aOld, bNew, 1))  // A_old ⋈ ΔB
      .unionAll(term(aIns, bNew, 1))  // ΔA⁺ ⋈ ΔB
      .unionAll(term(aRem, cust, -1)) // retractions cancel against B_full
      .groupBy(col("c_mktsegment"))
      .agg(Exact.sumLong(col("sign")).as("n_rows"),
        Exact.sumLong(col("sign") * col("c2")).as("revenue_c2"))
      .filter(col("n_rows") > 0)
      .orderBy("c_mktsegment")
  }

  /** Incremental near-dup detection under CDC — the streaming/incremental
    * form of [[Dedup.ngramJaccard]], composing the engine's two flagship
    * families: a NEW batch of documents (the CDC arrival; doc_id ≡ 0 mod
    * `batchMod` stands in for the micro-batch) is probed against the
    * EXISTING corpus's inverted shingle index, and every new doc gets its
    * best existing match and a duplicate verdict BEFORE admission.
    *
    * Scale shape — why incremental dedup works at 100 TB: per batch the
    * cost is O(batch shingles ⋈ index) keyed on the shingle, never a corpus
    * re-pair. The batch side is micro-batch-sized; the index is the stored
    * big side (here served from the same session-cached index the batch
    * family shares). Hot boilerplate shingles above `maxDf` are excluded
    * from candidate generation on the INDEX side only (doc sizes keep every
    * shingle, so the cap can only lose intersection evidence, never inflate
    * a score — same contract as [[Dedup.jaccardPairs]]). The best-match
    * rank window carries a rn=1 gate that WindowGroupLimit prunes map-side.
    * Jaccard exports as floor(j·1e6) BIGINT (integer division, exact in
    * both engines); unmatched docs export (match_id, jaccard_e6) = (-1, 0)
    * so every batch doc carries a verdict row.
    */
  def incrementalDedup(spark: SparkSession, d: String, batchMod: Int = 10,
      thresholdE6: Long = 500000L, maxDf: Int = 256): DataFrame = {
    val sh = Dedup.cachedShingles(spark, d)
    val isNew = col("doc_id") % batchMod === 0
    probeAgainstIndex(
      Tables.documents(spark, d).filter(isNew).select(col("doc_id")),
      sh.filter(isNew), sh.filter(!isNew), thresholdE6, maxDf)
  }

  /** The probe core shared by [[incrementalDedup]] (batch) and
    * [[graft.streaming.StreamingDedup]] (per micro-batch through
    * foreachBatch): score `newSh` against the `oldSh` index and give every
    * doc in `newDocIds` a (match_id, jaccard_e6, is_dup) verdict row.
    */
  private[graft] def probeAgainstIndex(newDocIds: DataFrame, newSh: DataFrame,
      oldSh: DataFrame, thresholdE6: Long, maxDf: Int): DataFrame = {
    // Plan-shape note (r19, measured both ways): a manual bloom sketch of
    // the batch's shingles CAN prune the index side before the df-cap and
    // size groupBys (bit-identical verdicts — no false negatives), but at
    // bench scale it measured cpu-NEUTRAL (saved in-memory shuffles ≈
    // per-scan bloom probes) and wall-NEGATIVE (its two eager driver
    // actions per trigger halved the fast dedup section's rows/s), so it
    // was reverted — docs/TUNING.md "streaming_ingest per-trigger cost"
    // carries the numbers and the real 100 TB levers (maintained df/size
    // aggregates in the store; a shingle-bucketed store layout that makes
    // the candidate join co-located, shuffling only the batch side).
    val oldCapped = oldSh.join(
      oldSh.groupBy("shingle").agg(count(lit(1)).as("df"))
        .filter(col("df") > maxDf).select("shingle"),
      Seq("shingle"), "left_anti")
    val sizesOld = oldSh.groupBy("doc_id").agg(count(lit(1)).as("n_old"))
    scoredVerdicts(newDocIds, newSh, oldCapped, sizesOld, thresholdE6)
  }

  /** [[probeAgainstIndex]] with the index-side aggregates SUPPLIED instead
    * of recomputed — the probe core [[graft.streaming.CorpusIngest]] runs
    * against its store-maintained summaries
    * ([[graft.streaming.IngestAggregates]]): `dfOld` is `(shingle, df)`
    * covering at least the batch's shingles (the cap anti-join only ever
    * bites on candidate-join keys, so a batch-restricted df set yields
    * bit-identical verdicts), `sizesOld` is `(doc_id, n_old)` over the live
    * pre-batch docs. Identical scoring to [[probeAgainstIndex]] — the two
    * full-index aggregations are simply not re-derived here.
    */
  private[graft] def probeWithAggregates(newDocIds: DataFrame, newSh: DataFrame,
      oldSh: DataFrame, dfOld: DataFrame, sizesOld: DataFrame,
      thresholdE6: Long, maxDf: Int): DataFrame = {
    val oldCapped = oldSh.join(
      dfOld.filter(col("df") > maxDf).select("shingle"),
      Seq("shingle"), "left_anti")
    scoredVerdicts(newDocIds, newSh, oldCapped, sizesOld, thresholdE6)
  }

  /** The shared scoring tail of both probe forms: candidate co-occurrence
    * counts over the (already df-capped) index side, exact Jaccard from the
    * supplied old sizes, best-match rank, left-join back to every probed
    * doc id.
    */
  private def scoredVerdicts(newDocIds: DataFrame, newSh: DataFrame,
      oldCapped: DataFrame, sizesOld: DataFrame, thresholdE6: Long): DataFrame = {
    val sizesNew = newSh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val scored = newSh.withColumnRenamed("doc_id", "new_id")
      .join(oldCapped.withColumnRenamed("doc_id", "old_id"), "shingle")
      .groupBy(col("new_id"), col("old_id")).agg(count(lit(1)).as("n_common"))
      .join(sizesNew.withColumnRenamed("doc_id", "new_id"), "new_id")
      .join(sizesOld.withColumnRenamed("doc_id", "old_id"), "old_id")
      .withColumn("j_e6", expr("(n_common * 1000000) div (n_sh + n_old - n_common)"))
    val w = Window.partitionBy(col("new_id")).orderBy(desc("j_e6"), asc("old_id"))
    val best = scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("new_id").as("doc_id"), col("old_id"), col("j_e6"))
    newDocIds
      .join(best, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("old_id"), lit(-1L)).as("match_id"),
        coalesce(col("j_e6"), lit(0L)).as("jaccard_e6"),
        (coalesce(col("j_e6"), lit(0L)) >= thresholdE6).cast("long").as("is_dup"))
      .orderBy("doc_id")
  }

  /** Bloom-pruned semi join: lineitems of urgent orders. Builds a bloom
    * filter over the build side's keys (`DataFrameStatFunctions.bloomFilter`
    * — a distributed aggregation producing one bounded sketch, the public
    * API form of Spark's internal runtime bloom-filter rewrite), broadcasts
    * it, and pre-filters the probe side BEFORE the shuffle; the exact semi
    * join afterwards removes false positives, so the result is identical to
    * the unpruned join. At 100 TB the win is shuffling ~sel·|lineitem|
    * rows instead of all of them for a few MB of broadcast.
    *
    * The probe is the engine's own `BloomFilterMightContain` expression
    * (via the graftx Bridge — `might_contain` is not in the public
    * `functions` API), the exact node Spark's runtime row-level filtering
    * injects: codegen'd, no per-row boxing, and the serialized sketch rides
    * the plan as a binary literal (task-broadcast once per stage). The spec
    * asserts both the pruning and the equality with the unpruned plan.
    */
  /** Bloom sizing derived from the BUILD side's measured cardinality, not a
    * constant: a fixed `expectedNumItems` silently degrades at scale (an
    * undersized sketch saturates → fpp → 1 → the pruning stops pruning,
    * still correct but useless; a grossly oversized one rides the plan as a
    * needlessly large binary literal). One bounded memoized `count()` on the
    * already-filtered build side (same pattern as the ANN bit sizing) fixes
    * the design point at any data scale. Floor of 4096 keeps tiny builds
    * from degenerate sub-KB sketches; headroom ×1.25 absorbs growth between
    * the count and the build in a production incremental setting.
    */
  private[graft] def bloomExpectedItems(spark: SparkSession, d: String): Long = {
    val n = Memo(spark, s"bloom_build_count|$d") {
      java.lang.Long.valueOf(
        Tables.orders(spark, d)
          .filter(col("o_orderpriority") === "1-URGENT")
          .count())
    }.longValue()
    math.max(4096L, n + n / 4)
  }

  /** [[AnnStore]] kind for the serialized urgent-orders bloom sketch. The
    * generation token pins the in-code constants the stored bytes bake in:
    * the build-side predicate (o_orderpriority = '1-URGENT') and Spark's
    * `BloomFilterImpl` wire format — change either and bump the token.
    */
  private[graft] val BloomKind = "bloomsemi-v1-urgent"

  /** The serialized sketch for [[bloomPrunedSemiJoin]]'s build side —
    * ingest-time work, cached at BOTH levels like the ANN index (ADVICE
    * r14: the sketch was rebuilt eagerly on every invocation, a distributed
    * aggregation over orders charged to every bench rep): Memo serves
    * repeat calls within a session, AnnStore persists the bytes across
    * sessions keyed on the ORDERS fingerprint + the (fpp, expected-items)
    * design point, so a fresh query session pays one tiny parquet read and
    * a regenerated corpus invalidates the store path itself.
    */
  private[graft] def bloomSketchBytes(spark: SparkSession, d: String): Array[Byte] =
    Memo(spark, s"bloomsketch|$d") {
      // params carry only the fpp design point: expectedNumItems is
      // DATA-derived (bloomExpectedItems — a distributed count), and baking
      // it into the path would force every fresh session to re-run that
      // count just to locate the store, costing the orders scan the cache
      // exists to avoid. The fingerprint already re-keys the path when the
      // data changes, and the count runs only inside the cold build.
      val stored = AnnStore.loadOrBuild(spark,
        AnnStore.path(spark, BloomKind, d, "p01", corpusTable = "orders")) {
        import spark.implicits._
        val bloom = Tables.orders(spark, d)
          .filter(col("o_orderpriority") === "1-URGENT")
          .stat.bloomFilter("o_orderkey",
            expectedNumItems = bloomExpectedItems(spark, d), fpp = 0.01)
        val bos = new java.io.ByteArrayOutputStream()
        bloom.writeTo(bos)
        Seq(Tuple1(bos.toByteArray)).toDF("sketch")
      }
      // one row, a few hundred KB — bounded by the sketch's own size
      stored.head().getAs[Array[Byte]]("sketch")
    }

  def bloomPrunedSemiJoin(spark: SparkSession, d: String): DataFrame = {
    val urgent = Tables.orders(spark, d)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val bloomBytes = bloomSketchBytes(spark, d)
    val pruned = Tables.lineitem(spark, d)
      .filter(org.apache.spark.sql.graftx.Bridge.bloomMightContain(bloomBytes, col("l_orderkey")))
    pruned.join(urgent, pruned("l_orderkey") === urgent("o_orderkey"), "left_semi")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), Exact.sumLong(Exact.c2(col("l_quantity"))).as("qty_c2"))
      .orderBy("l_returnflag")
  }

  /** Unpruned reference plan for [[bloomPrunedSemiJoin]] (spec surface). */
  private[graft] def plainSemiJoin(spark: SparkSession, d: String): DataFrame = {
    val urgent = Tables.orders(spark, d)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val li = Tables.lineitem(spark, d)
    li.join(urgent, li("l_orderkey") === urgent("o_orderkey"), "left_semi")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), Exact.sumLong(Exact.c2(col("l_quantity"))).as("qty_c2"))
      .orderBy("l_returnflag")
  }
}
