package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Dynamic-schema payload handling via Spark 4 VariantType — the modeling
  * SURVEY.md §1.2 ranks first for schemaless DynamoDB items: `parse_json`
  * once, then typed `variant_get` paths, with shredding-friendly storage
  * instead of repeated JSON string parsing.
  */
object VariantOps {

  /** Session-memoized shredded-parquet materialization of `events` with
    * `props` parsed to a VARIANT column (see [[VariantStorage]]).
    *
    * This is the ingest-time data layout a variant workload would run with
    * at 100 TB: common JSON paths become real typed parquet columns, so the
    * two variant queries scan typed columns instead of re-parsing the JSON
    * string per row per query (round-3's top bench cost, 8.1s). The write
    * is a one-time layout cost shared by `variant_props` and `variant_agg`
    * — memoized like the CDC frames and warmed untimed in Bench per the
    * shared-by-two-or-more rule (Warm.scala).
    */
  def shreddedEvents(spark: SparkSession, d: String): DataFrame =
    Memo(spark, s"shredded-events|$d") {
      val dir = Scratch.dir("graft-shredded-events").toString
      VariantStorage.writeShredded(
        Tables.events(spark, d)
          .select(col("event_id"), col("event_type"),
            parse_json(col("props")).as("v")),
        dir)
      VariantStorage.readBack(spark, dir)
    }

  /** `events.props` as a variant column with typed path extraction, over the
    * shredded materialization: with `pushVariantIntoScan` the `variant_get`
    * paths below are rewritten into struct-field scans of the shredded
    * `typed_value` parquet columns (asserted in OpsSpec).
    *
    * `variant_get`, not `try_variant_get`, on the absent path: a MISSING
    * path yields NULL under both (try only differs on cast failure), and
    * profiling at sf0.1 showed try_variant_get costing ~1.5x on the whole
    * projection stage (it is not codegen-friendly). try-semantics for
    * malformed casts stay covered in OpsSpec.
    */
  def variantProps(spark: SparkSession, d: String): DataFrame =
    shreddedEvents(spark, d)
      .select(
        col("event_id"),
        variant_get(col("v"), "$.k", "int").as("k"),
        // missing path → NULL, proving absent-key handling (reads the
        // residual, not a shredded column — still NULL, spec'd)
        variant_get(col("v"), "$.missing", "string").as("absent"),
        col("event_type"))
      .orderBy("event_id")

  /** Aggregation directly over variant-extracted values (same shredded
    * scan; the agg input is a typed column, not a per-row JSON parse).
    */
  def variantAgg(spark: SparkSession, d: String): DataFrame =
    shreddedEvents(spark, d)
      .select(col("event_type"),
        variant_get(col("v"), "$.k", "long").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy("event_type")
}

/** Shredded variant STORAGE (SURVEY.md §1.2): Spark 4.1 can write a variant
  * column to parquet with inferred shredding — common JSON paths become real
  * typed parquet columns (`typed_value`) next to the opaque binary, so a
  * later `variant_get(v, '$.k', 'int')` scan prunes and pushes down like any
  * typed column instead of re-parsing binary variant per row. At 100 TB this
  * is the difference between a columnar scan and a full decode.
  */
object VariantStorage {

  /** Write `df` (containing variant columns) with shredding enabled. */
  def writeShredded(df: DataFrame, path: String): Unit = {
    val spark = df.sparkSession
    withFlags(spark) {
      df.write.mode("overwrite").parquet(path)
    }
  }

  /** Session capability flags for shredded variant reads. Both are
    * WIDENING-ONLY: `allowReadingShredded` lets the reader accept shredded
    * files (plain variant files read unchanged), and `pushVariantIntoScan`
    * rewrites `variant_get` over a parquet scan into a struct-field read of
    * the shredded `typed_value` columns (a no-op for unshredded data). They
    * must hold at ACTION time on any frame returned by [[readBack]] — not
    * just while that method runs — so they are set for the session,
    * idempotently. OpsSpec pins that a concurrent plain-variant reader in
    * the same session is unaffected.
    */
  def enableShredded(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.variant.allowReadingShredded", "true")
    spark.conf.set("spark.sql.variant.pushVariantIntoScan", "true")
  }

  def readBack(spark: SparkSession, path: String): DataFrame = {
    enableShredded(spark)
    spark.read.parquet(path)
  }

  private def withFlags[T](spark: SparkSession)(body: => T): T = {
    val prev = Seq("spark.sql.variant.writeShredding.enabled",
      "spark.sql.variant.inferShreddingSchema").map(k => k -> spark.conf.getOption(k))
    prev.foreach { case (k, _) => spark.conf.set(k, "true") }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}

/** Skew mitigation: two-phase salted aggregation (SURVEY.md §7.4 item 5 —
  * hot pk prefixes at 100 TB). Phase 1 aggregates on (key, salt) so a hot
  * key's rows spread over `nSalts` reducers; phase 2 merges the partials.
  * Results are exactly the plain groupBy's (the oracle checks that).
  */
object Skew {
  def saltedEventAgg(spark: SparkSession, d: String, nSalts: Int = 16): DataFrame =
    Tables.events(spark, d)
      .withColumn("salt", pmod(hash(col("event_id")), lit(nSalts)))
      .groupBy(col("event_type"), col("salt"))
      .agg(count(lit(1)).as("pn"),
        sum(Exact.c2(col("value")).cast(DecimalType(38, 0))).as("pv"))
      .groupBy(col("event_type"))
      .agg(sum(col("pn")).as("n"),
        sum(col("pv")).cast("long").as("total_value_c2"))
      .orderBy("event_type")

  /** Salted fact⋈dim JOIN — the hot-KEY answer when the dim is too big to
    * broadcast and one join key dominates (a celebrity user at 100 TB sends
    * every one of its rows to ONE reducer). The fact side salts each row
    * deterministically; the dim side replicates each row `nSalts` times
    * (explode), so a hot key's rows spread over `nSalts` reducers. Results
    * are exactly the plain join's — the oracle checks the unsalted SQL.
    * Cost: dim side ships nSalts×; size nSalts to the skew factor, not
    * higher. (AQE's skew-join split is the runtime alternative; salting is
    * the declarative one that also works under non-AQE shuffles.)
    */
  def saltedUserSegmentAgg(spark: SparkSession, d: String, nSalts: Int = 8): DataFrame = {
    val ev = Tables.events(spark, d)
      .withColumn("fsalt", pmod(hash(col("event_id")), lit(nSalts)))
    val cust = Tables.customer(spark, d)
      .select(col("c_custkey"), col("c_mktsegment"))
      .withColumn("dsalt", explode(array((0 until nSalts).map(lit(_)): _*)))
    ev.join(cust,
        col("user_id") === col("c_custkey") && col("fsalt") === col("dsalt"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_events"),
        Exact.sumLong(Exact.c2(col("value"))).as("total_value_c2"))
      .orderBy("c_mktsegment")
  }
}

/** Sketch aggregations: approximate distinct (HLL++) and quantiles — the
  * constant-memory path for 100 TB cardinality/percentile questions. No
  * DuckDB oracle (different sketch implementations); accuracy is asserted
  * against exact answers in OpsSpec.
  */
object Sketches {
  /** Production shape: sketches ONLY — constant-memory per group, the
    * whole reason HLL++/quantile sketches exist at 100 TB. The accuracy
    * evidence lives in the `*_check` twin below (same split as the ANN
    * production/recall pairs), never in this query's own cost.
    */
  def approxEventStats(spark: SparkSession, d: String): DataFrame =
    Tables.events(spark, d)
      .groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id")).as("approx_users"),
        percentile_approx(col("value"), lit(0.5), lit(1000)).as("approx_median_value"),
        count(lit(1)).as("n"))
      .orderBy("event_type")

  /** Gate/evidence twin: the sketch next to the exact distinct and the
    * relative error in e6 units, so the dumped artifact itself evidences
    * sketch accuracy (OpsSpec bounds it; default rsd 0.05). The exact
    * count_distinct's cost scales with distinct users — which is exactly
    * why it lives HERE and not in the production query above.
    */
  def approxEventStatsCheck(spark: SparkSession, d: String): DataFrame =
    Tables.events(spark, d)
      .groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id")).as("approx_users"),
        count_distinct(col("user_id")).as("exact_users"),
        count(lit(1)).as("n"))
      .withColumn("users_err_e6",
        floor(abs(col("approx_users") - col("exact_users")).cast("double") *
          lit(1000000.0) / col("exact_users").cast("double")).cast("long"))
      .orderBy("event_type")
}
