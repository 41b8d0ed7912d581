package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Relational analytics operators over the TPC-H-ish tables (SURVEY.md §2.1
  * categories the reference lacks but the engine ships: joins, aggregations,
  * windows, sorts/top-k, set ops, scalar functions).
  *
  * Determinism-for-oracle rules (SURVEY.md §5.2, revised after round 1):
  * double columns are cast to exact decimals BEFORE arithmetic/aggregation so
  * sums are order-independent and bit-identical across engines; aggregate
  * money/metric sums are then carried as exact SCALED INTEGERS (see [[Exact]])
  * and exported as BIGINT — decimal output columns hash differently in the
  * driver's normalizer, and decimal→double conversion is only exact below
  * 2^53 unscaled; every query ends in an orderBy on a unique key; integer
  * outputs are BIGINT.
  *
  * Scale notes: aggregations are partial+final (map-side combine) for free;
  * small dimensions (region/nation/supplier/customer) are broadcast so the
  * only data-sized shuffles are lineitem/orders groupBys. AQE handles skew.
  */
object Analytics {

  private def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** TPC-H Q1-style pricing summary: hash agg with partial aggregation.
    * Money is integer cents / e6 micro-units throughout (see [[Exact]]); the
    * charge term is natively e10 (c2 * e4 * e4), floor-divided to e6 per row
    * (`div` truncation == floor for these all-positive terms) so the exported
    * sum fits BIGINT at any SF.
    */
  def pricingSummary(spark: SparkSession, d: String): DataFrame =
    Tables.lineitem(spark, d)
      .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02")))
      .withColumn("qty_c2", Exact.c2(col("l_quantity")))
      .withColumn("price_c2", Exact.c2(col("l_extendedprice")))
      .withColumn("disc_e4", Exact.e4(col("l_discount")))
      .withColumn("tax_e4", Exact.e4(col("l_tax")))
      .withColumn("disc_price_e6", col("price_c2") * (lit(10000L) - col("disc_e4")))
      .withColumn("charge_e6",
        expr("(price_c2 * (10000 - disc_e4) * (10000 + tax_e4)) div 10000"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        Exact.sumLong(col("qty_c2")).as("sum_qty_c2"),
        Exact.sumLong(col("price_c2")).as("sum_base_price_c2"),
        Exact.sumLong(col("disc_price_e6")).as("sum_disc_price_e6"),
        Exact.sumLong(col("charge_e6")).as("sum_charge_e6"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** TPC-H Q3-style: 3-way join, revenue top-10. The filtered customer dim
    * is broadcast explicitly; lineitem join orders stays a shuffle join so the
    * plan survives a 100x scale-up (AQE demotes it to broadcast when small). */
  def shippingPriority(spark: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(spark, d).filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.orders(spark, d)
      .filter(col("o_orderdate") < to_timestamp(lit("1998-03-15")))
    val li = Tables.lineitem(spark, d)
      .filter(col("l_shipdate") > to_timestamp(lit("1998-03-15")))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(Exact.sumLong(Exact.c2(col("l_extendedprice"))
        * (lit(10000L) - Exact.e4(col("l_discount")))).as("revenue_e6"))
      .select(col("l_orderkey"), col("revenue_e6"), col("o_orderdate").cast("date").as("order_date"))
      .orderBy(desc("revenue_e6"), asc("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5-style: 5-way join through region→nation→(customer, supplier),
    * revenue per nation. All dims broadcast; lineitem⋈orders is the only
    * data-sized join.
    */
  def localSupplierVolume(spark: SparkSession, d: String): DataFrame = {
    val region = Tables.region(spark, d).filter(col("r_name") === "ASIA")
    val nation = Tables.nation(spark, d)
    val cust = Tables.customer(spark, d)
    val supp = Tables.supplier(spark, d)
    val ord = Tables.orders(spark, d)
      .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
        col("o_orderdate") < to_timestamp(lit("1998-01-01")))
    val li = Tables.lineitem(spark, d)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(Exact.sumLong(Exact.c2(col("l_extendedprice"))
        * (lit(10000L) - Exact.e4(col("l_discount")))).as("revenue_e6"))
      .orderBy("n_name")
  }

  /** TPC-H Q6-style: pure filter + global aggregate — the pushdown showcase
    * (all three predicates reach the parquet scan).
    */
  def revenueForecast(spark: SparkSession, d: String): DataFrame =
    Tables.lineitem(spark, d)
      .filter(col("l_shipdate") >= to_timestamp(lit("1997-01-01")) &&
        col("l_shipdate") < to_timestamp(lit("1998-01-01")) &&
        col("l_discount").between(0.02, 0.04) && col("l_quantity") < 24)
      .agg(Exact.sumLong(Exact.c2(col("l_extendedprice")) * Exact.e4(col("l_discount")))
        .as("revenue_e6"),
        count(lit(1)).as("n_rows"))

  /** Window top-k: 3 highest-value orders per customer. */
  def topOrdersPerCustomer(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    Tables.orders(spark, d)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
      .orderBy("o_custkey", "rn")
  }

  /** Anti join: customers with no URGENT order. */
  def customersWithoutOrders(spark: SparkSession, d: String): DataFrame = {
    // Scoped to URGENT orders: in the generated data every customer has at
    // least one order, so the unfiltered anti join is vacuously empty and
    // certifies nothing (round-7 verdict). "No urgent order" is nonempty at
    // every SF while keeping the LeftAnti plan shape.
    val ord = Tables.orders(spark, d)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey"))
    Tables.customer(spark, d)
      .join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy("c_custkey")
  }

  /** Semi join: customers with at least one finished order. */
  def customersWithFinishedOrders(spark: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(spark, d)
      .filter(col("o_orderstatus") === "F").select(col("o_custkey"))
    Tables.customer(spark, d)
      .join(ord, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_mktsegment"))
      .orderBy("c_custkey")
  }

  /** Rollup (grouping sets): order totals by region→nation with subtotals. */
  def salesRollup(spark: SparkSession, d: String): DataFrame = {
    val joined = Tables.orders(spark, d)
      .join(Tables.customer(spark, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, d)), col("n_regionkey") === col("r_regionkey"))
    joined
      .rollup(col("r_name"), col("n_name"))
      .agg(Exact.sumLong(Exact.c2(col("o_totalprice"))).as("total_c2"),
        count(lit(1)).as("n_orders"))
      .select(coalesce(col("r_name"), lit("ALL")).as("region"),
        coalesce(col("n_name"), lit("ALL")).as("nation"),
        col("total_c2"), col("n_orders"))
      .orderBy("region", "nation")
  }

  /** CUBE grouping sets: order counts/totals across ALL subsets of
    * (status, priority) — the 2^n companion of [[salesRollup]]'s
    * hierarchical rollup. Spark expands grouping sets into one aggregation
    * pass with a grouping-id column; no per-subset rescans.
    */
  def ordersCube(spark: SparkSession, d: String): DataFrame =
    Tables.orders(spark, d)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        Exact.sumLong(Exact.c2(col("o_totalprice"))).as("total_c2"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n_orders"), col("total_c2"))
      .orderBy("status", "priority")

  /** Exact DISCRETE percentiles (p50/p90/p99 of order value per market
    * segment) in pure integer arithmetic: value at sorted position
    * ceil(p·n), positions computed as (p·n + denom − 1) div denom — no
    * interpolation, no floating-point percentile boundary, so the DuckDB
    * oracle matches bit-for-bit (Spark's `percentile` and DuckDB's
    * `quantile_cont` interpolate in double and can round apart).
    * See [[revenuePercentiles]] for the distributed-selection plan shape;
    * `percentile_approx` (the mergeable-sketch twin below) remains the
    * percentile-of-everything 100 TB path, with the exact op as its error
    * gate — the same exact/approx pairing as `approx_event_stats`.
    */
  /** The ONE (segment, order-value-cents) projection both percentile
    * operators rank/sketch over — a drifted copy would silently
    * desynchronize the exact gate from its approx twin. Session-memoized
    * AND persisted: the multi-pass selection below takes three actions
    * over it, and the approx twin shares it — without the cache each pass
    * would re-run the orders ⋈ customer join (measured: the re-joins cost
    * more than the whole-segment sort the rewrite removed).
    */
  private def segmentC2(spark: SparkSession, d: String): DataFrame =
    Memo(spark, s"segment_c2|$d") {
      Tables.orders(spark, d)
        .join(Tables.customer(spark, d), col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment"), Exact.c2(col("o_totalprice")).as("c2"))
        .persist()
    }

  /** Bit-exact percentiles WITHOUT a whole-segment sort task — the
    * [[DistributedSelect.exactGroupPercentiles]] two-pass selection (see
    * its scaladoc for the plan shape), replacing the
    * `Window.partitionBy(segment)` rank whose one-task-per-segment shape
    * measured 2.19× at 10× data (now 1.2×, docs/TUNING.md). Same discrete
    * value-at-rank semantics, so the DuckDB oracle is unchanged.
    */
  def revenuePercentiles(spark: SparkSession, d: String, nBuckets: Int = 256): DataFrame =
    DistributedSelect.exactGroupPercentiles(segmentC2(spark, d), "c_mktsegment", "c2",
      Seq(("p50_c2", 1L, 2L), ("p90_c2", 9L, 10L), ("p99_c2", 99L, 100L)), nBuckets)
      .withColumnRenamed("n_rows", "n_orders")
      .orderBy("c_mktsegment")

  /** The sketch twin of [[revenuePercentiles]] — `percentile_approx`
    * (Spark's mergeable KLL-style quantile sketch: constant memory,
    * partial+final combine, the 100 TB path) next to the exact discrete
    * values, with the absolute error exported per percentile. Rows-only
    * (the sketch is engine-specific) with the same error-evidence
    * discipline as `approx_event_stats`: the gate shows the error is real
    * AND bounded, not assumed. Accuracy 10000 bounds rank error at
    * n/10000, which the spec converts to a value-error assertion against
    * the exact neighborhood.
    *
    * Determinism caveat (unlike the HLL sketches, which merge
    * order-independently): quantile-summary merge is order-SENSITIVE, so
    * once a group exceeds the sketch's exact head (~`accuracy` rows) the
    * apNN/errNN values may vary run-to-run with shuffle fetch order —
    * always within the rank bound, never comparable by hash. So this is
    * a rows-only gate and the spec asserts the BOUND, not the values.
    */
  def revenuePercentilesApprox(spark: SparkSession, d: String,
      accuracy: Int = 10000): DataFrame = {
    val exact = revenuePercentiles(spark, d)
    val approx = segmentC2(spark, d)
      .groupBy(col("c_mktsegment"))
      .agg(percentile_approx(col("c2"), array(lit(0.5), lit(0.9), lit(0.99)),
        lit(accuracy)).as("ap"))
      .select(col("c_mktsegment"),
        col("ap").getItem(0).as("ap50_c2"),
        col("ap").getItem(1).as("ap90_c2"),
        col("ap").getItem(2).as("ap99_c2"))
    exact.join(approx, "c_mktsegment")
      .select(col("c_mktsegment"), col("n_orders"),
        col("ap50_c2"), col("ap90_c2"), col("ap99_c2"),
        abs(col("ap50_c2") - col("p50_c2")).as("err50_c2"),
        abs(col("ap90_c2") - col("p90_c2")).as("err90_c2"),
        abs(col("ap99_c2") - col("p99_c2")).as("err99_c2"))
      .orderBy("c_mktsegment")
  }

  /** Distinct aggregation: segment diversity per nation. */
  def segmentsPerNation(spark: SparkSession, d: String): DataFrame =
    Tables.customer(spark, d)
      .join(broadcast(Tables.nation(spark, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(countDistinct(col("c_mktsegment")).as("n_segments"),
        count(lit(1)).as("n_customers"),
        Exact.sumLong(Exact.c2(col("c_acctbal"))).as("total_acctbal_c2"))
      .orderBy("n_name")

  /** Scalar function surface: string/math/concat over `part`. */
  def partScalarFuncs(spark: SparkSession, d: String): DataFrame =
    Tables.part(spark, d)
      .select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_u"),
        length(col("p_name")).cast("long").as("name_len"),
        substring(col("p_type"), 1, 4).as("type_pre"),
        (col("p_size") % 7).cast("long").as("size_mod"),
        (dec2(col("p_retailprice")) * lit(BigDecimal("1.1")).cast(DecimalType(3, 1)))
          .cast("double").as("price_adj"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"))
      .orderBy("p_partkey")

  /** Date/time function surface over `orders`. */
  def orderDateFuncs(spark: SparkSession, d: String): DataFrame =
    Tables.orders(spark, d)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"),
        dayofmonth(col("o_orderdate")).cast("long").as("day_of_month"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
        col("o_orderdate").cast("date").as("order_date"))
      .orderBy("o_orderkey")

  /** Set ops: segments present in both nation 1 and nation 2 (INTERSECT)
    * and in nation 1 only (EXCEPT) — `df.intersect`/`df.except` are the
    * §2.1 set-operation surface.
    */
  def segmentIntersect(spark: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(spark, d)
    c.filter(col("c_nationkey") === 1).select(col("c_mktsegment"))
      .intersect(c.filter(col("c_nationkey") === 2).select(col("c_mktsegment")))
      .orderBy("c_mktsegment")
  }

  def segmentExcept(spark: SparkSession, d: String): DataFrame = {
    // (nation, segment) pairs with a mildly-negative-balance customer but no
    // deeply-negative one. The earlier nation-1-vs-nation-2 segment EXCEPT
    // was vacuously empty (all five segments occur in every nation at every
    // SF — round-7 verdict); this filtered-set difference is nonempty at
    // sf0.001/0.01/0.1 while keeping the Except(distinct) plan shape.
    val c = Tables.customer(spark, d)
    val pairs = (f: Column) =>
      c.filter(f).select(col("c_nationkey").cast("long").as("c_nationkey"), col("c_mktsegment"))
    pairs(col("c_acctbal") < 0)
      .except(pairs(col("c_acctbal") < -900))
      .orderBy("c_nationkey", "c_mktsegment")
  }

  /** TPC-H Q17-style correlated scalar subquery, via the SQL entry point —
    * Catalyst decorrelates it into an aggregate + join (the "subquery
    * handling" row of SURVEY §4.1).
    */
  def smallQuantityRevenue(spark: SparkSession, d: String): DataFrame = {
    Tables.lineitem(spark, d).createOrReplaceTempView("g_lineitem")
    Tables.part(spark, d).createOrReplaceTempView("g_part")
    spark.sql(
      """SELECT CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS DECIMAL(38,0))) AS BIGINT) AS total_small_rev_c2,
        |       count(*) AS n_rows
        |FROM g_lineitem JOIN g_part ON p_partkey = l_partkey
        |WHERE p_brand = 'Brand#13'
        |  AND l_quantity < (SELECT 0.5 * avg(l_quantity) FROM g_lineitem l2
        |                    WHERE l2.l_partkey = g_lineitem.l_partkey)
        |""".stripMargin)
  }

  /** TPC-H Q4-style order-priority count gated by a correlated EXISTS —
    * Catalyst decorrelates it into a left-semi join on the order key
    * (SURVEY §4.1 subquery handling). The inner predicate references the
    * OUTER row's `o_orderdate` ("shipped more than 60 days after
    * ordering"), so this is a genuinely correlated exists, not a
    * constant-filter semi join.
    */
  def orderPriorityLateShip(spark: SparkSession, d: String): DataFrame = {
    Tables.orders(spark, d).createOrReplaceTempView("g_orders")
    Tables.lineitem(spark, d).createOrReplaceTempView("g_lineitem")
    spark.sql(
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM g_orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-07-01'
        |  AND EXISTS (SELECT 1 FROM g_lineitem l
        |              WHERE l.l_orderkey = g_orders.o_orderkey
        |                AND l.l_shipdate > g_orders.o_orderdate + INTERVAL 60 DAYS)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin)
  }

  /** TPC-H Q2-style correlated MIN scalar subquery: each customer's
    * cheapest order(s). Catalyst decorrelates the scalar MIN into a
    * per-custkey aggregate joined back to the outer scan (spec'd in
    * OpsSpec) — one shuffle on the correlation key, no per-row subquery
    * re-execution, which is the shape that scales: the naive semantics
    * would re-scan orders once per outer row.
    */
  def cheapestOrderPerCustomer(spark: SparkSession, d: String): DataFrame = {
    Tables.orders(spark, d).createOrReplaceTempView("g_orders")
    spark.sql(
      """SELECT o_orderkey, o_custkey,
        |       CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS total_c2
        |FROM g_orders o
        |WHERE o_totalprice = (SELECT min(o2.o_totalprice) FROM g_orders o2
        |                      WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin)
  }

  /** TPC-H Q13-style left-outer count distribution: how many customers
    * placed N (non-urgent) orders, INCLUDING the zero-order customers the
    * outer join preserves — the shape an inner join silently gets wrong.
    * Two shuffles (custkey, then the tiny c_count regroup); the join
    * predicate on o_orderpriority lives in the JOIN condition, not a WHERE,
    * which is the semantic point of the pattern.
    */
  def orderCountDistribution(spark: SparkSession, d: String): DataFrame = {
    val perCust = Tables.customer(spark, d)
      .join(Tables.orders(spark, d).filter(col("o_orderpriority") =!= "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count")) // count(col): NULLs from no-match rows don't count
    perCust.groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(desc("custdist"), desc("c_count"))
  }

  /** TPC-H Q21-style EXISTS + NOT EXISTS: suppliers who were the ONLY late
    * shipper in a finished multi-supplier order ("late" adapted to this
    * schema: shipped >60 days after the order date). Catalyst decorrelates
    * the EXISTS into a left-semi and the NOT EXISTS into a left-anti join,
    * both shuffling on the order key — three key-local joins, no per-row
    * re-execution (plan spec'd in OpsSpec).
    */
  def waitingSupplier(spark: SparkSession, d: String): DataFrame = {
    Tables.orders(spark, d).createOrReplaceTempView("g_orders")
    Tables.lineitem(spark, d).createOrReplaceTempView("g_lineitem")
    Tables.supplier(spark, d).createOrReplaceTempView("g_supplier")
    spark.sql(
      """SELECT s_name, count(*) AS numwait
        |FROM g_supplier, g_lineitem l1, g_orders o
        |WHERE s_suppkey = l1.l_suppkey
        |  AND o.o_orderkey = l1.l_orderkey
        |  AND o.o_orderstatus = 'F'
        |  AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
        |  AND EXISTS (SELECT 1 FROM g_lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM g_lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name""".stripMargin)
  }

  /** Explicit GROUPING SETS (beyond rollup/cube's fixed lattices): two
    * one-dimension marginals plus the grand total in ONE pass — Spark
    * expands the sets in a single Expand + aggregate, not one scan per set.
    * NULL group keys exported as 'ALL' per the rollup/cube convention.
    */
  def ordersGroupingSets(spark: SparkSession, d: String): DataFrame = {
    Tables.orders(spark, d).createOrReplaceTempView("g_orders")
    spark.sql(
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |       coalesce(o_orderpriority, 'ALL') AS priority,
        |       count(*) AS n_orders,
        |       CAST(SUM(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS DECIMAL(38,0))) AS BIGINT) AS total_c2
        |FROM g_orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY status, priority""".stripMargin)
  }

  /** TPC-H Q11-style global-threshold HAVING: segments whose order value
    * exceeds a fifth of the GLOBAL total. The uncorrelated scalar subquery
    * is computed once and broadcast into the having filter — at 100 TB both
    * sides are one partial+final aggregate each, and the comparison is kept
    * in exact integer cents (a times-5 integer inequality, no fraction).
    */
  def segmentShareOverThreshold(spark: SparkSession, d: String): DataFrame = {
    Tables.orders(spark, d).createOrReplaceTempView("g_orders")
    Tables.customer(spark, d).createOrReplaceTempView("g_customer")
    spark.sql(
      """SELECT c_mktsegment,
        |       CAST(SUM(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS DECIMAL(38,0))) AS BIGINT) AS total_c2
        |FROM g_orders JOIN g_customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment
        |HAVING SUM(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS DECIMAL(38,0))) * 5 >
        |       (SELECT SUM(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS DECIMAL(38,0))) FROM g_orders)
        |ORDER BY c_mktsegment""".stripMargin)
  }

  /** TPC-H Q18-style IN over an aggregated-HAVING subquery: orders whose
    * total lineitem quantity clears a threshold. Catalyst turns the IN into
    * a left-semi join against the aggregated subquery — the aggregate runs
    * once over lineitem (grouped on its own key, map-side partials), never
    * per outer row. Quantities compared as exact cents.
    */
  def largeQuantityOrders(spark: SparkSession, d: String): DataFrame = {
    Tables.orders(spark, d).createOrReplaceTempView("g_orders")
    Tables.lineitem(spark, d).createOrReplaceTempView("g_lineitem")
    spark.sql(
      """SELECT o_orderkey, o_custkey,
        |       CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS total_c2
        |FROM g_orders
        |WHERE o_orderkey IN
        |  (SELECT l_orderkey FROM g_lineitem
        |   GROUP BY l_orderkey
        |   HAVING SUM(CAST(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS DECIMAL(38,0))) > 15000)
        |ORDER BY o_orderkey""".stripMargin)
  }

  /** Window FRAMES (running + offset): per-customer running revenue with an
    * explicit ROWS frame, plus lag of the previous order's value. One
    * shuffle on the partition key serves both window functions (same
    * partitioning + ordering); all money stays exact integer cents.
    */
  def runningRevenue(spark: SparkSession, d: String): DataFrame = {
    val c2 = Exact.c2(col("o_totalprice"))
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(spark, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), c2.as("c2"))
      .withColumn("running_c2",
        // DECIMAL(38,0) accumulate → BIGINT export, per the Exact rule: a
        // BIGINT window accumulator can wrap on a hot key at target scale
        sum(col("c2").cast(DecimalType(38, 0)))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("long"))
      .withColumn("prev_c2", lag(col("c2"), 1).over(w))
      .select(col("o_custkey"), col("o_orderkey"), col("running_c2"), col("prev_c2"))
      .orderBy("o_orderkey")
  }

  /** The ranking-window family — ntile / rank / dense_rank / percent_rank /
    * cume_dist — all over ONE window spec (same partitioning + ordering →
    * one exchange + one sort serves all five). The ordering includes the
    * unique c_custkey so ntile bucket assignment is deterministic; the
    * ratio functions are exact small rationals computed identically by both
    * engines, exported floor(·1e6) per the parity rules.
    */
  def rankingWindows(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
    Tables.customer(spark, d)
      .select(
        col("c_custkey"), col("c_mktsegment"),
        ntile(4).over(w).cast("long").as("quartile"),
        rank().over(w).cast("long").as("rnk"),
        dense_rank().over(w).cast("long").as("drnk"),
        floor(percent_rank().over(w) * lit(1000000.0)).cast("long").as("pct_rank_e6"),
        floor(cume_dist().over(w) * lit(1000000.0)).cast("long").as("cume_e6"))
      .orderBy("c_custkey")
  }

  /** FULL OUTER join of two aggregated activity views: users seen in the
    * orders table, the events table, or either. Both sides pre-aggregate to
    * one row per key BEFORE the join (the full-outer then joins two
    * key-unique relations — shuffle sized by distinct users, not raw rows),
    * and absent sides surface as zero via coalesce.
    */
  def userActivityFullOuter(spark: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(spark, d)
      .groupBy(col("o_custkey").as("u")).agg(count(lit(1)).as("n_orders"))
    val e = Tables.events(spark, d)
      .groupBy(col("user_id").as("u")).agg(count(lit(1)).as("n_events"))
    o.join(e, Seq("u"), "full_outer")
      .select(col("u").as("user_id"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("n_events"), lit(0L)).as("n_events"))
      .orderBy("user_id")
  }

  /** LATERAL correlated subquery: each customer's top-2 orders by value.
    * The lateral subquery (with its correlated filter + ORDER BY + LIMIT)
    * is rewritten by Catalyst into a window-style per-key limit, not a
    * per-customer re-scan of orders — same scale shape as `window_top_orders`
    * but exercising the LATERAL plan path (DomainJoin rewrite).
    */
  def lateralTopOrders(spark: SparkSession, d: String): DataFrame = {
    Tables.orders(spark, d).createOrReplaceTempView("g_orders")
    Tables.customer(spark, d).createOrReplaceTempView("g_customer")
    spark.sql(
      """SELECT c_custkey, t.o_orderkey, t.total_c2
        |FROM g_customer,
        |LATERAL (SELECT o_orderkey,
        |                CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS total_c2
        |         FROM g_orders
        |         WHERE o_custkey = c_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey
        |         LIMIT 2) t
        |ORDER BY c_custkey, o_orderkey""".stripMargin)
  }

  /** TPC-H Q10-style returned-item revenue: which customers returned the
    * most value in a quarter. Fact-fact join shuffles on the order key;
    * nation broadcast; deterministic top-k (revenue desc, custkey asc) via
    * TakeOrderedAndProject.
    */
  def returnedItemRevenue(spark: SparkSession, d: String, k: Int = 20): DataFrame = {
    val li = Tables.lineitem(spark, d).filter(col("l_returnflag") === "R")
    val ord = Tables.orders(spark, d)
      .filter(col("o_orderdate") >= to_timestamp(lit("1997-01-01")) &&
        col("o_orderdate") < to_timestamp(lit("1997-07-01")))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(Exact.sumLong(Exact.c2(col("l_extendedprice"))
        * (lit(10000L) - Exact.e4(col("l_discount")))).as("revenue_e6"))
      .orderBy(desc("revenue_e6"), asc("c_custkey"))
      .limit(k)
  }

  /** TPC-H Q8-style market share: conditional aggregation — one nation's
    * revenue share within a region per order year. Exports the exact scaled
    * numerator/denominator (the ratio itself is one IEEE division away for
    * consumers; exporting both integers keeps the oracle exact). All dims
    * broadcast; lineitem⋈orders is the only data-sized join.
    */
  def marketShare(spark: SparkSession, d: String,
      region: String = "ASIA", suppNation: String = "NATION_3"): DataFrame = {
    val reg = Tables.region(spark, d).filter(col("r_name") === region)
    val nationC = Tables.nation(spark, d)
      .select(col("n_nationkey").as("cn_key"), col("n_regionkey"))
    val nationS = Tables.nation(spark, d)
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    Tables.lineitem(spark, d)
      .join(Tables.orders(spark, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nationC), col("c_nationkey") === col("cn_key"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .join(broadcast(Tables.supplier(spark, d)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nationS), col("s_nationkey") === col("sn_key"))
      .withColumn("rev_e6",
        Exact.c2(col("l_extendedprice")) * (lit(10000L) - Exact.e4(col("l_discount"))))
      .withColumn("y", year(col("o_orderdate")).cast("long"))
      .groupBy("y")
      .agg(
        Exact.sumLong(when(col("supp_nation") === suppNation, col("rev_e6"))
          .otherwise(0L)).as("target_rev_e6"),
        Exact.sumLong(col("rev_e6")).as("total_rev_e6"),
        count(lit(1)).as("n_rows"))
      .orderBy("y")
  }

  /** TPC-H Q19-style disjunctive predicate: three (brand, size, quantity)
    * branches OR-ed across the join — exercises Catalyst's CNF conversion /
    * constraint extraction (per-table conjuncts derived from the DNF reach
    * the scans; the cross-table residue evaluates post-join).
    */
  def promoRevenue(spark: SparkSession, d: String): DataFrame = {
    val branch1 = col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
      col("l_quantity").between(1, 11)
    val branch2 = col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
      col("l_quantity").between(10, 20)
    val branch3 = col("p_brand") === "Brand#34" && col("p_size").between(1, 15) &&
      col("l_quantity").between(20, 30)
    Tables.lineitem(spark, d)
      .join(Tables.part(spark, d), col("l_partkey") === col("p_partkey"))
      .filter(branch1 || branch2 || branch3)
      .agg(Exact.sumLong(Exact.c2(col("l_extendedprice"))
        * (lit(10000L) - Exact.e4(col("l_discount")))).as("revenue_e6"),
        count(lit(1)).as("n_rows"))
  }

  /** Pivot: orders per year × order status as columns (`groupBy().pivot()`
    * with an explicit value list — never pivot on unbounded cardinality; an
    * explicit list keeps the plan a single pass with no distinct-values
    * pre-query).
    */
  def ordersPivot(spark: SparkSession, d: String): DataFrame =
    Tables.orders(spark, d)
      .withColumn("y", year(col("o_orderdate")).cast("long"))
      .groupBy("y")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select(col("y"), coalesce(col("F"), lit(0L)).as("n_f"),
        coalesce(col("O"), lit(0L)).as("n_o"), coalesce(col("P"), lit(0L)).as("n_p"))
      .orderBy("y")

  /** Sort + limit: top-20 line items by extended price (unique tiebreak). */
  def topLineitems(spark: SparkSession, d: String): DataFrame =
    Tables.lineitem(spark, d)
      .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
        col("l_extendedprice"))
      .orderBy(desc("l_extendedprice"), asc("l_orderkey"), asc("l_linenumber"))
      .limit(20)

  /** EXACT interpolated percentiles (percentile_cont semantics) of line-item
    * quantity per return flag — the ordered-set aggregate surface, distinct
    * from the HLL/sketch path in [[Sketches]]. Oracle parity is achievable
    * because (a) the input is pre-shifted to exact integer cents, and (b)
    * the probe points are DYADIC (0.25/0.5/0.75): the interpolation
    * `lo + (hi-lo)*frac` is then exact in binary doubles in both engines, so
    * the floor-to-BIGINT export cannot straddle an ulp. (A 0.9 probe would
    * NOT be safe — non-dyadic fractions make the result representation-
    * dependent.) At scale Spark's `percentile` is a per-group
    * counts-map aggregate (OpenHashMap partials), not a global sort — memory
    * scales with distinct values per group, not rows.
    */
  def quantityPercentiles(spark: SparkSession, d: String): DataFrame =
    Tables.lineitem(spark, d)
      .withColumn("qty_c2", Exact.c2(col("l_quantity")))
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(qty_c2, array(0.25D, 0.5D, 0.75D))").as("ps"),
        count(lit(1)).as("n_rows"))
      .select(col("l_returnflag"),
        floor(col("ps")(0)).cast("long").as("p25_c2"),
        floor(col("ps")(1)).cast("long").as("p50_c2"),
        floor(col("ps")(2)).cast("long").as("p75_c2"),
        col("n_rows"))
      .orderBy("l_returnflag")

  /** Pre-join fanout diagnostic — the query an operator runs BEFORE a
    * key-equality self-join (pair mining, co-session analysis) to learn
    * whether it will explode and which keys own the blast radius: per
    * `user_id`, the self-join contribution is n², so the report carries
    * total output cardinality (Σn², DECIMAL(38,0) accumulated — a 100 TB
    * hot key squares past BIGINT) and the top-`k` keys with their exact
    * integer ppm share. Reading it decides the mitigation: a few dominant
    * keys → salt them ([[VariantOps.saltedEventAgg]]'s recipe); a flat
    * tail → cap or sample per key. One map-side-combinable count + a
    * top-k window over |keys| rows — the diagnostic never runs the join
    * it predicts.
    */
  /** RFM segmentation: every user scored 1..5 on Recency (days behind the
    * log edge), Frequency (event count), and Monetary (exact cents), with
    * quintile boundaries as EXACT discrete value-at-rank selections and
    * the output the ≤125-cell segment matrix (counts + exact cents totals)
    * — the classic warehouse behavioral segmentation. Each metric's four
    * boundaries come from one [[DistributedSelect.exactGroupPercentiles]]
    * pass over the memoized users frame (histogram split — users are one
    * huge group, precisely the case the split exists for); bucket
    * assignment is `1 + Σ (value > q_k)` — pure integer comparisons
    * against the broadcast 1-row boundary frame, deterministic under ties
    * because the value AT a rank is tie-order-independent. The oracle
    * replays the naive whole-frame rank windows.
    */
  def rfmSegments(spark: SparkSession, d: String): DataFrame =
    rfmOfUsers(Memo(spark, s"rfm_users|$d") {
      withRecency(Tables.events(spark, d)
        .select(col("user_id"), Sessions.dayIdx(spark, d).as("day"),
          Exact.c2(col("value")).as("c2"))
        .groupBy(col("user_id"))
        .agg(max(col("day")).as("last_day"), count(lit(1)).as("freq"),
          Exact.sumLong(col("c2")).as("mon_c2"))).persist()
    })

  /** Recency against the frame's own right edge (broadcast one-row max),
    * plus the single-group tag the percentile split needs.
    */
  private def withRecency(spans: DataFrame): DataFrame =
    spans
      .crossJoin(broadcast(spans.agg(max(col("last_day")).as("max_day"))))
      .select(col("user_id"), (col("max_day") - col("last_day")).as("rec_days"),
        col("freq"), col("mon_c2"))
      .withColumn("g", lit("all"))

  /** [[AnnStore]] kind for the persisted per-user activity summary
    * `(user_id, last_day, freq, mon_c2)` — the behavioral-segmentation
    * ladder's shared artifact ([[incrementalRfmSegments]] and
    * [[incrementalConcentration]] both ride it).
    */
  private[graft] val UserActKind = "evuseract-v1"

  /** The merged per-user activity summary: persisted history ⊕ arriving
    * batch, merged by (max, +, +) — all exactly mergeable, and the log
    * edge (hence every recency) re-derives from the merged spans.
    */
  private def mergedUserActivity(spark: SparkSession, d: String,
      batchMod: Int): DataFrame = {
    val ev = Tables.events(spark, d)
      .select(col("event_id"), col("user_id"),
        Sessions.dayIdx(spark, d).as("day"), Exact.c2(col("value")).as("c2"))
    val isNew = pmod(col("event_id"), lit(batchMod)) === 0
    val oldAct = Memo(spark, s"ev_useract_old|$d|$batchMod") {
      AnnStore.loadOrBuild(spark,
        AnnStore.path(spark, UserActKind, d, s"x$batchMod", corpusTable = "events")) {
        ev.filter(!isNew).groupBy(col("user_id"))
          .agg(max(col("day")).as("ld_old"), count(lit(1)).as("f_old"),
            Exact.sumLong(col("c2")).as("m_old"))
      }.persist()
    }
    val newAct = ev.filter(isNew).groupBy(col("user_id"))
      .agg(max(col("day")).as("ld_new"), count(lit(1)).as("f_new"),
        Exact.sumLong(col("c2")).as("m_new"))
    oldAct.join(newAct, Seq("user_id"), "full_outer")
      .select(col("user_id"),
        greatest(col("ld_old"), col("ld_new")).as("last_day"),
        (coalesce(col("f_old"), lit(0L)) + coalesce(col("f_new"), lit(0L))).as("freq"),
        (coalesce(col("m_old"), lit(0L)) + coalesce(col("m_new"), lit(0L))).as("mon_c2"))
  }

  /** RFM under log growth — the incremental rung on the shared per-user
    * activity store; pinned to the batch [[rfmSegments]] oracle verbatim
    * (quintile boundaries re-derive from the merged users frame).
    */
  def incrementalRfmSegments(spark: SparkSession, d: String,
      batchMod: Int = 10): DataFrame =
    rfmOfUsers(Memo(spark, s"rfm_users_inc|$d|$batchMod") {
      withRecency(mergedUserActivity(spark, d, batchMod)).persist()
    })

  /** Concentration under log growth — same store, counts column only. */
  def incrementalConcentration(spark: SparkSession, d: String,
      batchMod: Int = 10): DataFrame =
    concentrationOfCounts(Memo(spark, s"conc_users_inc|$d|$batchMod") {
      mergedUserActivity(spark, d, batchMod)
        .select(col("user_id"), col("freq").as("n_events"))
        .withColumn("g", lit("all"))
        .persist()
    })

  /** The segmentation tail over a persisted `(user_id, rec_days, freq,
    * mon_c2, g)` users frame — shared by the batch and incremental forms.
    */
  private def rfmOfUsers(users: DataFrame): DataFrame = {
    // ONE multi-metric split (2 actions total) instead of three independent
    // exactGroupPercentiles calls (6): the three metrics share the min/max
    // head and the stacked histogram collect — r18 verdict item 4; values
    // bit-identical, so the oracle pins the change
    val bounds = broadcast(DistributedSelect.exactGroupPercentilesMulti(
      users, "g",
      Seq("rec_days", "freq", "mon_c2").map(metric =>
        metric -> (1 to 4).map(k => (s"${metric}_q$k", k.toLong, 5L))))
      .drop("g", "n_rows"))
    def bucket(metric: String): Column =
      (1 to 4).foldLeft(lit(1L)) { (acc, k) =>
        acc + when(col(metric) > col(s"${metric}_q$k"), 1L).otherwise(0L)
      }
    users.crossJoin(bounds)
      .select(col("user_id"), col("mon_c2"),
        bucket("rec_days").as("r_bucket"), bucket("freq").as("f_bucket"),
        bucket("mon_c2").as("m_bucket"))
      .groupBy(col("r_bucket"), col("f_bucket"), col("m_bucket"))
      .agg(count(lit(1)).as("n_users"),
        Exact.sumLong(col("mon_c2")).as("total_value_c2"))
      .orderBy("r_bucket", "f_bucket", "m_bucket")
  }

  /** Activity concentration: what share of all events comes from users
    * above the p90 / p99 per-user activity thresholds — the "how heavy is
    * the head" readout that decides skew mitigation (and, for a training
    * corpus, source-domination caps) WITHOUT a global user sort. The
    * thresholds are exact value-at-rank selections over the per-user
    * counts ([[DistributedSelect.exactGroupPercentiles]] — one huge
    * group, the histogram split's home case; a Gini coefficient would
    * need a global rank of every user, i.e. a single-task sort at 100 TB,
    * and is deliberately NOT offered); the conditional sums are one more
    * pass with the 1-row thresholds broadcast. Strict `>` keeps ties
    * deterministic on both engines.
    */
  def userConcentration(spark: SparkSession, d: String): DataFrame =
    concentrationOfCounts(Memo(spark, s"conc_users|$d") {
      Tables.events(spark, d)
        .groupBy(col("user_id")).agg(count(lit(1)).as("n_events"))
        .withColumn("g", lit("all"))
        .persist()
    })

  /** The concentration tail over a persisted `(user_id, n_events, g)`
    * counts frame — shared by the batch and incremental forms.
    */
  private def concentrationOfCounts(counts: DataFrame): DataFrame = {
    val qs = DistributedSelect.exactGroupPercentiles(counts, "g", "n_events",
      Seq(("q90", 9L, 10L), ("q99", 99L, 100L)))
      .select(col("q90"), col("q99"))
    val agg = counts.crossJoin(broadcast(qs))
      .agg(
        count(lit(1)).as("n_users"),
        Exact.sumLong(col("n_events")).as("total_events"),
        Exact.sumLong(when(col("n_events") > col("q90"), 1L).otherwise(0L)).as("u90"),
        Exact.sumLong(when(col("n_events") > col("q90"), col("n_events")).otherwise(0L)).as("e90"),
        Exact.sumLong(when(col("n_events") > col("q99"), 1L).otherwise(0L)).as("u99"),
        Exact.sumLong(when(col("n_events") > col("q99"), col("n_events")).otherwise(0L)).as("e99"),
        max(col("q90")).as("t90"), max(col("q99")).as("t99"))
    Seq(("p90", "t90", "u90", "e90"), ("p99", "t99", "u99", "e99"))
      .map { case (label, t, u, e) =>
        agg.select(lit(label).as("pct"), col(t).as("threshold_events"),
          col(u).as("users_above"), col(e).as("events_above"),
          // numerator widened to DECIMAL(38,0) before the 1e6 scale-up
          // (the join_explosion_check convention): event counts above
          // ~9.2e12 would overflow a BIGINT multiply — DuckDB errors,
          // non-ANSI Spark wraps silently. `div` exports BIGINT.
          expr(s"(CAST($e AS DECIMAL(38,0)) * 1000000) div total_events")
            .as("share_ppm"))
      }
      .reduce(_ unionByName _)
      .orderBy("pct")
  }

  def joinExplosionCheck(spark: SparkSession, d: String, k: Int = 10): DataFrame = {
    val dec = DecimalType(38, 0)
    val cnt = Tables.events(spark, d)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .withColumn("pairs", col("n") * col("n"))
    val total = cnt.agg(sum(col("pairs").cast(dec)).as("total_pairs"))
    val w = Window.orderBy(desc("pairs"), asc("user_id"))
    cnt.crossJoin(broadcast(total))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("rank"), col("user_id"), col("n"), col("pairs"),
        // integral `div`, not decimal `/`: decimal division ROUNDS to the
        // result scale before any cast, which can disagree with DuckDB's
        // floor `//` at share boundaries
        expr("(CAST(pairs AS DECIMAL(38,0)) * 1000000) div total_pairs")
          .as("share_ppm"),
        col("total_pairs").cast("long").as("total_pairs"))
      .orderBy("rank")
  }
}
