package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Semantic invariants for the TpchFull shapes (Q7/9/12/14/15/16/20/22).
  * The DuckDB oracle gate does the value-level matching at sf0.01; these
  * check CROSS-query consistency and the guarantees the hash can't see
  * (partition of counts, max-equality, anti-join emptiness).
  */
class TpchFullSpec extends SparkSuite {

  test("q7: only the two configured nations appear, never self-flow") {
    // sf0.001 is small enough that an arbitrary nation pair may have zero
    // cross-flow — pick a pair that provably flows so the assertions bite
    val flow = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(spark, sf), col("l_suppkey") === col("s_suppkey"))
      .filter(col("s_nationkey") =!= col("c_nationkey"))
      .select(col("s_nationkey"), col("c_nationkey")).limit(1).collect().head
    val names = Tables.nation(spark, sf).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    val (na, nb) = (names(flow.getInt(0)), names(flow.getInt(1)))
    val rows = TpchFull.volumeShipping(spark, sf, na, nb).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val sn = r.getString(r.fieldIndex("supp_nation"))
      val cn = r.getString(r.fieldIndex("cust_nation"))
      assert(Set(na, nb)(sn) && Set(na, nb)(cn))
      assert(sn != cn, "a nation-pair query must not report self-flow")
    }
  }

  test("q12: high+low partition the late-window join rows exactly") {
    val rows = TpchFull.shipmodePriority(spark, sf).collect()
    assert(rows.nonEmpty)
    val counted = rows.map(r => r.getLong(r.fieldIndex("high_line_count")) +
      r.getLong(r.fieldIndex("low_line_count"))).sum
    val joined = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS") &&
        col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 120 DAYS"))
      .count()
    assert(counted == joined, s"CASE-sum partition $counted != join rows $joined")
  }

  test("q14: share is the floor e4 ratio and promo bounded by total") {
    val r = TpchFull.promoShare(spark, sf).collect().head
    val promo = r.getLong(r.fieldIndex("promo_rev_e6"))
    val total = r.getLong(r.fieldIndex("total_rev_e6"))
    val share = r.getLong(r.fieldIndex("promo_share_e4"))
    assert(promo >= 0 && promo <= total)
    assert(share == (BigInt(promo) * 10000 / BigInt(total)).toLong)
  }

  test("q15: every returned supplier carries the global max revenue") {
    val rows = TpchFull.topSupplier(spark, sf).collect()
    assert(rows.nonEmpty)
    val revs = rows.map(_.getLong(rows.head.fieldIndex("total_rev_e6"))).toSet
    assert(revs.size == 1, "all max-revenue rows must tie at the same value")
  }

  test("q22: returned country codes only contain order-less customers") {
    // recompute the anti-join side independently: customers WITH orders must
    // contribute nothing to any reported cntrycode bucket count
    val reported = TpchFull.globalBalance(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(r.fieldIndex("numcust"))).toMap
    val antiCnt = Tables.customer(spark, sf)
      .join(Tables.orders(spark, sf)
        .filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .count()
    assert(reported.values.sum <= antiCnt,
      "reported customers exceed the urgent-order-less population")
  }

  test("q16/q20/q9 produce rows with sane bounds at sf0.001") {
    val q16 = TpchFull.partSupplierCount(spark, sf).collect()
    val nSupp = Tables.supplier(spark, sf).count()
    assert(q16.nonEmpty)
    q16.foreach(r => assert(r.getLong(r.fieldIndex("supplier_cnt")) <= nSupp))
    val q20 = TpchFull.excessSupplier(spark, sf).collect()
    q20.foreach(r => assert(r.getLong(0) >= 0 && r.getLong(0) < nSupp))
    val q9 = TpchFull.productProfit(spark, sf).collect()
    assert(q9.nonEmpty)
    q9.foreach(r => assert(r.getLong(r.fieldIndex("sum_profit_e6")) >= 0))
  }
}
