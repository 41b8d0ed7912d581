package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

class IncrementalSpec extends SparkSuite {

  test("mvIncrementalApply equals a from-scratch recompute and drops fully-retracted groups") {
    val merged = Incremental.mvIncrementalApply(spark, sf)
    val direct = Tables.orders(spark, sf)
      .filter(col("o_orderdate") >= to_timestamp(lit("1999-01-01")) ||
        col("o_orderstatus") =!= "F")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        Exact.sumLong(Exact.c2(col("o_totalprice"))).as("total_c2"))
      .orderBy("o_custkey")
    assert(merged.collect().toSeq == direct.collect().toSeq)
    // the delta batch genuinely retracts something
    val retracted = Tables.orders(spark, sf)
      .filter(col("o_orderdate") < to_timestamp(lit("1999-01-01")) &&
        col("o_orderstatus") === "F").count()
    assert(retracted > 0)
  }

  test("mvJoinDelta: the IVM algebra equals a from-scratch join on the post-delta state") {
    val delta = Incremental.mvJoinDelta(spark, sf).collect().toSeq
    // independent recompute: join the post-delta state directly
    val ord = Tables.orders(spark, sf)
    val scratch = ord
      .filter(col("o_orderdate") >= to_timestamp(lit("1999-01-01")) ||
        col("o_orderstatus") =!= "F")
      .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_rows"),
        Exact.sumLong(Exact.c2(col("o_totalprice"))).as("revenue_c2"))
      .orderBy("c_mktsegment")
      .collect().toSeq
    assert(delta.nonEmpty && delta == scratch)
    // the retraction term is load-bearing: dropping it must change counts
    val total = delta.map(_.getLong(1)).sum
    val unretracted = ord
      .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey")).count()
    assert(total < unretracted, "retractions did not cancel anything")
  }

  test("bloomPrunedSemiJoin equals the unpruned plan and the bloom actually prunes") {
    val prunedDf = Incremental.bloomPrunedSemiJoin(spark, sf)
    // the probe is the native BloomFilterMightContain expression, not a
    // boxed Scala UDF — pin it so a refactor can't silently reintroduce one
    val planStr = prunedDf.queryExecution.executedPlan.toString
    assert(planStr.contains("might_contain"), s"bloom probe missing from plan:\n$planStr")
    assert(!planStr.contains("UDF"), s"boxed UDF reappeared in bloom plan:\n$planStr")
    val pruned = prunedDf.collect().toSeq
    val plain = Incremental.plainSemiJoin(spark, sf).collect().toSeq
    assert(pruned == plain)
    assert(pruned.nonEmpty)
    // probe-side reduction: the bloom passes far fewer rows than the scan
    val urgent = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
    val bloom = urgent.stat.bloomFilter("o_orderkey", 1000000L, 0.01)
    val mc = udf((k: Long) => bloom.mightContain(k))
    val li = Tables.lineitem(spark, sf)
    val passed = li.filter(mc(col("l_orderkey"))).count()
    val total = li.count()
    val exact = li.join(urgent, li("l_orderkey") === urgent("o_orderkey"), "left_semi").count()
    assert(passed < total)
    assert(passed >= exact) // bloom admits all true members (no false negatives)
  }

  test("bloom sizing is derived from the build side's cardinality, not a constant") {
    val n = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT").count()
    val sized = Incremental.bloomExpectedItems(spark, sf)
    // tracks the measured count with ×1.25 headroom, floored at 4096 so tiny
    // builds don't get degenerate sketches — at sf0.001 the floor governs,
    // at scale the count does; either way the design point moves with data
    assert(sized == math.max(4096L, n + n / 4))
    assert(sized >= n, "sketch sized below the build cardinality")
    // a 100×-bigger hypothetical build must get a bigger sketch than the
    // floor would give — i.e. the formula is genuinely cardinality-driven
    val big = 100L * 4096L
    assert(math.max(4096L, big + big / 4) > sized)
  }

  test("incrementalDedup: every batch doc gets a verdict matching a brute-force probe") {
    import spark.implicits._
    val out = Incremental.incrementalDedup(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .as[(Long, String)].collect()
    val newIds = docs.map(_._1).filter(_ % 10 == 0).toSet
    assert(out.keySet == newIds && newIds.nonEmpty)
    // brute-force reference: driver-side shingle sets, maxDf cap among OLD
    // docs only, best match by (j_e6 desc, old_id asc)
    val shs = docs.map { case (id, t) => id -> Dedup.shingleHashes(t, 5).toSet }.toMap
    val oldIds = docs.map(_._1).filterNot(newIds).toSet
    val df = oldIds.toSeq.flatMap(id => shs(id)).groupBy(identity).map { case (s, o) => s -> o.size }
    val hot = df.filter(_._2 > 256).keySet
    newIds.foreach { nid =>
      val nsh = shs(nid)
      val cands = oldIds.toSeq.flatMap { oid =>
        val common = shs(oid).filterNot(hot).count(nsh)
        if (common == 0) None
        else Some((oid, common.toLong * 1000000L / (nsh.size + shs(oid).size - common)))
      }
      val want =
        if (cands.isEmpty) (-1L, 0L, 0L)
        else {
          val (oid, j) = cands.minBy { case (o, j) => (-j, o) }
          (oid, j, if (j >= 500000L) 1L else 0L)
        }
      assert(out(nid) == want, s"doc $nid: got ${out(nid)} want $want")
    }
    // the verdict genuinely fires on this corpus (near-dups exist)
    assert(out.values.exists(_._3 == 1L), "no duplicate detected — vacuous batch")
  }
}
