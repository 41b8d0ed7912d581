package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** [[TopKRank]] must reproduce the rank-window form it replaced EXACTLY:
  * `dense_rank() OVER (PARTITION BY qid ORDER BY sim DESC, cid ASC) <= k`
  * over candidate rows whose duplicate occurrences carry bit-identical
  * (sim, cid) — the shape of every ANN probe's top-k tail. The property
  * check drives randomized candidate sets (duplicates included) through
  * both forms; directed cases pin the tie, NaN, -0.0, fewer-than-k and
  * merge/serialize paths.
  */
class TopKAggSpec extends SparkSuite {
  import org.apache.spark.sql.DataFrame

  private def windowForm(cands: DataFrame, k: Int): Set[(Long, Long, Long, Long)] = {
    val w = Window.partitionBy(col("qid")).orderBy(desc("sim"), asc("cid"))
    cands
      .withColumn("rank", dense_rank().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("cid"), round(col("sim"), 6).as("sim"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        java.lang.Double.doubleToLongBits(r.getDouble(3))))
      .toSet
  }

  private def aggForm(cands: DataFrame, k: Int): Set[(Long, Long, Long, Long)] = {
    cands.groupBy(col("qid"))
      .agg(TopKAgg.topkRank(spark, col("sim"), col("cid"), k).as("tk"))
      .select(col("qid"), explode(col("tk")).as("t"))
      .select(col("qid"), col("t.rank"), col("t.cid"), round(col("t.sim"), 6).as("sim"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        java.lang.Double.doubleToLongBits(r.getDouble(3))))
      .toSet
  }

  test("randomized parity with the dense_rank window (duplicates included)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    (1 to 5).foreach { round =>
      val rows = (1 to 400).flatMap { _ =>
        val qid = rnd.nextInt(8).toLong
        val cid = rnd.nextInt(40).toLong
        val sim = math.rint(rnd.nextDouble() * 20) / 20.0 // force sim ties
        // duplicate occurrences of the same pair carry IDENTICAL sims —
        // the lshCoocSims invariant the dedup semantics rest on
        Seq.fill(1 + rnd.nextInt(3))((qid, cid, sim))
      }
      val df = rows.toDF("qid", "cid", "sim")
      (1 to 7 by 3).foreach { k =>
        assert(aggForm(df, k) == windowForm(df, k), s"round $round k=$k")
      }
    }
  }

  test("NaN ranks first, -0.0 ties 0.0, fewer than k survives, empty group drops") {
    import spark.implicits._
    val df = Seq(
      (1L, 10L, Double.NaN), (1L, 11L, 2.0), (1L, 12L, 2.0), (1L, 13L, -0.0),
      (2L, 20L, 0.5)).toDF("qid", "cid", "sim")
    assert(aggForm(df, 3) == windowForm(df, 3))
    // -0.0 vs 0.0: the nan-safe comparator treats them EQUAL, so cid breaks
    // the tie exactly as the window's ordering did
    val z = Seq((1L, 5L, 0.0), (1L, 3L, -0.0)).toDF("qid", "cid", "sim")
    assert(aggForm(z, 2) == windowForm(z, 2))
  }

  test("buffer semantics: dedup, bounded size, merge, serialize round-trip") {
    val b = new TopKBuf(3)
    b.insert(1.0, 7L); b.insert(1.0, 7L) // exact duplicate collapses
    assert(b.n == 1)
    b.insert(2.0, 1L); b.insert(0.5, 9L); b.insert(0.75, 2L) // 0.5 evicted
    assert(b.n == 3 && b.cids.toSeq == Seq(1L, 7L, 2L))
    val o = new TopKBuf(3)
    o.insert(3.0, 4L); o.insert(0.1, 5L)
    b.mergeFrom(o)
    assert(b.cids.take(b.n).toSeq == Seq(4L, 1L, 7L))
    val agg = TopKRank(
      org.apache.spark.sql.graftx.Bridge.expression(lit(0.0)),
      org.apache.spark.sql.graftx.Bridge.expression(lit(0L)), 3)
    val rt = agg.deserialize(agg.serialize(b))
    assert(rt.n == b.n && rt.cids.toSeq == b.cids.toSeq && rt.sims.toSeq == b.sims.toSeq)
  }
}
