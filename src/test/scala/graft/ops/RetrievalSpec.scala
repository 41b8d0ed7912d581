package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Pins the RRF fusion algebra (hand-computed golden on tiny lists,
  * including the single-list NULL-rank cases), the internal consistency of
  * the oracled operator on live data, and the fusion core's list-agnosticism
  * that justifies the rows-only ANN form.
  */
class RetrievalSpec extends SparkSuite {

  test("fuse: hand-computed golden, incl. single-list candidates") {
    val s = spark
    import s.implicits._
    // qid 1: cid 11 in BOTH lists, cid 10 sem-only, cid 12 lex-only
    val sem = Seq((1L, 10L, 1L), (1L, 11L, 2L)).toDF("qid", "cid", "sem_rank")
    val lex = Seq((1L, 11L, 1L), (1L, 12L, 2L)).toDF("qid", "cid", "lex_rank")
    val out = Retrieval.fuse(sem, lex, k = 3, rrfK = 60).collect()
    // 1e9 div 61 = 16393442, 1e9 div 62 = 16129032
    val both = 16129032L + 16393442L
    assert(out.toSeq === Seq(
      Row(1L, 1L, 11L, both, 2L, 1L),
      Row(1L, 2L, 10L, 16393442L, 1L, null),
      Row(1L, 3L, 12L, 16129032L, null, 2L)))
  }

  test("rrf_fusion: rank contract and score consistency on live data") {
    val df = Retrieval.rrfFusion(spark, sf).persist()
    try {
      val n = df.count()
      assert(n > 0, "fusion returned no rows")
      // ranks are 1..k, unique per qid
      val badRank = df.groupBy("qid")
        .agg(count(lit(1)).as("n"), countDistinct(col("rank")).as("nd"),
          max(col("rank")).as("mx"))
        .filter(col("n") =!= col("nd") || col("mx") > 5)
        .count()
      assert(badRank === 0)
      // every candidate is in at least one list, and the exported score is
      // exactly the integer RRF of the exported ranks
      val bad = df.filter(col("sem_rank").isNull && col("lex_rank").isNull)
        .count()
      assert(bad === 0)
      val inconsistent = df.withColumn("expect",
        coalesce(expr("1000000000 div (60 + sem_rank)"), lit(0L)) +
          coalesce(expr("1000000000 div (60 + lex_rank)"), lit(0L)))
        .filter(col("expect") =!= col("rrf_score")).count()
      assert(inconsistent === 0)
      // deterministic: a fresh evaluation is row-identical
      assert(Retrieval.rrfFusion(spark, sf).collect().toSeq
        === df.orderBy("qid", "rank").collect().toSeq)
    } finally { df.unpersist(); () }
  }

  test("mmr_rerank: equals an independent driver-side greedy, and diversifies") {
    val out = Retrieval.mmrRerank(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    // independent quadratic greedy from the same inputs
    val cand = Retrieval.semanticTopK(spark, sf, 20, 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))) // qid, cid, rel
    val embRows = Tables.embeddings(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cosE6(a: Array[Float], b: Array[Float]): Long = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1 }
      math.floor(dot / (math.sqrt(na) * math.sqrt(nb)) * 1e6).toLong
    }
    val expected = cand.groupBy(_._1).toSeq.flatMap { case (qid, cs) =>
      val rel = cs.map(c => c._2 -> c._3).toMap
      var remaining = cs.map(_._2).sorted.toVector
      var selected = Vector.empty[Long]
      (1 to 10).flatMap { step =>
        if (remaining.isEmpty) None
        else {
          val scored = remaining.map { cid =>
            val sc =
              if (selected.isEmpty) 7L * rel(cid)
              else 7L * rel(cid) - 3L * selected.map(s => cosE6(embRows(cid), embRows(s))).max
            (cid, sc)
          }
          val (bestCid, bestSc) = scored.maxBy { case (cid, sc) => (sc, -cid) }
          selected :+= bestCid
          remaining = remaining.filterNot(_ == bestCid)
          Some((qid, step.toLong, bestCid, bestSc))
        }
      }
    }.sortBy(t => (t._1, t._2))
    assert(out.toSeq == expected,
      s"greedy divergence, first diff: ${out.zip(expected).find(p => p._1 != p._2)}")
    // the rerank genuinely diversifies on this corpus: mean pairwise sim of
    // the MMR selection never exceeds that of the plain top-k-by-rel prefix
    val byQ = out.groupBy(_._1)
    val topk = cand.groupBy(_._1).view.mapValues(
      _.sortBy(c => (-c._3, c._2)).take(10).map(_._2)).toMap
    def meanPairSim(ids: Seq[Long]): Double = {
      val ps = for { a <- ids; b <- ids if a < b } yield cosE6(embRows(a), embRows(b)).toDouble
      if (ps.isEmpty) 0.0 else ps.sum / ps.size
    }
    byQ.foreach { case (qid, rows) =>
      assert(meanPairSim(rows.map(_._3).toSeq) <= meanPairSim(topk(qid).toSeq) + 1e-9,
        s"qid $qid: MMR selection is LESS diverse than plain top-k")
    }
  }

  test("mmr_rerank_ann: same greedy core over the ANN list, high panel agreement") {
    val exact = Retrieval.mmrRerank(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val ann = Retrieval.mmrRerankAnn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(ann.nonEmpty)
    val byQ = ann.groupBy(_._1)
    // contract: same panel, k selections with contiguous ranks, no repeats
    assert(byQ.keySet == exact.keySet)
    byQ.foreach { case (qid, rows) =>
      val ranks = rows.map(_._2).sorted.toSeq
      assert(ranks == (1L to ranks.length).toSeq, s"qid $qid ranks: $ranks")
      assert(rows.map(_._3).distinct.length == rows.length)
    }
    // the approximate candidate list preserves most of the exact selection
    val agree = byQ.toSeq.map { case (qid, rows) =>
      rows.map(_._3).count(exact(qid)) .toDouble / rows.length
    }
    assert(agree.sum / agree.size >= 0.7,
      s"panel agreement ${agree.sum / agree.size} below 0.7")
  }

  test("rrf_fusion_ann: same fusion over the ANN list, high panel agreement") {
    val exact = Retrieval.rrfFusion(spark, sf)
      .select("qid", "rank", "cid").collect().toSet
    val ann = Retrieval.rrfFusionAnn(spark, sf)
      .select("qid", "rank", "cid").collect().toSet
    assert(ann.nonEmpty)
    // the fusion stage adds no approximation, so disagreement can come only
    // from ANN-vs-exact semantic list divergence in the deep tail (rank
    // 6..20 of a 20-deep list); at test scale the fused top-5 rows agree on
    // the overwhelming majority of the panel
    val inter = (exact & ann).size.toDouble
    assert(inter / exact.size >= 0.8,
      s"fused agreement ${inter / exact.size} below floor (exact=${exact.size}, ann=${ann.size})")
  }
}
