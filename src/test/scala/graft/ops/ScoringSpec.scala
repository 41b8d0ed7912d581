package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

class ScoringSpec extends SparkSuite {

  test("unigramLogprob: every doc scored; scores recompute from a driver-side LM") {
    import spark.implicits._
    val out = Scoring.unigramLogprob(spark, sf).collect()
    val texts = Tables.documents(spark, sf).select("doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(out.length == texts.size, "every document gets a score")
    // independent LM: token counts over the same split(trim(lower)) stream
    def toks(t: String): Array[String] = t.toLowerCase.trim.split(" ", -1)
    val all = texts.values.flatMap(toks).toSeq
    val total = all.size.toDouble
    val lp = all.groupBy(identity).map { case (tok, xs) =>
      tok -> math.floor(math.log(xs.size / total) * 1e6).toLong
    }
    out.take(25).foreach { r =>
      val ts = toks(texts(r.getLong(0)))
      assert(r.getLong(1) == ts.length.toLong)
      val sum = ts.map(lp).sum
      assert(r.getLong(2) == sum, s"doc ${r.getLong(0)}: ${r.getLong(2)} != $sum")
    }
    // scores are negative log-probs: a well-formed LM never scores positive
    assert(out.forall(_.getLong(2) < 0L))
  }

  test("bm25Scores: covers exactly the docs containing a query term, one known score checks out") {
    val terms = Seq("spark", "stream", "window")
    val out = Scoring.bm25Scores(spark, sf, terms).collect()
    val expectedDocs = Tables.documents(spark, sf)
      .filter(terms.map(t => lower(col("text")).contains(t)).reduce(_ || _))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out.map(_.getLong(0)).toSet == expectedDocs)
    assert(out.nonEmpty)

    // independent scalar recompute of one doc's score
    val docsRows = Tables.documents(spark, sf)
      .select(col("doc_id"), lower(col("text")).as("t"), col("n_chars")).collect()
    val nDocs = docsRows.length.toDouble
    val avgdl = docsRows.map(_.getLong(2)).sum.toDouble / nDocs
    def tf(t: String, term: String): Int = {
      var i = 0; var n = 0
      while ({ i = t.indexOf(term, i); i >= 0 }) { n += 1; i += term.length }
      n
    }
    val dfs = terms.map(term => term -> docsRows.count(r => tf(r.getString(1), term) > 0)).toMap
    val sample = docsRows.find(r => terms.exists(t => tf(r.getString(1), t) > 0)).get
    val expected = terms.map { term =>
      val f = tf(sample.getString(1), term)
      if (f == 0) 0.0
      else {
        val df = dfs(term).toDouble
        val idf = math.log((nDocs - df + 0.5) / (df + 0.5) + 1.0)
        idf * (f * 2.2) / (f + 1.2 * (0.25 + 0.75 * sample.getLong(2) / avgdl))
      }
    }.sum
    val got = out.find(_.getLong(0) == sample.getLong(0)).get.getLong(1)
    assert(math.abs(got - math.floor(expected * 1e6)) <= 1,
      s"doc ${sample.getLong(0)}: got $got expected ~${math.floor(expected * 1e6)}")
  }

  test("incrementalBm25: merged-stats scoring equals the batch form on the new slice") {
    // the load-bearing property: stats merged from disjoint slice aggregates
    // are EXACTLY the scratch full-corpus stats, so the arriving batch's
    // scores are bit-identical to what a full rescore would assign it
    val full = Scoring.bm25Scores(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val inc = Scoring.incrementalBm25(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(inc.nonEmpty)
    assert(inc.keySet.forall(_ % 10 == 0), "incremental form scored old-slice docs")
    assert(inc.keySet == full.keySet.filter(_ % 10 == 0),
      "batch coverage differs from the batch form's new-slice rows")
    val diff = inc.collect { case (k, v) if full(k) != v => (k, v, full(k)) }
    assert(diff.isEmpty, s"scores drifted from the batch form: ${diff.take(5)}")
  }

  test("editDistPairs: non-ASCII prefixes are excluded on both sides (oracle parity guard)") {
    // DuckDB levenshtein counts bytes, Spark counts characters; the operator
    // filters non-ASCII prefixes so the two can never diverge. Pin it.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("editdist_ascii").toString
    Seq(
      (1L, "café au lait plus padding text here", "fr", "a", 35L),
      (2L, "cafe au lait plus padding text here", "fr", "a", 35L),
      (3L, "cafe au lait plus padding text herX", "fr", "a", 35L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = Scoring.editDistPairs(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // doc 1 (non-ASCII) is excluded; 2-3 pair up with dist 1
    assert(got == Set((2L, 3L)))
  }

  test("editDistPairs: bounded, ordered, and equal to an unbanded brute-force recompute") {
    val out = Scoring.editDistPairs(spark, sf).collect()
    assert(out.forall(r => r.getLong(0) < r.getLong(1) && r.getLong(2) >= 0 && r.getLong(2) <= 12))
    // recompute the full pair set by brute force (all blocks; sf0.001 is
    // tiny), re-deriving the corpus-dependent block width the operator uses
    val st = Tables.documents(spark, sf)
      .agg(count(lit(1)), min("n_chars"), max("n_chars"), countDistinct("lang"))
      .head()
    val w = math.max(1L, math.min(32L,
      (st.getLong(2) - st.getLong(1) + 1) * st.getLong(3) * 16 / st.getLong(0)))
    assert(out.forall(_.getLong(3) == w), "exported bucket_w disagrees with the formula")
    val blocked = Tables.documents(spark, sf).select(
      col("doc_id"), col("lang"), expr(s"n_chars div $w").as("bk"),
      substring(lower(col("text")), 1, 60).as("s")).collect()
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1)(i => i)
      for (j <- 1 to b.length) {
        var prev = dp(0); dp(0) = j
        for (i <- 1 to a.length) {
          val cur = dp(i)
          dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = cur
        }
      }
      dp(a.length)
    }
    val want = (for {
      block <- blocked.groupBy(r => (r.getString(1), r.getLong(2))).values.toSeq
      x <- block.toSeq; y <- block.toSeq if x.getLong(0) < y.getLong(0)
      d = lev(x.getString(3), y.getString(3)) if d <= 12
    } yield (x.getLong(0), y.getLong(0), d.toLong)).toSet
    val got = out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
  }

  test("incrementalDivergence: merged counts reproduce the full-corpus divergence exactly") {
    val full = Scoring.sourceDivergence(spark, sf).collect().toSeq
    val inc = Scoring.incrementalDivergence(spark, sf).collect().toSeq
    assert(inc == full)
    assert(full.nonEmpty)
  }

  test("bigramLogprob: exact driver recompute of the conditional LM") {
    import spark.implicits._
    val out = Scoring.bigramLogprob(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val texts = Tables.documents(spark, sf).select("doc_id", "text")
      .as[(Long, String)].collect()
    val inst = texts.flatMap { case (id, t) =>
      val w = t.toLowerCase.trim.split(" ", -1)
      w.zip(w.drop(1)).map { case (a, b) => (id, (a, b)) }
    }
    val cb = inst.groupBy(_._2).map { case (k, v) => (k, v.length.toLong) }
    val ctx = cb.groupBy(_._1._1).map { case (w1, m) => (w1, m.values.sum) }
    def lp(p: (String, String)): Long =
      math.floor(math.log(cb(p).toDouble / ctx(p._1)) * 1000000.0).toLong
    val want = inst.groupBy(_._1).map { case (id, rs) =>
      (id, (rs.length.toLong, rs.map(r => lp(r._2)).sum))
    }
    assert(out == want)
    // conditional probabilities sum to 1 per context (MLE sanity)
    ctx.keys.take(50).foreach { w1 =>
      val s = cb.collect { case ((a, _), c) if a == w1 => c.toDouble / ctx(w1) }.sum
      assert(math.abs(s - 1.0) < 1e-9)
    }
  }

  test("sourceDivergence: exact driver recompute; true KL non-negative per source") {
    import spark.implicits._
    val out = Scoring.sourceDivergence(spark, sf).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val toks = Tables.documents(spark, sf).select("source", "text")
      .as[(String, String)].collect()
      .flatMap { case (src, t) => t.toLowerCase.trim.split(" ", -1).map((src, _)) }
    val st = toks.groupBy(identity).map { case (k, v) => (k, v.length.toLong) }
    val ns = st.groupBy(_._1._1).map { case (s, m) => (s, m.values.sum) }
    val ctM = st.groupBy(_._1._2).map { case (tk, m) => (tk, m.values.sum) }
    val n = ctM.values.sum
    def lp(c: Long, t: Long): Long =
      math.floor(math.log(c.toDouble / t) * 1000000.0).toLong
    val want = st.toSeq.groupBy(_._1._1).map { case (src, rows) =>
      val kl = rows.map { case ((_, tk), c) => c * (lp(c, ns(src)) - lp(ctM(tk), n)) }.sum
      val xe = rows.map { case ((_, tk), c) => -c * lp(ctM(tk), n) }.sum
      (src, (kl, xe, rows.map(_._2).sum, rows.size.toLong))
    }
    assert(out == want)
    // Gibbs' inequality on the TRUE (double) distributions, per source
    want.keys.foreach { src =>
      val klTrue = st.collect { case ((s, tk), c) if s == src =>
        val ps = c.toDouble / ns(src)
        ps * math.log(ps / (ctM(tk).toDouble / n))
      }.sum
      assert(klTrue >= -1e-9, s"true KL negative for $src: $klTrue")
    }
  }
}
