package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

class FrequentSpec extends SparkSuite {

  /** Driver-side reference: exact token counts via the same regex class. */
  private def driverCounts(): (Map[String, Long], Long) = {
    import spark.implicits._
    val texts = Tables.documents(spark, sf).select("text").as[String].collect()
    val re = java.util.regex.Pattern.compile("[A-Za-z0-9]+")
    val m = scala.collection.mutable.HashMap.empty[String, Long].withDefaultValue(0L)
    var total = 0L
    texts.foreach { t =>
      if (t != null) {
        val mm = re.matcher(t)
        while (mm.find()) { m(mm.group()) += 1L; total += 1L }
      }
    }
    (m.toMap, total)
  }

  test("frequentTokens: exact heavy hitters equal a driver-side recompute") {
    val (counts, total) = driverCounts()
    val want = counts.filter { case (_, c) => c * 200L > total }
    val got = Frequent.frequentTokens(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.nonEmpty, "no heavy hitters on this corpus — vacuous gate")
    assert(got.keySet == want.keySet,
      s"HH sets differ: extra=${got.keySet -- want.keySet} missing=${want.keySet -- got.keySet}")
    got.foreach { case (w, (cnt, nTot)) =>
      assert(cnt == want(w) && nTot == total, s"$w: ($cnt, $nTot) vs (${want(w)}, $total)")
    }
  }

  test("frequentTokensApprox: MG containment (no false negatives) + deficit bound per word") {
    val (counts, total) = driverCounts()
    val exactHH = counts.filter { case (_, c) => c * 200L > total }.keySet
    val rows = Frequent.frequentTokensApprox(spark, sf).collect()
    assert(rows.nonEmpty)
    val got = rows.map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(6)))).toMap
    // containment: EVERY exact heavy hitter is reported, flagged is_exact_hh
    exactHH.foreach { w =>
      assert(got.contains(w), s"true heavy hitter '$w' missing from MG candidates")
      assert(got(w)._5 == 1L, s"'$w' present but not flagged exact")
    }
    // and only true HHs carry the flag
    got.foreach { case (w, (est, exact, deficit, bound, flag)) =>
      assert(flag == (if (exactHH(w)) 1L else 0L))
      assert(exact == counts.getOrElse(w, 0L))
      // the MG law: est <= exact <= est + n/(sketchK+1), i.e. deficit in [0, bound]
      assert(deficit >= 0L && deficit <= bound,
        s"'$w': deficit $deficit outside [0, $bound] (est=$est exact=$exact)")
    }
  }

  test("frequentApproxWords under a sketch narrower than the vocabulary keeps every true heavy hitter") {
    import spark.implicits._
    // synthetic stream: 2000-word tail vocabulary (far beyond the 64-counter
    // sketch, so decrement rounds run constantly) + 3 genuinely heavy words.
    // Deterministic construction — no RNG in tests.
    val heavy = Seq.fill(400)("alpha") ++ Seq.fill(300)("beta") ++ Seq.fill(250)("gamma")
    val tail = (0 until 4000).map(i => s"w${i % 2000}")
    // interleave deterministically so heavy occurrences spread across the stream
    val stream = (heavy ++ tail).zipWithIndex
      .sortBy { case (_, i) => (i * 2654435761L) % 4294967296L }.map(_._1)
    val total = stream.length.toLong
    val counts = stream.groupBy(identity).map { case (w, o) => w -> o.size.toLong }
    val k = 40
    val exactHH = counts.filter { case (_, c) => c * k > total }.keySet
    assert(exactHH == Set("alpha", "beta", "gamma"), exactHH.toString)
    val wordsDf = stream.toDF("w").repartition(8) // 8 partitions => 8 summaries merged
    val exactDf = wordsDf.groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    val rows = Frequent.frequentApproxWords(wordsDf, exactDf, k = k, sketchK = 64).collect()
    val got = rows.map(r => r.getString(0)).toSet
    exactHH.foreach { w =>
      assert(got.contains(w), s"true heavy hitter '$w' lost by the 64-counter sketch")
    }
    // the sketch was genuinely stressed: at least one reported word carries a
    // nonzero deficit (counts were really discounted, not exact all along)
    assert(rows.exists(_.getLong(3) > 0L), "decrement path never exercised")
    // and every deficit respects the merged MG bound
    rows.foreach { r =>
      assert(r.getLong(3) >= 0L && r.getLong(3) <= r.getLong(4),
        s"'${r.getString(0)}': deficit ${r.getLong(3)} outside [0, ${r.getLong(4)}]")
    }
    // the precondition is enforced, not assumed
    intercept[IllegalArgumentException] {
      Frequent.frequentTokensApprox(spark, sf, k = 50, sketchK = 8)
    }
  }
}
