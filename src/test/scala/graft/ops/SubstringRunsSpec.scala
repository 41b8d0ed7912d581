package graft.ops

import graft.SparkSuite

class SubstringRunsSpec extends SparkSuite {
  import spark.implicits._

  private def doc(id: Long, words: Seq[String]) = (id, words.mkString(" "))

  test("planted verbatim span is found at exact positions and length") {
    val shared = (0 until 15).map(i => s"s$i") // 15-token verbatim span
    val a = doc(1L, (0 until 20).map(i => s"a$i") ++ shared ++ (0 until 10).map(i => s"b$i"))
    val b = doc(2L, (0 until 5).map(i => s"c$i") ++ shared ++ (0 until 7).map(i => s"d$i"))
    val docs = Seq(a, b).toDF("doc_id", "text")
    val runs = Dedup.substringRuns(Dedup.posShingles(docs), minRun = 5, maxDf = 64, n = 5)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    // 15 shared tokens = 11 aligned 5-grams; spans start at word 21 in doc 1
    // (1-based, after the 20-token prefix) and word 6 in doc 2
    assert(runs === Seq((1L, 2L, 21L, 6L, 11L, 15L)))
  }

  test("disjoint spans yield separate runs; short spans fall below minRun") {
    val s1 = (0 until 9).map(i => s"x$i")  // 9 tokens = 5 five-grams
    val s2 = (0 until 8).map(i => s"y$i")  // 8 tokens = 4 five-grams (below minRun=5)
    val a = doc(1L, s1 ++ (0 until 6).map(i => s"p$i") ++ s2)
    val b = doc(2L, (0 until 3).map(i => s"q$i") ++ s1 ++ (0 until 4).map(i => s"r$i") ++ s2)
    val docs = Seq(a, b).toDF("doc_id", "text")
    val runs = Dedup.substringRuns(Dedup.posShingles(docs), minRun = 5, maxDf = 64, n = 5)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(runs === Seq((1L, 2L, 1L, 4L, 5L, 9L)))
    // lowering minRun to 4 surfaces the second (disjoint) span too
    val runs4 = Dedup.substringRuns(Dedup.posShingles(docs), minRun = 4, maxDf = 64, n = 5)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    // s2 in doc b sits after 3 q-tokens + 9 s1-tokens + 4 r-tokens = 1-based pos 17
    assert(runs4.size === 2 && runs4.contains((1L, 2L, 16L, 17L, 4L, 8L)))
  }

  test("stop-shingle occurrence cap drops boilerplate from candidate generation") {
    val boiler = (0 until 12).map(i => s"h$i") // shared by ALL docs
    val docs = (1L to 6L).map(id => doc(id, boiler ++ Seq(s"u$id"))).toDF("doc_id", "text")
    // every boiler shingle occurs 6 times > maxDf=4 → no candidates at all
    val capped = Dedup.substringRuns(Dedup.posShingles(docs), minRun = 5, maxDf = 4, n = 5)
    assert(capped.count() === 0)
    // raising the cap re-admits them: every one of the 15 doc pairs shares the span
    val open = Dedup.substringRuns(Dedup.posShingles(docs), minRun = 5, maxDf = 64, n = 5)
    assert(open.count() === 15)
  }

  test("substringCleanOf cuts the planted span from the higher-id doc only") {
    val shared = (0 until 15).map(i => s"s$i")
    val aWords = (0 until 20).map(i => s"a$i") ++ shared ++ (0 until 10).map(i => s"b$i")
    val bWords = (0 until 5).map(i => s"c$i") ++ shared ++ (0 until 7).map(i => s"d$i")
    val docs = Seq(doc(1L, aWords), doc(2L, bWords)).toDF("doc_id", "text")
    val runs = Dedup.substringRuns(Dedup.posShingles(docs), minRun = 5, maxDf = 64, n = 5)
    val out = Dedup.substringCleanOf(docs, runs)
      .as[(Long, Long, Long, Long, Long, String)].collect().toSeq
    // only doc 2 (the higher id) is touched; the span (15 tokens at pos 6..20)
    // is removed whole, doc 1 keeps the canonical copy
    val expectClean = ((0 until 5).map(i => s"c$i") ++ (0 until 7).map(i => s"d$i")).mkString(" ")
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(expectClean.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out === Seq((2L, 27L, 1L, 15L, 12L, md)))
  }

  test("substringCleanOf coalesces overlapping spans from different partners") {
    // doc 3 shares tokens 1..13 with doc 1 and tokens 5..17 with doc 2:
    // two flagged spans overlap in doc 3 and must merge into ONE cut 1..17
    val core = (0 until 17).map(i => s"z$i")
    val d1 = doc(1L, core.take(13) ++ (0 until 6).map(i => s"e$i"))
    val d2 = doc(2L, (0 until 6).map(i => s"f$i") ++ core.drop(4))
    val d3 = doc(3L, core ++ (0 until 5).map(i => s"g$i"))
    val docs = Seq(d1, d2, d3).toDF("doc_id", "text")
    val runs = Dedup.substringRuns(Dedup.posShingles(docs), minRun = 5, maxDf = 64, n = 5)
    val out = Dedup.substringCleanOf(docs, runs)
      .as[(Long, Long, Long, Long, Long, String)].collect().toSeq
    val row3 = out.find(_._1 == 3L).get
    assert(row3._3 == 1L, s"overlapping spans must coalesce to one: $row3")
    assert(row3._4 == 17L && row3._5 == row3._2 - 17L)
  }

  test("corpus query returns rows and respects ordering contract") {
    val out = Dedup.repeatedSubstrings(spark, sf).collect()
    val key = out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(key.toSeq === key.toSeq.sorted, "ordered by (a,b,start_a,start_b)")
    assert(key.distinct.length === key.length, "output key is unique")
  }
}
