package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

class BpeSpec extends SparkSuite {

  test("learnMerges: most frequent pair merges first, deterministic tie-break") {
    // "ab" occurs weighted 7 (5 in 'abab'·? ...): construct explicitly —
    // 'aaab'x3 has pairs (a,a)x2·3=6, (a,b)x1·3=3; 'ab'x4 adds (a,b)x4=4
    val merges = Bpe.learnMerges(Map("aaab" -> 3L, "ab" -> 4L), 2)
    assert(merges.head == ("a", "b") || merges.head == ("a", "a"))
    // weights: (a,b)=7, (a,a)=6 → first merge is (a,b)
    assert(merges.head == ("a", "b"))
    // after merging (a,b): 'aaab' → a,a,ab; pairs (a,a)=3·? weight 3·... =
    // (a,a) weight 6? 'aaab'→[a,a,ab]: (a,a)=1·3, (a,ab)=1·3 → tie at 3 →
    // lexicographic: (a,a) < (a,ab)
    assert(merges(1) == ("a", "a"))
  }

  test("learnMerges stops when no pair reaches weight 2") {
    assert(Bpe.learnMerges(Map("xy" -> 1L), 10).isEmpty)
    assert(Bpe.learnMerges(Map("a" -> 100L), 10).isEmpty)
  }

  test("encodeCount laws: 0 merges = char count; monotone in merges; floor 1") {
    val wc = Map("banana" -> 10L, "bandana" -> 5L, "nan" -> 3L)
    assert(Bpe.encodeCount("banana", Map.empty) == 6)
    val all = Bpe.learnMerges(wc, 50)
    var prev = Int.MaxValue
    for (k <- 0 to all.length) {
      val ranks = all.take(k).zipWithIndex.toMap
      val n = Bpe.encodeCount("banana", ranks)
      assert(n <= prev, s"count grew at $k merges")
      assert(n >= 1)
      prev = n
    }
    // enough merges collapse a training word entirely
    assert(Bpe.encodeCount("banana", all.zipWithIndex.toMap) == 1)
  }

  test("encode laws over random words: content preserved, insertion order of the count table irrelevant") {
    // deterministic pseudo-random words (no RNG seeds in tests)
    val words = (1 to 200).map { i =>
      val len = 1 + (i * 7919) % 12
      (0 until len).map(j => ('a' + ((i * 31 + j * 17) % 26)).toChar).mkString
    }
    val counts = words.groupBy(identity).map { case (w, o) => w -> o.size.toLong }
    val merges = Bpe.learnMerges(counts, 64)
    val ranks = merges.zipWithIndex.toMap
    words.foreach { w =>
      val parts = Bpe.encode(w, ranks)
      // content preservation: tokenization never alters the text
      assert(parts.mkString == w, s"'$w' re-assembled as '${parts.mkString}'")
      assert(parts.nonEmpty && parts.length <= w.length)
    }
    // learning is insertion-order independent (canonical tie-breaks): the
    // same multiset presented in reverse yields the same merges table
    val reversed = scala.collection.immutable.ListMap(counts.toSeq.reverse: _*)
    assert(Bpe.learnMerges(reversed, 64) == merges)
  }

  test("distributed token counts equal the driver-side reference encode, doc by doc") {
    import spark.implicits._
    val ranks = Bpe.merges(spark, sf).zipWithIndex.toMap
    val got = Bpe.tokenCounts(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .as[(Long, String)].collect()
    assert(docs.nonEmpty && got.size == docs.length)
    docs.foreach { case (id, text) =>
      val words = Bpe.pretokenize(text)
      val want = (words.length.toLong, words.map(_.length.toLong).sum,
        words.map(w => Bpe.encodeCount(w, ranks).toLong).sum)
      assert(got(id) == want, s"doc $id: got ${got(id)} want $want")
    }
    // invariant evidence the rows-only gate exports
    got.values.foreach { case (w, c, t) => assert(w <= t && t <= c) }
    // the merges genuinely compress: corpus-wide tokens < chars
    assert(got.values.map(_._3).sum < got.values.map(_._2).sum)
  }

  test("pretokenize is Unicode-aware: letters in ANY script yield words (and tokens)") {
    // one fixture per major script family a multilingual corpus hits day one
    val fixtures = Seq(
      "Hello, World! 42",            // Latin + digits
      "это русский текст",           // Cyrillic
      "Αυτό είναι ΕΛΛΗΝΙΚΟ",         // Greek (incl. final-sigma lowering)
      "これは日本語のテキストです",       // Japanese (no spaces — one run)
      "中文文本处理",                  // Chinese
      "هذا نص عربي",                 // Arabic
      "한국어 텍스트",                 // Hangul
      "मिश्रित mixed स्क्रिप्ट 123"    // Devanagari + Latin + digits
    )
    fixtures.foreach { text =>
      val words = Bpe.pretokenize(text)
      assert(words.nonEmpty, s"zero words from: $text")
      // encode with an empty ranks table = char-level: > 0 tokens, and the
      // concatenation law holds for non-ASCII content too
      words.foreach { w =>
        val parts = Bpe.encode(w, Map.empty)
        assert(parts.nonEmpty && parts.mkString == w)
      }
    }
    // punctuation/whitespace never leaks into words in any script
    assert(Bpe.pretokenize("a,b。c、d！e") == Vector("a", "b", "c", "d", "e"))
    // training + encode share the function: merges learned on a non-Latin
    // multiset compress non-Latin text (n_bpe_tokens strictly between 1·words
    // and char count once a merge lands)
    val wc = Map("привет" -> 10L, "приветик" -> 5L)
    val merges = Bpe.learnMerges(wc, 8)
    assert(merges.nonEmpty)
    val ranks = merges.zipWithIndex.toMap
    val n = Bpe.encodeCount("привет", ranks)
    assert(n >= 1 && n < "привет".length)
  }

  test("bpeVocab: dense ranks and merged = lhs || rhs") {
    val rows = Bpe.bpeVocab(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(0) == i.toLong)
      assert(r.getString(3) == r.getString(1) + r.getString(2))
    }
  }

  test("packingBpe: batches respect the token budget per stratum") {
    val rows = Bpe.packingBpe(spark, sf, budget = 1000L).collect()
    assert(rows.nonEmpty)
    // a batch's cost-before-this-doc stays under budget: (cum - n) div b is
    // the batch index, so within a batch the pre-sum spans < budget
    rows.groupBy(r => (r.getString(0), r.getLong(4))).foreach { case (_, g) =>
      val sorted = g.sortBy(_.getLong(1))
      val start = sorted.head.getLong(3) - sorted.head.getLong(2)
      val preLast = sorted.last.getLong(3) - sorted.last.getLong(2)
      assert(preLast - start < 1000L)
    }
  }
}
