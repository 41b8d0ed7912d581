package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** REAL byte-pair-encoding tokenization (Sennrich et al. 2016; the GPT-2
  * word-level variant without the end-of-word marker), replacing the
  * regex token ESTIMATE `TextScan.n_bpe_tokens` where a tokenizer-faithful
  * count matters (context-window packing, chunk budgeting).
  *
  * The split of labor is the standard production recipe (how SentencePiece /
  * HuggingFace tokenizer training actually runs over big corpora):
  *
  *  1. WORD COUNTS — one distributed `explode + groupBy` (map-side
  *     combined); the result is bounded by VOCABULARY, not corpus size
  *     (Heaps' law — sublinear in tokens), and further capped by
  *     `maxVocab` most-frequent words, so the driver-side collect is a
  *     bounded, documented one (same contract as the IVF centroid sample).
  *  2. MERGE LEARNING — pure driver-side loop over the word-count table
  *     (`learnMerges`): repeatedly merge the highest-weighted adjacent
  *     symbol pair. Deterministic: ties break to the lexicographically
  *     smallest pair, so the merges table is reproducible run-over-run.
  *  3. ENCODE — distributed `mapPartitions` over the corpus with the ranks
  *     map as ONE broadcast (the "broadcast merges table"); per-partition
  *     word→count cache so each distinct word per task is encoded once.
  *     Narrow, no shuffle; scales linearly with input splits.
  *
  * Not DuckDB-expressible (the greedy merge loop has no SQL form), so the
  * queries are rows-only with invariant-evidence columns; BpeSpec pins the
  * distributed encode to a driver-side reference implementation word by
  * word, plus the classic BPE laws (0 merges = char count; counts
  * monotonically non-increasing in merges).
  */
object Bpe {

  /** Pre-tokenizer: lowercased Unicode letter/digit runs (`\p{L}\p{N}` —
    * any script: Latin, CJK, Cyrillic, Greek, Arabic, …), so a multilingual
    * corpus gets real token counts instead of the zero an ASCII-only class
    * would produce. BOTH the training word counts and the encode path run
    * this exact JVM function (Locale.ROOT), so tokenization is bit-identical
    * between them on ANY input — a SQL `lower()` variant was rejected
    * because Spark's and the JVM's Unicode special-casing can diverge
    * (e.g. U+0130, final sigma), which would silently train merges on a
    * different word multiset than encode sees.
    */
  private val WordRe = java.util.regex.Pattern.compile("[\\p{L}\\p{N}]+")

  def pretokenize(text: String): Vector[String] = {
    val m = WordRe.matcher(text.toLowerCase(java.util.Locale.ROOT))
    val out = Vector.newBuilder[String]
    while (m.find()) out += m.group()
    out.result()
  }

  /** One greedy-merge step: fuse every non-overlapping occurrence of `pair`
    * left-to-right (the standard BPE apply rule).
    */
  private def applyMerge(syms: Vector[String], pair: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += syms(i) + syms(i + 1); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Learn `nMerges` merges from a word-frequency table (driver-side, pure).
    * Stops early when no adjacent pair occurs at weight ≥ 2 — merging a
    * pair seen once memorizes a single word and adds no compression.
    */
  def learnMerges(wordCounts: Map[String, Long], nMerges: Int): Vector[(String, String)] = {
    var vocab: Vector[(Vector[String], Long)] =
      wordCounts.iterator.filter(_._1.nonEmpty)
        .map { case (w, c) => (w.map(_.toString).toVector, c) }.toVector
    val merges = Vector.newBuilder[(String, String)]
    var k = 0
    var exhausted = false
    while (k < nMerges && !exhausted) {
      val pairCounts = mutable.HashMap.empty[(String, String), Long]
      for ((syms, c) <- vocab; i <- 0 until syms.length - 1)
        pairCounts.updateWith((syms(i), syms(i + 1)))(v => Some(v.getOrElse(0L) + c))
      // max weight, ties to the lexicographically smallest pair — the
      // deterministic order the spec (and any re-run) reproduces
      var best: (String, String) = null
      var bestC = 1L // threshold: require weight >= 2
      for ((p, c) <- pairCounts)
        if (c > bestC || (c == bestC && best != null &&
            (p._1 < best._1 || (p._1 == best._1 && p._2 < best._2)))) {
          best = p; bestC = c
        }
      if (best == null) exhausted = true
      else {
        merges += best
        vocab = vocab.map { case (syms, c) => (applyMerge(syms, best), c) }
        k += 1
      }
    }
    merges.result()
  }

  /** Greedy encode: repeatedly fuse the present pair with the LOWEST merge
    * rank (GPT-2's encode loop) until none applies; returns the token
    * sequence (whose concatenation is always the input word — the
    * content-preservation law BpeSpec pins).
    */
  def encode(word: String, ranks: Map[(String, String), Int]): Vector[String] = {
    var parts = word.map(_.toString).toVector
    var done = parts.length <= 1
    while (!done) {
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var i = 0
      while (i < parts.length - 1) {
        val r = ranks.getOrElse((parts(i), parts(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestIdx = i }
        i += 1
      }
      if (bestIdx < 0) done = true
      else {
        parts = applyMerge(parts, (parts(bestIdx), parts(bestIdx + 1)))
        done = parts.length <= 1
      }
    }
    parts
  }

  def encodeCount(word: String, ranks: Map[(String, String), Int]): Int =
    encode(word, ranks).length

  /** The corpus word-frequency table (distributed; bounded by `maxVocab`
    * most-frequent words — rarer words still encode fine, they just never
    * drive a merge). Uses [[pretokenize]] so training sees exactly the
    * words the encode path will; null text contributes nothing (same
    * contract as [[Dedup.shingles]]).
    */
  def wordCounts(spark: SparkSession, d: String, maxVocab: Int): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, d)
      .select(col("text")).as[String]
      .flatMap(t => if (t == null) Nil else pretokenize(t))
      .toDF("word")
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("word"))
      .limit(maxVocab)
  }

  /** Learned merges for a corpus, session-memoized (the learn is one bounded
    * collect + a driver loop; every dependent query shares it).
    */
  def merges(spark: SparkSession, d: String, nMerges: Int = 200,
      maxVocab: Int = 65536): Vector[(String, String)] =
    Memo(spark, s"bpe_merges|$d|$nMerges|$maxVocab") {
      val wc = wordCounts(spark, d, maxVocab).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      learnMerges(wc, nMerges)
    }

  /** The merges table as a frame: (rank, lhs, rhs, merged). Rows-only gate;
    * evidence invariant: `merged = lhs || rhs` and ranks are dense from 0.
    */
  def bpeVocab(spark: SparkSession, d: String, nMerges: Int = 200): DataFrame = {
    import spark.implicits._
    merges(spark, d, nMerges).zipWithIndex
      .map { case ((l, r), i) => (i.toLong, l, r, l + r) }
      .toDF("rank", "lhs", "rhs", "merged")
      .orderBy("rank")
  }

  /** Per-document REAL BPE token counts: one broadcast of the ranks map, one
    * narrow scan with a per-partition word cache. Evidence invariants ride
    * along: `n_words <= n_bpe_tokens <= n_word_chars` (each word encodes to
    * between 1 and len(word) tokens).
    */
  def tokenCounts(spark: SparkSession, d: String, nMerges: Int = 200): DataFrame = {
    val ranks = merges(spark, d, nMerges).zipWithIndex.toMap
    val bc = spark.sparkContext.broadcast(ranks)
    import spark.implicits._
    Tables.documents(spark, d)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val r = bc.value
        val cache = new java.util.HashMap[String, Integer]()
        it.map { case (id, text) =>
          var words = 0L; var chars = 0L; var toks = 0L
          // null text → zero counts (same contract as Dedup.shingles; a
          // null here must mark one row, never abort the task)
          if (text != null) {
            val m = WordRe.matcher(text.toLowerCase(java.util.Locale.ROOT))
            while (m.find()) {
              val w = m.group()
              words += 1; chars += w.length
              var n = cache.get(w)
              if (n == null) { n = encodeCount(w, r); cache.put(w, n) }
              toks += n.toInt
            }
          }
          (id, words, chars, toks)
        }
      }
      .toDF("doc_id", "n_words", "n_word_chars", "n_bpe_tokens")
      .orderBy("doc_id")
  }

  /** Token-budget batch packing on REAL BPE counts — [[TextOps.batchPacking]]
    * with the tokenizer-faithful cost the scaladoc there promises: same
    * per-stratum running-sum window (DECIMAL(38,0) accumulate), cost =
    * n_bpe_tokens instead of n_chars.
    */
  def packingBpe(spark: SparkSession, d: String, budget: Long = 1000L,
      nMerges: Int = 200): DataFrame = {
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    Tables.documents(spark, d).select(col("doc_id"), col("lang"))
      .join(tokenCounts(spark, d, nMerges).select(col("doc_id"), col("n_bpe_tokens")), "doc_id")
      .withColumn("cum_toks",
        sum(col("n_bpe_tokens").cast(DecimalType(38, 0))).over(w).cast("long"))
      .withColumn("batch_idx", expr(s"(cum_toks - n_bpe_tokens) div $budget"))
      .select(col("lang"), col("doc_id"), col("n_bpe_tokens"), col("cum_toks"), col("batch_idx"))
      .orderBy("lang", "doc_id")
  }
}
