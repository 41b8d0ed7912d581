package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication family for LLM-data pipelines (north star): exact,
  * n-gram-Jaccard, MinHash+LSH, SimHash.
  *
  * Scale posture: exact dedup is one hash-groupBy (map-side combined);
  * Jaccard/minhash work on an inverted shingle index — the shuffle key is the
  * shingle/band bucket, never the document pair space, so candidate
  * generation is linear in index size rather than quadratic in corpus size.
  */
object Dedup {

  /** Exact dedup groups by normalized-content fingerprint. */
  def exact(spark: SparkSession, d: String): DataFrame =
    Tables.documents(spark, d)
      .select(col("doc_id"), TextOps.fingerprintCol.as("fingerprint"))
      .groupBy("fingerprint")
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_docs"))
      .orderBy("canonical_id")

  /** Latest-version-wins dedup on the events stream (CDC compaction):
    * one row per user key, the highest event wins.
    */
  def latestByKey(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(desc("event_id"))
    Tables.events(spark, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("event_type"),
        get_json_object(col("props"), "$.k").as("k"))
      .orderBy("user_id")
  }

  /** Shared shingle index, materialized once per session. Shingles are
    * xxhash64-hashed to 8-byte longs right after generation: every downstream
    * shuffle (inverted-index groupBy, minhash) moves longs instead of
    * ~30-byte strings, and set semantics are unchanged (collisions are
    * ~n^2/2^64, negligible).
    */
  def cachedShingles(spark: SparkSession, d: String): DataFrame =
    Memo(spark, s"shingles|$d") {
      shingles(Tables.documents(spark, d)).persist()
    }

  /** Distinct hashed word 5-gram shingles per doc: `(doc_id, shingle)`.
    *
    * NARROW: per-doc distinctness is computed task-locally (a doc's shingles
    * all live in its row), so no `.distinct()` shuffle over the full index —
    * at 100 TB that exchange was the single largest data movement in the
    * dedup family. Hash values are bit-identical to the SQL path
    * `xxhash64(concat_ws(' ', w[i..i+n-1]))` (parity pinned in OpsSpec).
    */
  def shingles(docs: DataFrame, n: Int = 5): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      // null text → no shingles (the Column-expression path dropped null rows)
      .flatMap { case (id, text) =>
        if (text == null) Nil else shingleHashes(text, n).map(id -> _)
      }
      .toDF("doc_id", "shingle")
  }

  /** `split(trim(text), ' ')` tokenization shared by every shingle path
    * (space-only trim, empty tokens KEPT — regex split semantics).
    */
  private def spaceTokens(text: String): Array[String] = {
    var s = 0
    var e = text.length
    while (s < e && text.charAt(s) == ' ') s += 1
    while (e > s && text.charAt(e - 1) == ' ') e -= 1
    text.substring(s, e).split(" ", -1)
  }

  /** xxhash64(seed 42) of the space-joined n-gram starting at word i. */
  private def ngramHash(w: Array[String], i: Int, n: Int): Long = {
    val sb = new java.lang.StringBuilder
    var j = 0
    while (j < n) { if (j > 0) sb.append(' '); sb.append(w(i + j)); j += 1 }
    val bytes = sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    org.apache.spark.sql.catalyst.expressions.XXH64
      .hashUnsafeBytes(bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
        bytes.length, 42L)
  }

  /** Distinct xxhash64(seed 42) hashes of word n-grams, matching the Spark
    * SQL `split(trim(text), ' ')` tokenization exactly.
    */
  private[ops] def shingleHashes(text: String, n: Int): Array[Long] = {
    val w = spaceTokens(text)
    if (w.length < n) return Array.emptyLongArray
    val set = new java.util.HashSet[java.lang.Long]()
    val out = Array.newBuilder[Long]
    var i = 0
    while (i <= w.length - n) {
      val h = ngramHash(w, i, n)
      if (set.add(h)) out += h
      i += 1
    }
    out.result()
  }

  /** POSITIONAL shingle index `(doc_id, pos, shingle)` — one row per n-gram
    * OCCURRENCE (not per distinct shingle like [[shingles]]), pos 1-based to
    * match DuckDB list indexing. [[cachedShingles]] can't back substring-run
    * detection: set-similarity only needs membership, runs need WHERE each
    * shingle sits. Same narrow per-doc flatMap, memoized+persisted once per
    * session.
    */
  def cachedPosShingles(spark: SparkSession, d: String, n: Int = 5): DataFrame =
    Memo(spark, s"posshingles|$d|$n") {
      posShingles(Tables.documents(spark, d), n).persist()
    }

  def posShingles(docs: DataFrame, n: Int = 5): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        if (text == null) Nil
        else {
          val w = spaceTokens(text)
          if (w.length < n) Nil
          else (0 to w.length - n).map(i => (id, (i + 1).toLong, ngramHash(w, i, n)))
        }
      }
      .toDF("doc_id", "pos", "shingle")
  }

  /** EXACT repeated-substring detection across documents (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better" direction):
    * maximal runs of >= minRun consecutive shared word 5-grams between two
    * docs, with positions — i.e. verbatim cross-doc substrings of
    * `minRun + 4` tokens or longer, the exact-substring contamination that
    * set-similarity dedup (Jaccard/MinHash) cannot localize.
    *
    * Shape: positional-index self-join on the shingle hash (stop-shingle
    * occurrence cap `maxDf`, mirrored in the oracle, keeps boilerplate
    * shingles from squaring a task at web scale), then gaps-and-islands on
    * each (a, b, diagonal = pa - pb): consecutive pa values on one diagonal
    * are one run, found with a single row_number window — no per-pair
    * iteration, no driver logic. Two shuffles total (shingle, then pair
    * diagonal); output is pure integer columns.
    *
    * @return (a, b, start_a, start_b, run_ngrams, run_tokens), a < b,
    *         unique on (a, b, start_a, start_b)
    */
  def repeatedSubstrings(spark: SparkSession, d: String,
      minRun: Int = 10, maxDf: Int = 64, n: Int = 5): DataFrame =
    // memoized: the mined run set backs three registered queries
    // (repeated_substrings, substring_dedup_clean, and training_set_build's
    // remediation stage) — sorted bench order charges the mining here once
    Memo(spark, s"subruns|$d|$minRun|$maxDf|$n") {
      substringRuns(cachedPosShingles(spark, d, n), minRun, maxDf, n).persist()
    }

  /** Run mining over a `(doc_id, pos, shingle)` positional index. */
  def substringRuns(ps: DataFrame, minRun: Int, maxDf: Int, n: Int): DataFrame = {
    // occurrence cap (not distinct-doc cap): join fan-out is occ_x * occ_y
    // per shingle, so occurrences are what must be bounded
    val ok = ps.groupBy("shingle").agg(count(lit(1)).as("occ"))
      .filter(col("occ").between(2, maxDf))
      .select("shingle")
    val capped = ps.join(ok, Seq("shingle"), "left_semi")
    val l = capped.select(col("shingle"), col("doc_id").as("a"), col("pos").as("pa"))
    val r = capped.select(col("shingle"), col("doc_id").as("b"), col("pos").as("pb"))
    val matches = l.join(r, Seq("shingle")).filter(col("a") < col("b"))
      .select(col("a"), col("b"), col("pa"), col("pb"),
        (col("pa") - col("pb")).as("diag"))
    val w = Window.partitionBy(col("a"), col("b"), col("diag")).orderBy(col("pa"))
    matches
      .withColumn("island", col("pa") - row_number().over(w))
      .groupBy(col("a"), col("b"), col("diag"), col("island"))
      .agg(min(col("pa")).as("start_a"), min(col("pb")).as("start_b"),
        count(lit(1)).as("run_ngrams"))
      .filter(col("run_ngrams") >= minRun)
      .select(col("a"), col("b"), col("start_a"), col("start_b"),
        col("run_ngrams"), (col("run_ngrams") + lit((n - 1).toLong)).as("run_tokens"))
      .orderBy("a", "b", "start_a", "start_b")
  }

  /** Remediation half of [[repeatedSubstrings]] (Lee et al. 2022 direction:
    * after FINDING verbatim cross-doc substrings, CUT them, keeping one
    * copy): every flagged run is removed from the HIGHER-id doc of its pair
    * — the lower id keeps the canonical copy, so each duplicated span
    * survives exactly once corpus-wide per pair chain. Overlapping and
    * adjacent cuts are coalesced per doc (one gaps-and-islands window over
    * the tiny span set), and the cleaned text is re-emitted with its md5 so
    * the oracle certifies the token-level reconstruction byte-for-byte.
    *
    * Scale shape: the span set is the run-mining output (orders of
    * magnitude smaller than the corpus); the merge is one window on
    * (doc_id); the rewrite is a per-row higher-order expression over the
    * token array — no explode, no extra shuffle beyond the mining itself.
    * Output covers AFFECTED docs only; unaffected docs pass through any
    * real pipeline untouched.
    *
    * @return (doc_id, n_tokens, n_spans, tokens_removed, n_tokens_clean,
    *         clean_md5), unique on doc_id
    */
  def substringClean(spark: SparkSession, d: String,
      minRun: Int = 10, maxDf: Int = 64, n: Int = 5): DataFrame =
    substringCleanOf(Tables.documents(spark, d),
      repeatedSubstrings(spark, d, minRun, maxDf, n))

  /** Frame-parameterized core of [[substringClean]] (spec surface). */
  def substringCleanOf(docs: DataFrame, runs: DataFrame): DataFrame =
    cleanTokens(docs, runs)
      .select(col("doc_id"),
        size(col("w")).cast("long").as("n_tokens"),
        col("n_spans"),
        col("tokens_removed"),
        size(col("kept")).cast("long").as("n_tokens_clean"),
        md5(array_join(col("kept"), " ").cast("binary")).as("clean_md5"))
      .orderBy("doc_id")

  /** Corpus-level duplication REPORT — the monitoring face of the
    * remediation family: per source, how many documents carry flagged
    * cross-doc verbatim runs and what fraction of the source's token mass
    * they remove (`removed_ppm`, integer parts-per-million — exact integer
    * division, oracle-stable). This is the number a curation team actually
    * watches ("which scrape is feeding us boilerplate?"), and it certifies
    * corpus-wide that the remediation accounting sums correctly.
    *
    * Scale shape: rides the memoized mined-run set like the rest of the
    * family; the per-doc token count is one narrow projection; the rollup
    * is a single hash aggregation on the (tiny) source key.
    *
    * @return (source, n_docs, docs_affected, total_tokens, tokens_removed,
    *         removed_ppm), unique on source
    */
  def duplicationBySource(spark: SparkSession, d: String,
      minRun: Int = 10, maxDf: Int = 64, n: Int = 5): DataFrame = {
    val toks = Tables.documents(spark, d)
      .select(col("doc_id"), col("source"),
        size(split(trim(col("text")), " ")).cast("long").as("n_tokens"))
    val cleaned = substringClean(spark, d, minRun, maxDf, n)
      .select(col("doc_id"), col("tokens_removed"))
    toks.join(cleaned, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("tokens_removed").isNotNull, 1L).otherwise(0L))
          .cast("long").as("docs_affected"),
        sum(col("n_tokens")).cast("long").as("total_tokens"),
        coalesce(sum(col("tokens_removed")), lit(0L)).cast("long").as("tokens_removed"))
      .withColumn("removed_ppm",
        expr("(tokens_removed * 1000000) div total_tokens"))
      .orderBy("source")
  }

  /** Cross-SOURCE content-overlap matrix — the inter-scrape counterpart of
    * [[duplicationBySource]] (that one asks "how much boilerplate does each
    * source carry?", this one asks "WHICH sources carry each other's
    * content?" — the number that catches a mirror site, a re-crawl of the
    * same host, or two feeds syndicating one wire service before their
    * documents ever reach pairwise dedup): for every source pair sharing at
    * least one distinct word 5-gram, the shared-shingle count plus integer
    * Jaccard and containment in parts-per-million. Containment (common over
    * the SMALLER side) is the mirror-detector — a small source wholly
    * contained in a big one scores ~1e6 there while Jaccard stays low.
    *
    * Scale shape: the pair space is sources², not docs² — the shingle
    * index rolls up to distinct (source, shingle) rows first (one narrow
    * join + aggregation), and pair generation groups per shingle and
    * explodes ordered source pairs (fanout per shingle ≤ nSources², with
    * nSources in the hundreds at worst) — one shuffle on the shingle key,
    * never a cross join. Exact integers end to end, hash-oracled.
    *
    * @return (source_a, source_b, n_a, n_b, n_common, jaccard_ppm,
    *         containment_ppm), a < b, unique on (source_a, source_b)
    */
  def sourceOverlap(spark: SparkSession, d: String): DataFrame = {
    val srcSh = cachedShingles(spark, d)
      .join(Tables.documents(spark, d).select(col("doc_id"), col("source")),
        Seq("doc_id"))
      .select(col("source"), col("shingle")).distinct()
    val sizes = srcSh.groupBy("source").agg(count(lit(1)).as("n_sh"))
    // collect_set order is partition-dependent — array_sort before pairing
    // so (a, b) is the lexicographic orientation on every run
    val inter = srcSh.groupBy("shingle")
      .agg(sort_array(collect_set(col("source"))).as("ss"))
      .filter(size(col("ss")) >= 2)
      .select(explode(expr(
        "flatten(transform(ss, (x, i) -> transform(slice(ss, i + 2, size(ss)), " +
          "y -> struct(x as a, y as b))))")).as("p"))
      .groupBy(col("p.a").as("source_a"), col("p.b").as("source_b"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(sizes.select(col("source").as("source_a"), col("n_sh").as("n_a")), Seq("source_a"))
      .join(sizes.select(col("source").as("source_b"), col("n_sh").as("n_b")), Seq("source_b"))
      .withColumn("jaccard_ppm",
        expr("(n_common * 1000000) div (n_a + n_b - n_common)"))
      .withColumn("containment_ppm",
        expr("(n_common * 1000000) div least(n_a, n_b)"))
      .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"),
        col("n_common"), col("jaccard_ppm"), col("containment_ppm"))
      .orderBy("source_a", "source_b")
  }

  /** Sketch twin of [[sourceOverlap]] — the 100 TB form of the
    * mirror/syndication detector. The exact operator's inverted shingle
    * index must SHUFFLE every (source, shingle) row to group by shingle; at
    * corpus scale the per-source DataSketches HLL (Spark's `hll_sketch_agg`
    * — mergeable, order-independent, fixed 2^lgK registers) replaces that
    * with one bounded-size sketch per source, and every pairwise statistic
    * becomes register arithmetic: |A∪B| from `hll_union`, |A∩B| by
    * inclusion-exclusion, Jaccard/containment from those. Pair cost is
    * sources² over KB-sized sketches — no shuffle grows with the corpus.
    *
    * Deterministic (HLL registers are max-based — insertion order cannot
    * change the sketch), but NOT DuckDB-reproducible (different HLL
    * implementation), so rows-only; the exact pair truth rides as evidence
    * (`exact_common`, via the memoized exact operator — the same
    * exact-twin convention as `revenue_percentiles_approx`), and OpsSpec
    * bounds the estimator error against lgK's published RSE.
    */
  /** Per-source shingle HLL sketches: `(source, sk)`, optionally restricted
    * to one side of the `batchMod` slice (0 = whole corpus).
    */
  private def sourceSketches(spark: SparkSession, d: String, lgK: Int,
      batchMod: Int = 0, newSlice: Boolean = false): DataFrame = {
    val srcSh = cachedShingles(spark, d)
      .join(Tables.documents(spark, d).select(col("doc_id"), col("source")),
        Seq("doc_id"))
    val sliced =
      if (batchMod <= 0) srcSh
      else if (newSlice) srcSh.filter(pmod(col("doc_id"), lit(batchMod)) === 0)
      else srcSh.filter(pmod(col("doc_id"), lit(batchMod)) =!= 0)
    sliced.select(col("source"), col("shingle")) // HLL dedups; no distinct needed
      .groupBy("source")
      .agg(hll_sketch_agg(col("shingle"), lgK).as("sk"))
  }

  /** Pairwise overlap statistics from a `(source, sk)` sketch frame —
    * the shared matrix core of [[sourceOverlapApprox]] and
    * [[incrementalSourceOverlap]]. Sources-sized non-equi self-join:
    * broadcast (a BroadcastNestedLoopJoin over KB rows, never a
    * CartesianProduct); every statistic is register arithmetic.
    */
  private def sketchPairMatrix(sketches: DataFrame): DataFrame =
    sketches.as("x")
      .join(broadcast(sketches.as("y")), col("x.source") < col("y.source"))
      .select(col("x.source").as("source_a"), col("y.source").as("source_b"),
        hll_sketch_estimate(col("x.sk")).as("est_a"),
        hll_sketch_estimate(col("y.sk")).as("est_b"),
        hll_sketch_estimate(hll_union(col("x.sk"), col("y.sk"))).as("est_union"))
      .withColumn("est_common",
        greatest(lit(0L), col("est_a") + col("est_b") - col("est_union")))
      .withColumn("jaccard_ppm_est",
        expr("(est_common * 1000000) div greatest(est_union, 1)"))
      .withColumn("containment_ppm_est",
        expr("(est_common * 1000000) div greatest(least(est_a, est_b), 1)"))

  def sourceOverlapApprox(spark: SparkSession, d: String, lgK: Int = 14): DataFrame = {
    val exact = sourceOverlap(spark, d)
      .select(col("source_a"), col("source_b"),
        col("n_common").as("exact_common"))
    sketchPairMatrix(sourceSketches(spark, d, lgK))
      .join(exact, Seq("source_a", "source_b"), "left")
      .select(col("source_a"), col("source_b"), col("est_a"), col("est_b"),
        col("est_common"), col("jaccard_ppm_est"), col("containment_ppm_est"),
        coalesce(col("exact_common"), lit(0L)).as("exact_common"))
      .orderBy("source_a", "source_b")
  }

  private[graft] val SrcSketchKind = "srcsketch-v1-hll"

  /** Incremental overlap matrix under CDC — the MERGEABILITY payoff of the
    * sketch twin, and the reason governance stats survive a continuously
    * ingesting corpus: the OLD slice's per-source sketches are
    * [[AnnStore]]-persisted ingest-time work (keyed on the documents
    * table), the NEW batch contributes one bounded sketch-aggregation over
    * its own shingles, and `hll_union_agg` folds the two register-wise —
    * the whole corpus is never re-scanned. The exported matrix carries
    * `full_est_common` (the same statistic computed from scratch over the
    * full corpus) as evidence that merged state tracks the from-scratch
    * answer; OpsSpec bounds their gap (tiny — union of partial sketches
    * and the direct sketch agree register-for-register once both sides
    * are in dense HLL mode) and pins the store round-trip.
    */
  def incrementalSourceOverlap(spark: SparkSession, d: String,
      batchMod: Int = 10, lgK: Int = 14): DataFrame = {
    val oldSk = Memo(spark, s"srcsketch|$d|$batchMod|$lgK") {
      AnnStore.loadOrBuild(spark,
        AnnStore.path(spark, SrcSketchKind, d, s"$batchMod-$lgK",
          corpusTable = "documents")) {
        sourceSketches(spark, d, lgK, batchMod, newSlice = false)
      }.persist()
    }
    val newSk = sourceSketches(spark, d, lgK, batchMod, newSlice = true)
    val merged = oldSk.unionAll(newSk)
      .groupBy("source").agg(hll_union_agg(col("sk")).as("sk"))
    val full = sketchPairMatrix(sourceSketches(spark, d, lgK))
      .select(col("source_a"), col("source_b"),
        col("est_common").as("full_est_common"))
    sketchPairMatrix(merged)
      .join(full, Seq("source_a", "source_b"))
      .select(col("source_a"), col("source_b"), col("est_a"), col("est_b"),
        col("est_common"), col("jaccard_ppm_est"), col("containment_ppm_est"),
        col("full_est_common"))
      .orderBy("source_a", "source_b")
  }

  /** Cleaned-TEXT view of the remediation — what a composed pipeline feeds
    * downstream ([[graft.ops.TextOps.trainingSetBuild]] chunks it): one
    * `(doc_id, clean_text)` row per AFFECTED doc, `clean_text` the kept
    * tokens rejoined on single spaces (the exact string whose md5 the
    * oracled [[substringClean]] certifies byte-for-byte).
    */
  def substringCleanText(spark: SparkSession, d: String,
      minRun: Int = 10, maxDf: Int = 64, n: Int = 5): DataFrame =
    cleanTokens(Tables.documents(spark, d), repeatedSubstrings(spark, d, minRun, maxDf, n))
      .select(col("doc_id"), array_join(col("kept"), " ").as("clean_text"))

  /** Shared remediation core: merged cut spans per affected doc + the kept
    * token array after the cuts. Output columns `(doc_id, text, n_spans,
    * tokens_removed, w, kept)`; affected docs only.
    */
  private def cleanTokens(docs: DataFrame, runs: DataFrame): DataFrame = {
    val spans = runs.select(col("b").as("doc_id"), col("start_b").as("s"),
      (col("start_b") + col("run_tokens") - 1).as("e"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("s"), col("e"))
    val merged = spans
      .withColumn("mep", max(col("e")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("nw",
        when(col("mep").isNull || col("s") > col("mep") + 1, 1L).otherwise(0L))
      .withColumn("island", sum(col("nw")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("s")).as("s"), max(col("e")).as("e"))
    val agg = merged.groupBy("doc_id").agg(
      count(lit(1)).as("n_spans"),
      sum(col("e") - col("s") + lit(1L)).as("tokens_removed"),
      collect_list(struct(col("s"), col("e"))).as("spans"))
    docs.select(col("doc_id"), col("text"))
      .join(agg, Seq("doc_id"))
      .withColumn("w", split(trim(col("text")), " "))
      .withColumn("kept", expr(
        "transform(filter(transform(w, (t, i) -> named_struct('t', t, 'p', cast(i + 1 as bigint))), " +
          "s -> NOT exists(spans, r -> s.p >= r.s AND s.p <= r.e)), s -> s.t)"))
  }

  /** Eval-set CONTAMINATION audit — the pre-training hygiene step (GPT-3
    * appendix C shape): flag every training document sharing at least one
    * word 5-gram with the held-out eval slice, with the containment ratio
    * |train ∩ eval shingles| / |train shingles|. Eval slice = doc_id ≡ 0
    * (mod `evalMod`) — a stand-in for the real eval corpus a pipeline would
    * broadcast in.
    *
    * Scale shape: reuses the session shingle index ([[cachedShingles]],
    * built once, shared with the Jaccard/MinHash family). In production the
    * eval corpus is a FIXED-SIZE external set, so its shingles broadcast
    * and the train side streams one narrow semi-join stage — that is what
    * makes contamination checks cheap at 100 TB. The mod-derived stand-in
    * here grows with the corpus instead, so the join is left unhinted: the
    * planner broadcasts while the set is small and falls back to a shuffle
    * semi join past the threshold rather than failing an oversized
    * BroadcastExchange. Containment exported as floor(hits·1e6 / n_sh)
    * BIGINT — integer division, exact on both engines.
    */
  def evalContamination(spark: SparkSession, d: String, evalMod: Int = 97): DataFrame = {
    val sh = cachedShingles(spark, d)
    val isEval = col("doc_id") % evalMod === 0
    val evalSh = sh.filter(isEval).select(col("shingle")).distinct()
    val train = sh.filter(!isEval)
    val sizes = train.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val hits = train.join(evalSh, Seq("shingle"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hits"))
    hits.join(sizes, "doc_id")
      .select(col("doc_id"), col("n_hits"), col("n_sh"),
        expr("(n_hits * 1000000) div n_sh").as("containment_e6"))
      .orderBy("doc_id")
  }

  /** Exact n-gram Jaccard near-dup pairs via inverted shingle index:
    * shingle → docs, self-join on shingle, |∩| per pair, then
    * J = |∩| / (|A| + |B| - |∩|). No quadratic pair space: only docs sharing
    * ≥1 shingle meet.
    */
  def ngramJaccard(
      spark: SparkSession,
      d: String,
      threshold: Double = 0.5,
      maxDf: Int = 256): DataFrame =
    jaccardPairs(cachedShingles(spark, d), threshold, maxDf)

  /** Pair mining over a `(doc_id, shingle)` index. `maxDf` caps shingle
    * document frequency: a boilerplate shingle shared by k docs would emit
    * k²/2 pairs inside ONE task (license headers / navigation chrome reach
    * k≈10⁶ at web scale → 5·10¹¹ pairs), so shingles above the cap are
    * excluded from candidate generation — the standard stop-shingle rule in
    * near-dup mining. Doc sizes |A|,|B| still count ALL shingles, so the cap
    * only loses intersection evidence from ubiquitous (uninformative)
    * shingles; it never inflates a score. The oracle SQL applies the same
    * cap, keeping the operator exactly checkable.
    */
  def jaccardPairs(sh: DataFrame, threshold: Double, maxDf: Int): DataFrame =
    minedPairsWithSizes(sh, maxDf)
      .withColumn("jaccard",
        col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("n_common"), col("jaccard"))
      .orderBy("a", "b")

  /** The shared pair-mining core: `(a, b, n_common, n_a, n_b)` with a < b.
    * Pair generation via the inverted index: group docs per shingle, DROP
    * singleton shingles early (the vast majority) and hot shingles past
    * maxDf, then explode ordered doc pairs within each group. One shuffle
    * on the shingle, never a quadratic doc-pair join. Doc sizes count ALL
    * shingles (the cap only drops intersection evidence — see
    * [[jaccardPairs]]' stop-shingle note).
    */
  private def minedPairsWithSizes(sh: DataFrame, maxDf: Int): DataFrame = {
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val inter = sh.groupBy("shingle").agg(collect_list(col("doc_id")).as("ds"))
      .filter(size(col("ds")).between(2, maxDf))
      .select(explode(expr(
        "flatten(transform(ds, (x, i) -> transform(slice(ds, i + 2, size(ds)), " +
          "y -> struct(least(x, y) as a, greatest(x, y) as b))))")).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("n_common"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "a").withColumnRenamed("n_sh", "n_a"), "a")
      .join(sizes.withColumnRenamed("doc_id", "b").withColumnRenamed("n_sh", "n_b"), "b")
  }

  /** ASYMMETRIC containment pairs — the quote/excerpt detector symmetric
    * Jaccard is blind to: a short doc fully embedded in a much longer one
    * scores `|A|/|B| ≈ 0` on Jaccard but `n_common/min(|A|,|B|) ≈ 1` on
    * containment (the same asymmetry [[sourceOverlap]] exploits at source
    * granularity, here per doc pair). For each mined pair the CONTAINED
    * side is the smaller shingle set (ties → smaller id), and the score is
    * the exact integer `n_common·10⁶ div n_contained` — oracle-stable.
    * Same inverted-index mining as [[jaccardPairs]], same stop-shingle
    * cap; a contained doc whose evidence lives in capped shingles is the
    * cap's documented false-negative trade, identical on both engines.
    */
  def containmentPairs(spark: SparkSession, d: String,
      thresholdPpm: Long = 900000L, maxDf: Int = 256): DataFrame =
    containmentPairsOf(cachedShingles(spark, d), thresholdPpm, maxDf)

  /** [[containmentPairs]] over a caller-supplied shingle index. */
  def containmentPairsOf(sh: DataFrame,
      thresholdPpm: Long, maxDf: Int): DataFrame =
    minedPairsWithSizes(sh, maxDf)
      .withColumn("contained",
        when(col("n_a") < col("n_b") ||
          (col("n_a") === col("n_b") && col("a") < col("b")), col("a"))
          .otherwise(col("b")))
      .withColumn("container",
        when(col("contained") === col("a"), col("b")).otherwise(col("a")))
      .withColumn("n_contained_sh", least(col("n_a"), col("n_b")))
      .withColumn("cont_ppm",
        expr("(n_common * 1000000) div n_contained_sh"))
      .filter(col("cont_ppm") >= thresholdPpm)
      .select(col("contained"), col("container"), col("n_common"),
        col("n_contained_sh"), col("cont_ppm"))
      .orderBy("contained", "container")

  /** MinHash signatures: k universal-hash functions over xxhash64 shingle
    * hashes, `min((a_i * h + b_i) mod p)` per doc.
    *
    * NARROW, like [[shingles]]: a doc's signature is a fold over its own
    * shingle set, so it is computed in the same task-local pass — the former
    * shape (64 min-aggregates grouped over the exploded shingle index) paid
    * a full-index shuffle for a per-row computation. Docs with no shingles
    * (< n words) emit no signature, matching the groupBy semantics.
    */
  def minhashSignatures(docs: DataFrame, k: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val p = 2147483647L // 2^31 - 1, Mersenne prime
    val rnd = new scala.util.Random(42)
    val coeffs: Array[(Long, Long)] =
      Array.fill(k)((1 + rnd.nextInt(Int.MaxValue - 1)).toLong ->
        rnd.nextInt(Int.MaxValue).toLong)
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        val hs = if (text == null) Array.emptyLongArray else shingleHashes(text, 5)
        if (hs.isEmpty) None
        else {
          val sig = new Array[Long](k)
          var i = 0
          while (i < k) {
            val (a, b) = coeffs(i)
            var mn = Long.MaxValue
            var j = 0
            while (j < hs.length) {
              val h = jpmod(hs(j), p)
              val v = jpmod(a * h + b, p)
              if (v < mn) mn = v
              j += 1
            }
            sig(i) = mn
            i += 1
          }
          Some((id, sig))
        }
      }
      .toDF("doc_id", "sig")
  }

  /** Positive mod on longs, same as the SQL `((c % m) + m) % m`. */
  private def jpmod(c: Long, m: Long): Long = ((c % m) + m) % m

  /** MinHash + LSH banding: signatures split into `bands` bands of `rowsPer`
    * rows; docs sharing any band bucket become candidates; candidates are
    * verified with estimated Jaccard = fraction of equal signature slots.
    * The shuffle key is the (band, bucket-hash) — candidate generation never
    * materializes the full pair space.
    */
  def minhashLsh(
      spark: SparkSession,
      d: String,
      bands: Int = 16,
      rowsPer: Int = 4,
      threshold: Double = 0.5,
      maxBucket: Int = 4096): DataFrame = {
    val k = bands * rowsPer
    val sigs = Memo(spark, s"minhashsigs|$d|$k") {
      minhashSignatures(Tables.documents(spark, d), k).persist()
    }
    val banded0 = sigs.select(col("doc_id"), col("sig"),
      posexplode(expr(s"transform(sequence(0, ${bands - 1}), b -> " +
        s"hash(slice(sig, b * $rowsPer + 1, $rowsPer)))")).as(Seq("band", "bucket")))
    // Hot-bucket guard: a degenerate bucket of k docs emits k² join rows in
    // one task; prune buckets past maxBucket (and singletons, which cannot
    // pair) with a semi-join BEFORE the self-join.
    val banded = keepPairableBuckets(banded0, Seq("band", "bucket"), maxBucket)
    val l = banded.select(col("band"), col("bucket"), col("doc_id").as("a"), col("sig").as("sig_a"))
    val r = banded.select(col("band"), col("bucket"), col("doc_id").as("b"), col("sig").as("sig_b"))
    // persisted (session-memoized): the surviving-candidate frame feeds BOTH
    // the output and the exact-jaccard evidence join below — unpersisted,
    // the whole band-join + distinct pipeline would execute once per branch
    val cand = Memo(spark, s"minhashcand|$d|$bands|$rowsPer|$threshold|$maxBucket") {
      // filter early, dedup late (the ANN probe discipline): est_jaccard is
      // identical across a pair's band co-occurrences (same signatures), so
      // estimate per co-occurrence and dedup only the few survivors — the
      // previous distinct-first form shuffled BOTH 64-int signature arrays
      // through the pair-space exchange just to save re-running a 64-element
      // zip_with on duplicates
      l.join(r, Seq("band", "bucket"))
        .filter(col("a") < col("b"))
        .withColumn("est_jaccard",
          expr(s"size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), t -> t))") //
            .cast("double") / lit(k.toDouble))
        .filter(col("est_jaccard") >= threshold)
        .select(col("a"), col("b"), col("est_jaccard"))
        .distinct()
        .persist()
    }
    // Self-checking invariant column for the driver artifact: the EXACT
    // shingle jaccard of each emitted candidate, floor-scaled e6. Computed
    // only for the bounded surviving pair list (joined against the shingle
    // index on the doc keys — never a second full pair mine), so the cost
    // scales with the candidate count, not the corpus. Evidence that the
    // sketch pairs genuinely overlap, checkable without running Spark.
    val sh = cachedShingles(spark, d)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val inter = cand.select(col("a"), col("b"))
      .join(sh.select(col("doc_id").as("a"), col("shingle")), "a")
      .join(sh.select(col("doc_id").as("b"), col("shingle")), Seq("b", "shingle"))
      .groupBy("a", "b").agg(count(lit(1)).as("n_common"))
    cand
      .join(inter, Seq("a", "b"), "left_outer")
      .join(sizes.select(col("doc_id").as("a"), col("n_sh").as("n_a")), "a")
      .join(sizes.select(col("doc_id").as("b"), col("n_sh").as("n_b")), "b")
      .withColumn("exact_jaccard_e6",
        floor(coalesce(col("n_common"), lit(0L)).cast("double") * lit(1000000.0) /
          (col("n_a") + col("n_b") - coalesce(col("n_common"), lit(0L))).cast("double"))
          .cast("long"))
      .select(col("a"), col("b"), col("est_jaccard"), col("exact_jaccard_e6"))
      .orderBy("a", "b")
  }

  /** 64-bit SimHash per document: sign-sum of per-token 64-bit hashes
    * (Spark-compatible xxhash64, seed 42), bit-majority folded into a
    * fingerprint.
    *
    * Computed as a NARROW typed map, not explode+groupBy: simhash is a
    * per-document fold, so exploding tokens only to re-group them paid a
    * token-count-sized shuffle with 64 aggregate columns for something each
    * task can do locally in one pass. Memoized per session — both the
    * fingerprint query and the pair miner read the same persisted frame.
    */
  def simhashFingerprints(spark: SparkSession, d: String): DataFrame =
    Memo(spark, s"simhash|$d") {
      import spark.implicits._
      Tables.documents(spark, d)
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .mapPartitions { it =>
          it.flatMap { case (id, text) =>
            val counts = new Array[Int](64)
            var nTok = 0
            // tokenization parity with split(trim(text), " ") + non-empty filter
            if (text != null) text.trim.split(" ").foreach { tok =>
              if (tok.nonEmpty) {
                nTok += 1
                val bytes = tok.getBytes(java.nio.charset.StandardCharsets.UTF_8)
                val h = org.apache.spark.sql.catalyst.expressions.XXH64
                  .hashUnsafeBytes(bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
                    bytes.length, 42L)
                var i = 0
                while (i < 64) {
                  if (((h >> i) & 1L) == 1L) counts(i) += 1 else counts(i) -= 1
                  i += 1
                }
              }
            }
            // zero-token or null docs emit NO row — the groupBy semantics of
            // the original explode-based shape (they had no exploded tokens)
            if (nTok == 0) None
            else {
              var fp = 0L
              var i = 0
              while (i < 64) { if (counts(i) > 0) fp |= (1L << i); i += 1 }
              Some((id, fp))
            }
          }
        }
        .toDF("doc_id", "simhash")
        .persist()
    }

  def simhash(spark: SparkSession, d: String): DataFrame =
    simhashFingerprints(spark, d).orderBy("doc_id")

  /** SimHash near-dup candidates: pairs within `maxHamming` bits, banded on
    * 16-bit chunks (a pair within hamming 3 shares at least one of 4 chunks).
    */
  def simhashPairs(
      spark: SparkSession,
      d: String,
      maxHamming: Int = 3,
      maxBucket: Int = 4096): DataFrame =
    hammingPairs64(
      simhashFingerprints(spark, d)
        .select(col("doc_id").as("id"), col("simhash").as("fp")),
      maxHamming, maxBucket)
      .orderBy("a", "b")

  /** Banded Hamming pair mining over ANY 64-bit fingerprint frame — the
    * candidate-generation core shared by [[simhashPairs]] (text) and
    * [[graft.multimodal.ImageDedup.imageDedupPairs]] (perceptual image
    * hash). Bands the fingerprint into 4 disjoint 16-bit chunks: a pair
    * within hamming 3 differs in at most 3 chunks, so by pigeonhole it
    * SHARES at least one — candidate generation is COMPLETE for
    * `maxHamming <= 3` (the require), which is what lets a DuckDB all-pairs
    * oracle certify the banded plan's output exactly.
    *
    * Scale shape: the self-join runs per (chunk, chunk_val) bucket —
    * singleton buckets (the majority) are pruned and hot buckets capped
    * before the join squares them ([[keepPairableBuckets]]); nothing is
    * ever all-pairs across the corpus.
    *
    * @param fps (id BIGINT, fp BIGINT) — one 64-bit fingerprint per id
    * @return (a, b, hamming) with a < b and hamming <= maxHamming, unordered
    */
  private[graft] def hammingPairs64(
      fps: DataFrame, maxHamming: Int, maxBucket: Int): DataFrame = {
    require(maxHamming <= 3,
      s"4x16-bit banding is only pigeonhole-complete for hamming <= 3, got $maxHamming")
    val banded0 = fps.select(col("id"), col("fp"),
      posexplode(expr("transform(sequence(0, 3), c -> (fp >> (c * 16)) & 65535)"))
        .as(Seq("chunk", "chunk_val")))
    // hot-bucket guard as in minhashLsh (a 16-bit chunk value shared by a
    // boilerplate cluster would otherwise square inside one task)
    val banded = keepPairableBuckets(banded0, Seq("chunk", "chunk_val"), maxBucket)
    val l = banded.select(col("chunk"), col("chunk_val"), col("id").as("a"), col("fp").as("fp_a"))
    val r = banded.select(col("chunk"), col("chunk_val"), col("id").as("b"), col("fp").as("fp_b"))
    l.join(r, Seq("chunk", "chunk_val"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"), col("fp_a"), col("fp_b"))
      .distinct()
      .withColumn("hamming", bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("a"), col("b"), col("hamming"))
  }

  /** PROBE form of the 4x16-bit banding: candidates for each PROBE
    * fingerprint among the INDEX fingerprints — the admission-time shape
    * ([[hammingPairs64]] mines pairs within one frame; this joins two).
    * Pigeonhole-complete for `maxHamming <= 3` like the pair miner
    * PROVIDED no index band-bucket exceeds `maxBucket`: hot buckets are
    * CAPPED (deterministic keep-lowest-ids) because a boilerplate band
    * value would otherwise multiply every probe row by the whole cluster —
    * the web-scale insurance bound that deliberately trades completeness
    * inside a pathological bucket for bounded work. The oracled caller's
    * spec guards the gap (ImageDedupSpec asserts the corpus's worst bucket
    * sits far under the cap, so the DuckDB brute-force comparison stays
    * exact; a testdata generation that grows a hot bucket trips the spec
    * before it could silently diverge from the oracle). Index singletons
    * stay: unlike pair mining, a lone index row is exactly what a probe
    * wants to find.
    *
    * @param probe (id, fp) probe-side fingerprints
    * @param idx   (id, fp) index-side fingerprints
    * @return (qid, cid, hamming) with hamming <= maxHamming, unordered
    */
  private[graft] def hammingProbe64(probe: DataFrame, idx: DataFrame,
      maxHamming: Int, maxBucket: Int): DataFrame = {
    require(maxHamming <= 3,
      s"4x16-bit banding is only pigeonhole-complete for hamming <= 3, got $maxHamming")
    def bands(df: DataFrame) = df.select(col("id"), col("fp"),
      posexplode(expr("transform(sequence(0, 3), c -> (fp >> (c * 16)) & 65535)"))
        .as(Seq("chunk", "chunk_val")))
    val p = bands(probe).select(col("chunk"), col("chunk_val"),
      col("id").as("qid"), col("fp").as("fp_q"))
    val cw = Window.partitionBy(col("chunk"), col("chunk_val")).orderBy(col("id"))
    val i = bands(idx)
      .withColumn("rn", row_number().over(cw)).filter(col("rn") <= maxBucket)
      .select(col("chunk"), col("chunk_val"), col("id").as("cid"), col("fp").as("fp_c"))
    p.join(i, Seq("chunk", "chunk_val"))
      .select(col("qid"), col("cid"), col("fp_q"), col("fp_c"))
      .distinct()
      .withColumn("hamming", bit_count(col("fp_q").bitwiseXOR(col("fp_c"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("qid"), col("cid"), col("hamming"))
  }

  /** Near-dup CLUSTERS: connected components over the jaccard pair graph,
    * labeled by the minimum doc_id in each component — the principled
    * canonical-selection step (pairwise "drop b" misses transitive chains
    * a~b, b~c where (a,c) never met a shingle). Iterative min-label
    * propagation over the EDGE set only (pairs, not docs — orders of
    * magnitude smaller than the corpus), converging in O(component diameter)
    * rounds; near-dup components are shallow in practice, and `maxIters`
    * bounds the worst case. Each round is one groupBy on the edge key.
    */
  def dupClusters(spark: SparkSession, d: String,
      threshold: Double = 0.5, maxIters: Int = 20): DataFrame =
    Memo(spark, s"dupclusters|$d|$threshold|$maxIters") {
      // clusterPairs already returns a persisted, materialized frame
      clusterPairs(ngramJaccard(spark, d, threshold).select(col("a"), col("b")), maxIters)
    }

  /** Min-label connected components over an (a, b) edge frame.
    *
    * Two execution paths on purpose: the edge set is the NEAR-DUP PAIR list
    * — orders of magnitude smaller than the corpus — so up to `localLimit`
    * edges it is collected once and solved with driver-side union-find
    * (milliseconds, one job, exact). The default limit is sized for a small
    * driver heap (~200k boxed edges ≈ tens of MB incl. the union-find map).
    * Past the limit it falls back to the distributed min-label +
    * pointer-jumping loop, whose per-round actions cost ~10 small jobs —
    * the right trade only when the graph is genuinely big. The probe runs
    * against the PERSISTED pair frame, so an over-limit probe leaves the
    * scanned partitions cached rather than recomputing the pair pipeline.
    * Both paths produce identical labels (min doc_id per component).
    */
  def clusterPairs(pairDf: DataFrame, maxIters: Int = 20,
      localLimit: Int = 200000): DataFrame = {
    val spark = pairDf.sparkSession
    import spark.implicits._
    val pairs = pairDf.as[(Long, Long)].persist()
    val probe = pairs.take(localLimit + 1)
    if (probe.length <= localLimit) {
      val out = localComponents(spark, probe)
      pairs.unpersist()
      return out
    }
    // adjacency both ways + self-loop carries each node's own label
    val edges = pairs.flatMap { case (a, b) => Seq((a, b), (b, a), (a, a), (b, b)) }
      .toDF("node", "nbr").distinct().persist()
    var labels = edges.select(col("node")).distinct()
      .withColumn("lbl", col("node")).persist()
    var converged = false
    var it = 0
    while (!converged && it < maxIters) {
      // min over neighborhood labels (including own, via the self-loop)...
      val propagated = edges
        .join(labels.withColumnRenamed("node", "nbr"), "nbr")
        .groupBy("node").agg(min(col("lbl")).as("lbl"))
      // ...then POINTER JUMP: follow lbl → lbl's own label. Plain propagation
      // needs O(component diameter) rounds — a 25-doc sliding-boilerplate
      // chain would exceed maxIters and silently mislabel; jumping halves
      // chain depth per round, so convergence is O(log diameter) and 20
      // rounds cover any realistic component. (Every lbl is a node id and
      // every node appears in `propagated` via its self-loop, so the inner
      // join is total.)
      val parents = propagated.select(col("node").as("p_node"), col("lbl").as("p_lbl"))
      val next = propagated.join(parents, col("lbl") === col("p_node"))
        .select(col("node"), col("p_lbl").as("lbl"))
        .persist()
      val changed = next.join(labels.withColumnRenamed("lbl", "old"), "node")
        .filter(col("lbl") =!= col("old")).limit(1).count()
      labels.unpersist() // superseded frame; keeps long chains from piling cache
      labels = next
      converged = changed == 0
      it += 1
    }
    require(converged, s"component labeling did not converge in $maxIters rounds")
    // materialize the verdict, then release every internal cache — callers
    // get a small computed frame, not a live dependency on loop caches
    val out = labels.select(col("node").as("doc_id"), col("lbl").as("cluster_id"))
      .orderBy("doc_id").persist()
    out.count()
    labels.unpersist()
    edges.unpersist()
    pairs.unpersist()
    out
  }

  /** Driver-side union-find (path compression, min-id roots). */
  private def localComponents(
      spark: SparkSession, edges: Array[(Long, Long)]): DataFrame = {
    import spark.implicits._
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a)
      parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb } // min root wins
    }
    parent.keys.toSeq.sorted
      .map(n => (n, find(n)))
      .toDF("doc_id", "cluster_id")
      .orderBy("doc_id")
  }

  /** Keep only LSH buckets that can produce pairs and are below the blow-up
    * cap: bucket size in [2, maxBucket]. One aggregate on the bucket key +
    * a broadcast-able semi-join; prunes singleton buckets (the majority)
    * before the self-join as a bonus.
    */
  private def keepPairableBuckets(
      banded: DataFrame, keys: Seq[String], maxBucket: Int): DataFrame = {
    val ok = banded.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_in_bucket"))
      .filter(col("n_in_bucket").between(2, maxBucket))
      .select(keys.map(col): _*)
    banded.join(ok, keys, "left_semi")
  }
}
