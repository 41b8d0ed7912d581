package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM-data pipelines over `documents`
  * (BASELINE.json north star): token counting, quality scoring, language ID,
  * fingerprinting. All are narrow per-row transforms (codegen'd built-ins, no
  * UDFs) — they scan, never shuffle, so they scale linearly with input splits.
  */
object TextOps {

  /** Count regex-token occurrences (word-boundary-safe). */
  private def reCount(c: Column, pattern: String): Column =
    size(regexp_extract_all(c, lit(pattern), lit(0))).cast("long")

  /** All text counters in ONE codegen'd pass over each document
    * ([[graft.functions.TextScan]]) — replaces 4-6 independent
    * `regexp_extract_all` walks (each of which also materialized an array of
    * match strings). The DuckDB oracle still computes the same fields with
    * the original regexes; TextScanSpec pins scanner==regex per field.
    */
  private def scanned(spark: SparkSession, d: String) =
    Tables.documents(spark, d)
      .withColumn("ts", graft.functions.TextFunctions.text_scan(col("text")))

  /** Token counting + quality heuristics: length/stopword/punctuation ratios
    * (the formulas are plain double arithmetic so the DuckDB oracle is
    * bit-identical).
    */
  def textStats(spark: SparkSession, d: String): DataFrame =
    scanned(spark, d)
      .select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars_actual"),
        col("ts.n_tokens").as("n_tokens"),
        // BPE-ish segmentation (GPT-2-flavored, RE2-safe: no lookahead)
        col("ts.n_bpe_tokens").as("n_bpe_tokens"),
        col("ts.n_stop").as("n_stop"),
        col("ts.n_punct").as("n_punct"))
      .withColumn("stop_ratio",
        col("n_stop").cast("double") / greatest(col("n_tokens"), lit(1L)).cast("double"))
      .withColumn("quality_score", qualityScore(col("n_tokens"), col("n_stop")))
      .orderBy("doc_id")

  /** THE quality-score formula — the single definition behind text_stats,
    * the threshold sweep, and the source matrix (their oracles and the
    * floor-bucket identity all assume bit-identical doubles, so the
    * expression must never fork). Plain IEEE double arithmetic, identical
    * operation order to the DuckDB mirrors.
    */
  private def qualityScore(nTokens: Column, nStop: Column): Column =
    least(nTokens.cast("double") / lit(100.0), lit(1.0)) * lit(0.6) +
      (nStop.cast("double") / greatest(nTokens, lit(1L)).cast("double")) * lit(0.4)

  /** Retention sweep over the [[textStats]] quality score: for each
    * threshold t/10 (t = 0..10), how many documents and tokens survive
    * `quality_score ≥ t/10` — the curve read before picking a production
    * cut-off, produced in ONE corpus scan instead of eleven. Uses the
    * floor-bucket identity `floor(10·score) ≥ t ⟺ score ≥ t/10` (t
    * integer), so the scan aggregates to ≤11 bucket rows and the sweep
    * itself — an 11×11 spine join + suffix sums — is corpus-size-
    * independent. The score doubles are bit-identical cross-engine (the
    * text_stats hash-match proves it), so the floor buckets are too;
    * retention shares are integral-`div` ppm per the parity rules.
    */
  def qualityThresholdSweep(spark: SparkSession, d: String): DataFrame = {
    val perBucket = scanned(spark, d)
      .select(col("ts.n_tokens").as("n_tokens"),
        qualityScore(col("ts.n_tokens"), col("ts.n_stop")).as("quality_score"))
      .withColumn("bucket", floor(col("quality_score") * lit(10.0)).cast("long"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).cast("long").as("n_toks"))
    val totals = perBucket.agg(
      sum(col("n_docs")).cast("long").as("total_docs"),
      sum(col("n_toks")).cast("long").as("total_tokens"))
    spark.range(0, 11).toDF("thr_e1")
      .join(perBucket, col("bucket") >= col("thr_e1"), "left")
      .groupBy(col("thr_e1"))
      .agg(coalesce(sum(col("n_docs")), lit(0L)).cast("long").as("docs_kept"),
        coalesce(sum(col("n_toks")), lit(0L)).cast("long").as("tokens_kept"))
      .crossJoin(broadcast(totals))
      .select(col("thr_e1"), col("docs_kept"), col("tokens_kept"),
        expr("docs_kept * 1000000 div total_docs").as("docs_kept_ppm"),
        expr("tokens_kept * 1000000 div total_tokens").as("tokens_kept_ppm"))
      .orderBy("thr_e1")
  }

  /** Quality-by-source matrix: per (source, quality-decile-bucket) document
    * and token counts with integral-`div` ppm shares of the source's totals
    * — the "where does each source's mass sit on the quality axis" view
    * that decides per-source mixture reweighting (a source whose tokens
    * concentrate in the bottom buckets gets downweighted before a source
    * whose tail does). Same floor-bucket derivation as
    * [[qualityThresholdSweep]]; the share windows run over the
    * sources×11-row aggregated frame, never the corpus.
    */
  def qualitySourceMatrix(spark: SparkSession, d: String): DataFrame = {
    val bySrc = Window.partitionBy(col("source"))
    scanned(spark, d)
      .select(col("source"), col("ts.n_tokens").as("n_tokens"),
        qualityScore(col("ts.n_tokens"), col("ts.n_stop")).as("quality_score"))
      .withColumn("bucket", floor(col("quality_score") * lit(10.0)).cast("long"))
      .groupBy(col("source"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).cast("long").as("n_toks"))
      .withColumn("src_docs", sum(col("n_docs")).over(bySrc))
      .withColumn("src_toks", sum(col("n_toks")).over(bySrc))
      .select(col("source"), col("bucket"), col("n_docs"), col("n_toks"),
        expr("n_docs * 1000000 div src_docs").as("docs_ppm"),
        expr("n_toks * 1000000 div src_toks").as("toks_ppm"))
      .orderBy("source", "bucket")
  }

  /** N-gram-marker language ID heuristic: argmax of per-language marker-token
    * counts with deterministic tie-breaking (en > de > es > fr).
    */
  def langId(spark: SparkSession, d: String): DataFrame =
    scanned(spark, d)
      .select(col("doc_id"), col("lang").as("labeled_lang"),
        col("ts.s_en").as("s_en"), col("ts.s_de").as("s_de"),
        col("ts.s_es").as("s_es"), col("ts.s_fr").as("s_fr"))
      .withColumn("predicted_lang",
        when(col("s_en") >= col("s_de") && col("s_en") >= col("s_es") && col("s_en") >= col("s_fr"), "en")
          .when(col("s_de") >= col("s_es") && col("s_de") >= col("s_fr"), "de")
          .when(col("s_es") >= col("s_fr"), "es")
          .otherwise("fr"))
      .orderBy("doc_id")

  /** Corpus-level rollup by labeled language: doc counts and exact token /
    * char / punctuation sums — the "what is in this corpus" summary every
    * training-data pipeline reports. One partial+final hash aggregation over
    * the fused [[graft.functions.TextScan]] counters (BIGINT sums per the
    * oracle parity rules; no doubles).
    */
  def corpusStats(spark: SparkSession, d: String): DataFrame =
    scanned(spark, d)
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(length(col("text")).cast("long")).cast("long").as("total_chars"),
        sum(col("ts.n_tokens")).cast("long").as("total_tokens"),
        sum(col("ts.n_bpe_tokens")).cast("long").as("total_bpe_tokens"),
        sum(col("ts.n_punct")).cast("long").as("total_punct"))
      .orderBy("lang")

  /** Normalized-content fingerprint (md5 of lowercased, whitespace-collapsed
    * text) — the exact-dedup key.
    */
  def fingerprintCol: Column =
    md5(trim(regexp_replace(lower(col("text")), "\\s+", " ")))

  def docFingerprint(spark: SparkSession, d: String): DataFrame =
    Tables.documents(spark, d)
      .select(col("doc_id"), fingerprintCol.as("fingerprint"),
        length(col("text")).cast("long").as("n_chars_actual"))
      .orderBy("doc_id")

  /** Gopher-style document quality rules (Rae et al. 2021 §A1.1, as used in
    * public pipelines like Dolma): word-count bounds, mean word length,
    * symbol-to-word ratio, stop-word presence. Pure per-row arithmetic over
    * regex counts — narrow, codegen'd, oracle-exact (the `keep` verdict is
    * exported as 0/1 BIGINT; booleans print differently across engines).
    */
  def qualityFilter(spark: SparkSession, d: String): DataFrame =
    scanned(spark, d)
      .select(
        col("doc_id"),
        col("ts.n_tokens").as("n_words"),
        // summed word length for the mean-word-length rule
        col("ts.n_word_chars").as("n_word_chars"),
        col("ts.n_stop").as("n_stop"),
        col("ts.n_punct").as("n_punct"))
      .withColumn("mean_word_len",
        col("n_word_chars").cast("double") / greatest(col("n_words"), lit(1L)).cast("double"))
      .withColumn("symbol_ratio",
        col("n_punct").cast("double") / greatest(col("n_words"), lit(1L)).cast("double"))
      .withColumn("keep",
        (col("n_words").between(50L, 100000L) &&
          col("mean_word_len").between(3.0, 10.0) &&
          col("symbol_ratio") < 0.1 &&
          col("n_stop") >= 2L).cast("long"))
      .orderBy("doc_id")

  /** Regex PII redaction (emails, IPv4, US-style phone numbers): replaced
    * with typed placeholders; per-kind match counts ride along. The redacted
    * text is exported as its md5 (keeps the oracle row narrow). Narrow
    * per-row transform — at 100 TB this is a pure scan.
    */
  def redactPii(spark: SparkSession, d: String): DataFrame =
    redactPiiDocs(Tables.documents(spark, d))

  def redactPiiDocs(docs: DataFrame): DataFrame = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val ipv4 = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
    val phone = "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b"
    docs
      .select(
        col("doc_id"),
        reCount(col("text"), email).as("n_emails"),
        reCount(col("text"), ipv4).as("n_ips"),
        reCount(col("text"), phone).as("n_phones"),
        regexp_replace(
          regexp_replace(
            regexp_replace(col("text"), lit(email), lit("[EMAIL]")),
            lit(ipv4), lit("[IP]")),
          lit(phone), lit("[PHONE]")).as("redacted"))
      .select(col("doc_id"), col("n_emails"), col("n_ips"), col("n_phones"),
        md5(col("redacted")).as("redacted_md5"))
      .orderBy("doc_id")
  }

  /** End-to-end corpus curation (the composition a training-data pipeline
    * actually runs): quality filter → exact dedup (keep lowest doc_id per
    * fingerprint) → near-dup removal (drop the higher id of every
    * jaccard-over-threshold pair). Deterministic, so the whole pipeline is
    * oracle-checkable. Each stage is a set op on doc_id: the joins are on a
    * single long key and the near-dup loser side is tiny (pairs only).
    */
  def curateCorpus(spark: SparkSession, d: String): DataFrame = {
    val quality = qualityFilter(spark, d).filter(col("keep") === 1L).select("doc_id")
    val keptExact = Dedup.exact(spark, d).select(col("canonical_id").as("doc_id"))
    val nearDupLosers = Dedup.ngramJaccard(spark, d).select(col("b").as("doc_id")).distinct()
    quality
      .join(keptExact, Seq("doc_id"), "left_semi")
      .join(nearDupLosers, Seq("doc_id"), "left_anti")
      .orderBy("doc_id")
  }

  /** Contamination-safe train/test split: a near-duplicate of a training
    * document leaking into the test split invalidates evaluation, so the
    * split key is the near-dup CLUSTER id (every member of a component lands
    * on the same side), with singletons keyed by their own doc_id. The
    * bucket is Knuth multiplicative hashing in exact BIGINT arithmetic —
    * deterministic and identical in any engine (no RNG, no float). The id is
    * reduced mod 2^31 BEFORE the multiply so the product stays below 2^63
    * for any 64-bit id (2^31 · 2654435761 < 2^63) — without the reduction,
    * ids past ~3.5e9 would overflow (ANSI error / engine-divergent wrap).
    */
  /** The ONE definition of the exact-integer Knuth bucket (0..99) used by
    * every deterministic-assignment operator ([[trainTestSplit]],
    * [[stratifiedSample]]) — a drifted copy would silently diverge from the
    * oracle's formulation of the same arithmetic.
    */
  private[ops] def knuthBucket(id: Column, modulus: Long = 100L): Column =
    pmod(pmod(pmod(id, lit(2147483648L)) * lit(2654435761L),
      lit(4294967296L)), lit(modulus))

  def trainTestSplit(spark: SparkSession, d: String, trainPct: Int = 90): DataFrame = {
    val clusters = Dedup.dupClusters(spark, d)
    Tables.documents(spark, d)
      .select(col("doc_id"))
      .join(clusters, Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
      .withColumn("bucket", knuthBucket(col("cluster_id")))
      .withColumn("split", when(col("bucket") < trainPct, "train").otherwise("test"))
      .select(col("doc_id"), col("cluster_id"), col("bucket"), col("split"))
      .orderBy("doc_id")
  }

  /** Deterministic per-epoch training order — the global-shuffle step every
    * epoch of a training run needs, in the two-level form that survives
    * 100 TB: each (epoch, doc) gets an md5 shuffle key, documents are
    * SHARDED by the key's first hex digit, and the order within a shard is
    * the key order. A data loader replays epoch `e` as shards round-robin
    * (or in any order) reading each shard by `pos` — the standard
    * shard-shuffle + intra-shard-order layout (what sharded dataset formats
    * do on disk).
    *
    * Why not ONE global row_number: a window ordered over the whole corpus
    * is a single-partition sort — the textbook scale-killer. Here every
    * window partition is (epoch, shard), so the sort parallelism is
    * epochs x nShards and each task sorts corpus/nShards rows; production
    * widens the shard key to more hex digits (2 -> 256 shards, 4 -> 65k)
    * as the corpus grows. No RNG anywhere: re-running any epoch on any
    * cluster yields the identical order (md5 has one implementation
    * everywhere — the same cross-engine argument as [[knuthBucket]], with
    * string output instead of modular arithmetic, which is what lets the
    * DuckDB oracle replay the full shuffle hash-for-hash).
    */
  def epochShuffle(spark: SparkSession, d: String, epochs: Int = 2): DataFrame = {
    require(epochs >= 1, "need at least one epoch")
    val w = Window.partitionBy(col("epoch"), col("shard"))
      .orderBy(col("skey"), col("doc_id"))
    Tables.documents(spark, d)
      .select(col("doc_id"))
      .withColumn("epoch", explode(sequence(lit(0L), lit(epochs - 1L))))
      .withColumn("skey", md5(concat_ws(":", lit("ep"), col("epoch"), col("doc_id"))))
      .withColumn("shard",
        (instr(lit("0123456789abcdef"), substring(col("skey"), 1, 1)) - 1).cast("long"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col("epoch"), col("shard"), col("pos"), col("doc_id"))
      .orderBy("epoch", "shard", "pos")
  }

  /** Deterministic stratified sampling — eval-set construction at corpus
    * scale: per-stratum (language) keep-rates, applied through the same
    * exact-integer Knuth hash as [[trainTestSplit]] (mod-2^31 pre-reduction,
    * see that scaladoc for the overflow argument). No RNG anywhere, so the
    * sample is reproducible across engines, runs, and cluster sizes — the
    * property an eval set needs and `df.sample()` cannot give. Narrow: one
    * scan, a per-row hash, a filter.
    */
  def stratifiedSample(spark: SparkSession, d: String,
      ratesPct: Map[String, Int] = Map("en" -> 50, "de" -> 25, "es" -> 25, "fr" -> 25),
      defaultPct: Int = 10): DataFrame = {
    val rate = ratesPct.foldLeft(lit(defaultPct): Column) {
      case (acc, (lang, pct)) => when(col("lang") === lang, lit(pct)).otherwise(acc)
    }
    Tables.documents(spark, d)
      .select(col("doc_id"), col("lang"))
      .withColumn("bucket", knuthBucket(col("doc_id")))
      .filter(col("bucket") < rate)
      .orderBy("doc_id")
  }

  /** Per-SOURCE (domain) curation cap — the missing curation axis every
    * public pipeline has (C4 caps per-domain contribution, RefinedWeb §3.1
    * dedups and limits by domain, Gopher §A1 reports per-source mixing): no
    * single source may contribute more than `cap` documents. Each doc gets a
    * deterministic per-source priority from the shared exact-integer
    * [[knuthBucket]] hash — the "random" cap sample is reproducible across
    * engines, runs, and cluster sizes, no RNG — and the cap keeps the `cap`
    * lowest (priority, doc_id) per source.
    *
    * Scale shape: only KEPT rows are returned, so the ranking window carries
    * a `rank <= cap` gate that WindowGroupLimit prunes MAP-SIDE — each task
    * forwards at most `cap` rows per source before the shuffle, bounding
    * exchange volume by cap · n_sources · n_tasks regardless of how skewed
    * the domain distribution is. An all-ranks variant would shuffle the
    * whole corpus into one partition per domain — the classic web-crawl
    * skew trap (a handful of giant domains own most of the data).
    */
  def sourceCaps(spark: SparkSession, d: String, cap: Int = 20): DataFrame =
    sourceCapsDocs(Tables.documents(spark, d), cap)

  def sourceCapsDocs(docs: DataFrame, cap: Int): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("pri"), col("doc_id"))
    docs
      .select(col("doc_id"), col("source"))
      .withColumn("pri", knuthBucket(col("doc_id"), 4294967296L))
      .withColumn("src_rank", row_number().over(w).cast("long"))
      .filter(col("src_rank") <= cap)
      .select(col("doc_id"), col("source"), col("src_rank"))
      .orderBy("doc_id")
  }

  /** DISTRIBUTION-RELATIVE length curation — trim each language's bottom
    * and top token-count decile (Gopher §A1.1 does this with absolute
    * bounds; production multilingual pipelines use per-language RELATIVE
    * cuts because "too short" in Chinese is not "too short" in German).
    * Thresholds are EXACT integer value-at-rank percentiles per language
    * via [[DistributedSelect.exactGroupPercentiles]] (no whole-language
    * sort task — the same selection core as `revenue_percentiles`), then
    * one broadcast join applies the verdict; every doc exports its
    * language's thresholds and a 0/1 `keep`.
    *
    * Scale shape: the Memo-persisted 3-column (doc_id, lang, n_tokens)
    * token frame is built by ONE text_scan over the corpus and shared by
    * the selection's bounded passes AND the final verdict join; the
    * threshold table is |languages| rows broadcast, and the verdict pass
    * is narrow. Keep rule is inclusive at both cut values (value-at-rank
    * members stay).
    */
  def lengthPercentileFilter(spark: SparkSession, d: String): DataFrame = {
    // Memo-persisted (doc_id, lang, n_tokens) — ~24 bytes/row — so the
    // expensive text_scan over documents runs ONCE and is shared by the
    // selection's three bounded passes AND the final verdict join (r9: only
    // the 2-col vals projection was cached and unpersisted before the
    // verdict, so the full corpus scan executed twice).
    val toks = Memo(spark, "lpf_toks|" + d) {
      val t = Tables.documents(spark, d)
        .withColumn("ts", graft.functions.TextFunctions.text_scan(col("text")))
        .select(col("doc_id"), col("lang"), col("ts.n_tokens").as("n_tokens"))
        .persist()
      t.count() // materialize so every later action is a cache read
      t
    }
    val th = DistributedSelect.exactGroupPercentiles(
        toks.select(col("lang"), col("n_tokens")), "lang", "n_tokens",
        Seq(("p10_tokens", 1L, 10L), ("p90_tokens", 9L, 10L)))
      .select(col("lang"), col("p10_tokens"), col("p90_tokens"))
      .collect().toSeq
    import spark.implicits._
    val thDf = th.map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toDF("lang", "p10_tokens", "p90_tokens")
    toks.join(broadcast(thDf), "lang")
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        col("p10_tokens"), col("p90_tokens"),
        (col("n_tokens") >= col("p10_tokens") &&
          col("n_tokens") <= col("p90_tokens")).cast("long").as("keep"))
      .orderBy("doc_id")
  }

  /** Per-source statistics + cap outcome: doc count, kept-under-cap count,
    * exact char volume, and quality-rule pass count per domain — the
    * monitoring table a per-domain curation run reports (the per-source
    * analogue of [[corpusStats]]). One partial+final hash aggregation;
    * BIGINT sums per the oracle parity rules.
    */
  def sourceStats(spark: SparkSession, d: String, cap: Int = 20): DataFrame = {
    val q = qualityFilter(spark, d).select(col("doc_id"), col("keep"))
    Tables.documents(spark, d)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .join(q, Seq("doc_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        least(count(lit(1)), lit(cap.toLong)).as("n_kept"),
        sum(col("n_chars")).cast("long").as("total_chars"),
        sum(col("keep")).cast("long").as("n_quality"))
      .orderBy("source")
  }

  /** Context-window CHUNKING: split each document into fixed-size character
    * windows with overlap — the pre-tokenization segmentation step of a
    * training pipeline (RAG ingestion uses the same shape). One row per
    * (doc, chunk) with offsets and the chunk text; boundaries are pure
    * integer arithmetic on `n_chars` (stride = size − overlap; a doc not
    * longer than `size` is one chunk), so the chunk table is reproducible
    * and oracle-checkable, and `substring` is character-based in BOTH
    * engines. Row explosion is a narrow `sequence`/`explode` — no shuffle
    * until the caller aggregates.
    */
  def docChunks(spark: SparkSession, d: String,
      size: Int = 500, overlap: Int = 50): DataFrame =
    chunkDocs(Tables.documents(spark, d), size, overlap)

  /** [[docChunks]] over an arbitrary documents frame — lets a composed
    * pipeline chunk only its SURVIVING docs instead of exploding the whole
    * corpus and filtering after (a semi join cannot push below a Generate).
    */
  def chunkDocs(docs: DataFrame, size: Int = 500, overlap: Int = 50): DataFrame = {
    require(size > overlap && overlap >= 0, "need size > overlap >= 0")
    val stride = size - overlap
    docs
      .select(col("doc_id"), col("text"), col("n_chars"))
      .withColumn("n_chunks",
        when(col("n_chars") <= size, lit(1L))
          .otherwise(expr(s"(n_chars - ${overlap + 1}) div $stride + 1")))
      .withColumn("chunk_idx", explode(expr("sequence(0, n_chunks - 1)")))
      // chunk_idx goes long BEFORE the stride multiply: for n_chars near
      // 2^31 the 32-bit product overflows before any later cast (r7 advice)
      .withColumn("chunk_idx", col("chunk_idx").cast("long"))
      .select(col("doc_id"), col("chunk_idx"),
        (col("chunk_idx") * stride).as("start_off"),
        least(col("chunk_idx") * stride + size, col("n_chars").cast("long")).as("end_off"),
        // the multiply runs in BIGINT; the final position is < n_chars + 1
        // (String length caps at Int.MaxValue) so the narrowing cast is safe
        expr(s"substring(text, CAST(chunk_idx * $stride + 1 AS INT), $size)").as("chunk_text"))
      .orderBy("doc_id", "chunk_idx")
  }

  /** The COMPOSED end-to-end training-set build — what a pipeline user
    * actually ships: quality filter → exact dedup → near-dup removal
    * ([[curateCorpus]]) → per-source cap ([[sourceCaps]] — no domain
    * dominates the training mix) → eval-slice exclusion + contamination
    * removal (docs with ≥10% eval 5-gram containment drop) → cluster-keyed
    * train split ([[trainTestSplit]] — near-dups land on one side) →
    * repeated-substring REMEDIATION ([[Dedup.substringCleanText]] — a
    * surviving doc whose cross-doc verbatim runs were cut chunks its
    * CLEANED text, r14 VERDICT item 5) → context-window chunking
    * ([[docChunks]]). Every stage is an independently-oracled operator, and
    * the composition is oracled END TO END, so the driver gate certifies
    * the whole pipeline's row set, not just its parts.
    *
    * Stage ordering: curation/dedup/split decisions are DOC-level and run
    * on the original text (a doc's identity, quality, and cluster are
    * judged before surgery); the span-level cut applies at the text
    * boundary feeding chunking, so offsets index the text that actually
    * trains. All joins are on the single long doc key; the chunk explosion
    * happens only for surviving documents, and the remediation join is
    * span-set-sized (affected docs only).
    */
  def trainingSetBuild(spark: SparkSession, d: String, evalMod: Int = 97,
      contaminationE6: Long = 100000L, trainPct: Int = 90,
      sourceCap: Int = 20): DataFrame = {
    val curated = curateCorpus(spark, d)
    val contaminated = Dedup.evalContamination(spark, d, evalMod)
      .filter(col("containment_e6") >= contaminationE6).select("doc_id")
    val train = trainTestSplit(spark, d, trainPct)
      .filter(col("split") === "train").select("doc_id")
    val kept = curated
      .filter(col("doc_id") % evalMod =!= 0) // the eval slice itself never trains
      .join(sourceCaps(spark, d, sourceCap).select("doc_id"), Seq("doc_id"), "left_semi")
      .join(contaminated, Seq("doc_id"), "left_anti")
      .join(train, Seq("doc_id"), "left_semi")
    // filter BEFORE the chunk explosion — a semi join cannot push below the
    // Generate, so chunking first would explode the whole corpus only to
    // discard the dropped docs' chunks. Affected survivors swap in their
    // cleaned text (and its recomputed char length); everyone else keeps
    // the stored text + n_chars untouched.
    val cleaned = Dedup.substringCleanText(spark, d)
    val chunkIn = Tables.documents(spark, d)
      .join(kept, Seq("doc_id"), "left_semi")
      .join(cleaned, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("clean_text"), col("text")).as("text"),
        coalesce(length(col("clean_text")).cast("long"),
          col("n_chars").cast("long")).as("n_chars"))
    chunkDocs(chunkIn)
      .select(col("doc_id"), col("chunk_idx"), col("start_off"), col("end_off"))
      .orderBy("doc_id", "chunk_idx")
  }

  /** Mixture REBALANCING — [[stratifiedSample]] with rates derived FROM THE
    * DATA instead of caller-fixed: downsample every over-represented
    * language toward a uniform target share (total / n_langs), keeping
    * under-represented ones whole. The training-mixture control step of an
    * LLM pipeline (the static form of mixture reweighting): rates are
    * exact-integer basis points `min(10000, total·10000 div (n_langs ·
    * n_lang))`, membership is the same Knuth hash at 1/10000 granularity —
    * no RNG, no floating-point rate boundary, reproducible across engines
    * and cluster sizes.
    *
    * Scale shape: the rate table is one tiny aggregate broadcast back; the
    * corpus side stays one scan + hash + filter.
    */
  def mixtureRebalance(spark: SparkSession, d: String): DataFrame =
    mixtureByRates(spark, d) { (docs, byLang) =>
      val tot = docs.agg(count(lit(1)).as("total"),
        countDistinct(col("lang")).as("n_langs"))
      byLang.crossJoin(broadcast(tot))
        .select(col("lang"),
          least(lit(10000L), expr("(total * 10000) div (n_langs * n_lang)")).as("rate_bp"))
    }

  /** The ONE mixture-sampling skeleton both rate policies share
    * ([[mixtureRebalance]] uniform-target, [[mixtureTemperature]] α=1/2):
    * per-language counts → caller-derived basis-point rate table (tiny,
    * broadcast back) → Knuth-bucket membership at 1/10000 granularity. A
    * drifted copy of the membership convention would silently
    * desynchronize two oracled queries.
    */
  private def mixtureByRates(spark: SparkSession, d: String)(
      ratePolicy: (DataFrame, DataFrame) => DataFrame): DataFrame = {
    val docs = Tables.documents(spark, d).select(col("doc_id"), col("lang"))
    val byLang = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_lang"))
    val rates = ratePolicy(docs, byLang)
    docs.join(broadcast(rates), "lang")
      .withColumn("bucket_bp", knuthBucket(col("doc_id"), 10000L))
      .filter(col("bucket_bp") < col("rate_bp"))
      .select(col("doc_id"), col("lang"), col("rate_bp"))
      .orderBy("doc_id")
  }

  /** Temperature-weighted mixture sampling — the T5/mT5 technique
    * (Raffel et al. 2020 §3.4.2: sample stratum l with probability ∝
    * p_l^α, α<1 flattens the mixture) in the same deterministic
    * exact-integer frame as [[mixtureRebalance]] (which is the α→0 uniform
    * limit). α = 1/2 exactly: target per-language counts k_l ∝ √n_l, and
    * the largest feasible such assignment keeps the SMALLEST language
    * whole — k_l = isqrt(n_min·n_l), which floor(sqrt(double)) computes
    * EXACTLY while any other power would round differently across engines
    * (that exactness constraint is why α=1/2 is the shipped temperature).
    * Membership is the shared Knuth hash at 1/10000 granularity — no RNG.
    *
    * Domain note: double sqrt is exact here while n_min·n_l < 2^52; at
    * counts beyond ~2^26 per stratum swap in an integer Newton isqrt on
    * the driver (the rate table is tiny) — the operator shape is unchanged.
    */
  def mixtureTemperature(spark: SparkSession, d: String): DataFrame =
    mixtureByRates(spark, d) { (_, byLang) =>
      val minN = byLang.agg(min("n_lang").as("n_min"))
      byLang.crossJoin(broadcast(minN))
        .select(col("lang"),
          expr("(CAST(floor(sqrt(CAST(n_min * n_lang AS DOUBLE))) AS BIGINT) * 10000) div n_lang")
            .as("rate_bp"))
    }

  /** Weight-biased deterministic sampling — priority sampling (Duffield,
    * Lund, Thorup, JACM 2007): each row gets priority w/u for a uniform u,
    * and the k highest priorities per stratum are kept — selection
    * probability rises with weight (n_chars here: longer docs are likelier
    * kept), yet the sample is reproducible byte-for-byte because u comes
    * from the same exact-integer Knuth hash as [[trainTestSplit]], not an
    * RNG. Everything stays in integer arithmetic (priority = w·2^32 div u),
    * so the oracle matches EXACTLY — no floating-point selection boundary.
    * One window shuffle per stratum; WindowGroupLimit prunes to per-partition
    * top-k before the exchange.
    *
    * Domain preconditions (like zValue, documented not guarded — the
    * documents table satisfies both by construction): doc_id >= 0, because
    * Spark pmod is non-negative while DuckDB % takes the dividend's sign,
    * so a negative id would hash differently across engines; and
    * n_chars < 2^31, because n_chars * 2^32 must stay inside BIGINT —
    * non-ANSI Spark would wrap silently where DuckDB raises.
    */
  def prioritySample(spark: SparkSession, d: String, k: Int = 20): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("priority").desc, col("doc_id"))
    Tables.documents(spark, d)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .withColumn("u32",
        pmod(pmod(col("doc_id"), lit(2147483648L)) * lit(2654435761L), lit(4294967296L)) + lit(1L))
      .withColumn("priority", expr("(n_chars * 4294967296) div u32"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("doc_id"), col("lang"), col("n_chars"), col("priority"))
      .orderBy("lang", "doc_id")
  }

  /** Budget-packed training batches: per language stratum, documents are
    * packed in deterministic doc_id order into consecutive batches of
    * roughly `budget` cost units each (cost = n_chars here; swap in the
    * TextScan token count for a tokenizer-faithful budget). A document
    * belongs to the batch in which its prefix sum STARTS — exactly a
    * running-sum window + integer division, so batch assembly over a 100 TB
    * corpus is one window shuffle per stratum with no sequential driver
    * loop. The cumulative sum accumulates DECIMAL(38,0) per the overflow
    * rule before the integer-domain division.
    */
  def batchPacking(spark: SparkSession, d: String, budget: Long = 4000L): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    Tables.documents(spark, d)
      .select(col("lang"), col("doc_id"), col("n_chars"))
      .withColumn("cum_chars",
        sum(col("n_chars").cast(org.apache.spark.sql.types.DecimalType(38, 0)))
          .over(w).cast("long"))
      .withColumn("batch_idx", expr(s"(cum_chars - n_chars) div $budget"))
      .orderBy("lang", "doc_id")
  }

  /** Gopher-style REPETITION rules (Rae et al. 2021 §A1.1's second family —
    * [[qualityFilter]] covers the composition rules, this covers repetition):
    * duplicate-word fraction and top-bigram fraction per document. Heavily
    * repeated n-grams are the strongest single signal of low-quality /
    * machine-generated text in public pipeline reports.
    *
    * Shape at scale: word/distinct counts are per-row array ops (narrow);
    * the top-bigram count explodes to (doc_id, bigram) and aggregates twice
    * — both shuffles are keyed by doc_id(+bigram), so they partition
    * perfectly and combine map-side (same posture as the shingle index in
    * [[Dedup.ngramJaccard]]). Bigrams are built with zip_with over two
    * array slices — no self-join. Fractions export as floor-e6 BIGINT
    * (integral div of exact counts; all non-negative so div == floor).
    */
  def repetitionStats(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(spark, d)
      .select(col("doc_id"), split(trim(col("text")), " ").as("ws"))
    val perDoc = docs.select(
      col("doc_id"),
      size(col("ws")).cast("long").as("n_words"),
      size(array_distinct(col("ws"))).cast("long").as("n_distinct_words"))
    val top = docs
      .select(col("doc_id"),
        explode(zip_with(
          slice(col("ws"), lit(1), size(col("ws")) - 1),
          slice(col("ws"), lit(2), size(col("ws")) - 1),
          (a, b) => concat(a, lit(" "), b))).as("bigram"))
      .groupBy(col("doc_id"), col("bigram")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(max(col("c")).as("top_bigram_cnt"))
    perDoc.join(top, Seq("doc_id"), "left")
      .withColumn("top_bigram_cnt", coalesce(col("top_bigram_cnt"), lit(0L)))
      .select(
        col("doc_id"), col("n_words"), col("n_distinct_words"),
        expr("((n_words - n_distinct_words) * 1000000) div n_words").as("dup_word_frac_e6"),
        col("top_bigram_cnt"),
        expr("(top_bigram_cnt * 1000000) div greatest(n_words - 1, 1)").as("top_bigram_frac_e6"))
      .orderBy("doc_id")
  }

  /** Corpus vocabulary statistics (the IDF side of TF-IDF): per-term corpus
    * frequency and document frequency, top-100 by df. One explode + one
    * aggregation with a distinct-count — the two-phase distinct shuffle
    * (term+doc partial dedup, then term count) survives term skew the same
    * way Q16's supplier count does. The top-100 is a tiny final sort.
    */
  def termDocFreq(spark: SparkSession, d: String, topK: Int = 100): DataFrame =
    Tables.documents(spark, d)
      .select(col("doc_id"), explode(split(trim(col("text")), " ")).as("term"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("cf"), countDistinct(col("doc_id")).as("df"))
      .orderBy(desc("df"), desc("cf"), asc("term"))
      .limit(topK)

  /** Multimodal plumbing: treat content as an opaque binary column with typed
    * metadata — here synthesized from text (the container ships no image/audio
    * codecs; SURVEY.md north-star stub). Byte length and content digest are
    * computed on the BINARY value, proving the binary-column path end-to-end.
    */
  def binaryContent(spark: SparkSession, d: String): DataFrame =
    Tables.documents(spark, d)
      .select(col("doc_id"),
        encode(col("text"), "UTF-8").as("content"),
        col("source"))
      .select(col("doc_id"),
        octet_length(col("content")).cast("long").as("n_bytes"),
        md5(col("content")).as("content_md5"),
        col("source"))
      .orderBy("doc_id")

  /** Deletion-impact audit (right-to-be-forgotten across DERIVED artifacts)
    * — the batch-side governance counterpart of the index-store tombstones
    * ([[graft.streaming.IndexTombstones]]): when a takedown set must leave
    * the corpus, the operator answers what else that deletion touches. The
    * takedown here is a LICENSE REVOCATION — every document of one source
    * (the lexicographically first, the deterministic stand-in for "the
    * publisher who revoked") must leave; per removed doc it reports
    *   - `n_chunks_affected`: its chunks inside the BUILT training set
    *     ([[trainingSetBuild]] — nonzero means revoked content reached
    *     training data and those chunks must be rebuilt),
    *   - `cluster_id` / `was_keeper`: whether the doc is the canonical
    *     representative of a multi-doc near-dup cluster ([[Dedup
    *     .dupClusters]] min-label components) — removing a keeper
    *     invalidates every "duplicate of X" verdict in its group,
    *   - `new_keeper` / `n_live_members`: the post-removal re-election (min
    *     surviving member; NULL when the whole cluster is taken down).
    *
    * Pure composition of memoized operator results (the cluster and
    * training-set work is shared with their own queries), then three
    * single-key joins — nothing here re-scans text. Fully DuckDB-oracled:
    * the oracle reuses the dedup_clusters and training_set_build SQL as
    * subqueries, so the audit is hash-checked end-to-end.
    */
  def deletionImpact(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(spark, d)
    val removed = docs
      .join(broadcast(docs.agg(min(col("source")).as("rev_source"))),
        col("source") === col("rev_source"))
      .select(col("doc_id"))
    val labeled = docs.select(col("doc_id"))
      .join(Dedup.dupClusters(spark, d), Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
    val members = labeled.groupBy("cluster_id")
      .agg(count(lit(1)).as("n_members"))
    val live = labeled
      .join(removed.select(col("doc_id"), lit(1L).as("rm")), Seq("doc_id"), "left")
      .groupBy("cluster_id")
      .agg(sum(when(col("rm").isNull, 1L).otherwise(0L)).cast("long")
          .as("n_live_members"),
        min(when(col("rm").isNull, col("doc_id"))).as("new_keeper"))
    val chunks = trainingSetBuild(spark, d)
      .groupBy("doc_id").agg(count(lit(1)).as("n_chunks"))
    removed
      .join(labeled, "doc_id")
      .join(members, "cluster_id")
      .join(live, "cluster_id")
      .join(chunks, Seq("doc_id"), "left")
      .select(col("doc_id"), col("cluster_id"),
        when(col("cluster_id") === col("doc_id") && col("n_members") > 1L, 1L)
          .otherwise(0L).as("was_keeper"),
        col("new_keeper"), col("n_live_members"),
        coalesce(col("n_chunks"), lit(0L)).as("n_chunks_affected"))
      .orderBy("doc_id")
  }
}
