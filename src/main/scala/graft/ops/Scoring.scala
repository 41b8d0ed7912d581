package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relevance scoring and fuzzy-matching operators over the documents
  * corpus: BM25 ranking and blocked edit-distance near-dup pairs. Both are
  * staples of training-data curation (quality-weighted sampling, fuzzy
  * dedup of titles/short docs) that the hash/shingle dedup family doesn't
  * cover.
  */
object Scoring {

  /** [[AnnStore]] kind for the incremental-BM25 ingest-time aggregates. */
  private[graft] val Bm25StatsKind = "bm25stats-v1"

  /** BM25 relevance scores for a fixed query over the corpus.
    *
    * tf = substring occurrences in the lowercased text, df from one small
    * aggregation, avgdl from one global aggregation; both side tables are
    * broadcast, so the whole query is a single pass over the corpus with
    * two tiny broadcasts — no per-term rescans. All arithmetic is written
    * with the same literal association as the oracle SQL (doubles are
    * IEEE-deterministic given the same operation order). Residual risk: the
    * one cross-engine exposure is `ln` — if JVM Math.log and DuckDB's log
    * ever differ by 1 ulp on some input, the floor(·1e6) export FLIPS at an
    * integer boundary rather than absorbing the difference (floor is a step
    * function; no epsilon can remove the boundary, only move it). Both
    * engines' logs agree on every value in the test corpora; a mismatch
    * would surface as a single-row hash diff in the oracle gate.
    */
  def bm25Scores(spark: SparkSession, d: String,
                 terms: Seq[String] = Seq("spark", "stream", "window"),
                 k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val docs = Tables.documents(spark, d)
      .select(col("doc_id"), lower(col("text")).as("t"), col("n_chars"))
    // The term-match rows feed BOTH the df aggregation and the scoring pivot;
    // without materialization Catalyst re-expands the subtree and the corpus
    // is scanned once per consumer. Persisted via Memo, the heavy text scan
    // runs once and both consumers read the (much smaller) match rows.
    val e = Memo(spark, s"bm25_matches|$d|${terms.mkString(",")}") {
      matchRows(spark, docs, terms).persist()
    }
    val byTerm = e.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val global = docs.agg(count(lit(1)).as("n_docs"), Exact.sumLong(col("n_chars")).as("sum_len"))
    scoreDocs(e, byTerm, global, terms, k1, b)
  }

  /** Substring term-frequency match rows `(doc_id, t, n_chars, term, tf)`
    * for one document slice — the shared scan both the batch and the
    * incremental BM25 forms run.
    */
  private def matchRows(spark: SparkSession, docs: DataFrame,
      terms: Seq[String]): DataFrame = {
    import spark.implicits._
    docs.crossJoin(broadcast(terms.toDF("term")))
      .withColumn("tf", expr("(length(t) - length(replace(t, term, ''))) div length(term)"))
      .filter(col("tf") > 0)
  }

  /** The BM25 scoring tail shared by both forms: join match rows to the
    * (term → df) table and the (n_docs, sum_len) global row, score, pivot
    * per term, fixed-order sum, floor-e6 export.
    *
    * Same association as the oracle: ((n_docs - df) + 0.5) / (df + 0.5) + 1.0;
    * k1+1 and 1-b are spelled as (k1 + 1.0) / (1.0 - b) on BOTH sides so the
    * two engines round the composite literals identically.
    */
  private def scoreDocs(e: DataFrame, byTerm: DataFrame, global: DataFrame,
      terms: Seq[String], k1: Double, b: Double): DataFrame = {
    val idf = log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
    val avgdl = col("sum_len").cast("double") / col("n_docs")
    val score = idf * (col("tf") * (lit(k1) + lit(1.0))) /
      (col("tf") + lit(k1) * ((lit(1.0) - lit(b)) + lit(b) * col("n_chars") / avgdl))
    val perTerm = terms.map(t => max(when(col("term") === t, col("sc"))).as(s"s_$t"))
    val pivoted = e.join(broadcast(byTerm), Seq("term"))
      .crossJoin(broadcast(global))
      .withColumn("sc", score)
      .groupBy(col("doc_id"))
      .agg(perTerm.head, perTerm.tail: _*)
    // Fixed-order summation (term list order) so both engines add the same
    // doubles in the same sequence.
    val total = terms.map(t => coalesce(col(s"s_$t"), lit(0.0))).reduce(_ + _)
    pivoted
      .select(col("doc_id"), floor(total * lit(1000000.0)).cast("long").as("score_e6"))
      .orderBy("doc_id")
  }

  /** INCREMENTAL BM25 — relevance scoring under corpus growth, the lexical
    * rung of the incremental ladder (the ANN/dedup families' CDC posture,
    * applied to scoring): the persisted corpus contributes only its
    * ingest-time AGGREGATES (per-term df, doc count, total length — a
    * vocabulary-bounded handful of integers, [[AnnStore]]-persisted exactly
    * like the bloom sketch, so a fresh query session loads them without
    * rescanning the old corpus), the arriving batch (doc_id ≡ 0 mod `batchMod`,
    * the same micro-batch stand-in the other incremental ops use) computes
    * its own match rows, and the batch is scored under the MERGED statistics
    * — so arriving docs get scores consistent with the full corpus without
    * ever rescanning the old corpus text.
    *
    * Because df/n_docs/sum_len are exact integers over disjoint slices,
    * merged stats equal scratch full-corpus stats EXACTLY, and the batch's
    * scores hash-match the batch rows of [[bm25Scores]] — which is what the
    * DuckDB oracle pins (full-corpus stats, new-batch scoring). The trade
    * this form accepts: already-scored OLD docs' scores drift as idf/avgdl
    * move with corpus growth; rescoring them is a periodic batch job
    * (the same retraining-cadence decision [[Similarity]]'s IVF centroids
    * document), not a per-trigger one.
    *
    * Scale shape: per batch one bounded text scan (the batch), one
    * broadcast of vocabulary-sized merged stats; the old corpus is touched
    * only at ingest time when its aggregates were built.
    */
  def incrementalBm25(spark: SparkSession, d: String,
      terms: Seq[String] = Seq("spark", "stream", "window"),
      k1: Double = 1.2, b: Double = 0.75, batchMod: Int = 10): DataFrame = {
    val docs = Tables.documents(spark, d)
      .select(col("doc_id"), lower(col("text")).as("t"), col("n_chars"))
    val isNew = col("doc_id") % batchMod === 0
    val oldDocs = docs.filter(!isNew)
    val newDocs = docs.filter(isNew)
    // the persisted corpus's ingest-time aggregates (df is per-term doc
    // counts — mergeable; so are n_docs/sum_len): ONE AnnStore artifact
    // (kind bm25stats-v1) keyed by the corpus fingerprint + term set +
    // slice, so a fresh query session LOADS the handful of integers
    // instead of rescanning the old corpus text — the same ingest-time /
    // query-time split the bloom sketch and the ANN indexes use. The
    // sentinel term "" row carries the global (n_docs, sum_len) pair.
    val termKey = terms.mkString(",")
    val termHash = java.security.MessageDigest.getInstance("MD5")
      .digest(termKey.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
    val statsOld = Memo(spark, s"bm25_stats_old|$d|$termKey|$batchMod") {
      AnnStore.loadOrBuild(spark,
        AnnStore.path(spark, Bm25StatsKind, d, s"$termHash-x$batchMod",
          corpusTable = "documents")) {
        matchRows(spark, oldDocs, terms)
          .groupBy(col("term")).agg(count(lit(1)).as("df"))
          .select(col("term"), col("df"),
            lit(null).cast("long").as("n_docs"), lit(null).cast("long").as("sum_len"))
          .unionByName(oldDocs
            .agg(count(lit(1)).as("n_docs"), Exact.sumLong(col("n_chars")).as("sum_len"))
            .select(lit("").as("term"), lit(0L).as("df"), col("n_docs"), col("sum_len")))
      }.persist()
    }
    val dfOld = statsOld.filter(col("term") =!= "")
      .select(col("term"), col("df").as("df_old"))
    val globalOld = statsOld.filter(col("term") === "")
      .select(col("n_docs").as("n_docs_old"), col("sum_len").as("sum_len_old"))
    // the batch match rows feed BOTH the df delta and the scoring tail —
    // materialized once (same re-expansion trap bm25Scores documents)
    val eNew = Memo(spark, s"bm25_matches_new|$d|$termKey|$batchMod") {
      matchRows(spark, newDocs, terms).persist()
    }
    val dfNew = eNew.groupBy(col("term")).agg(count(lit(1)).as("df_new"))
    val byTerm = dfOld.join(dfNew, Seq("term"), "full_outer")
      .select(col("term"),
        (coalesce(col("df_old"), lit(0L)) + coalesce(col("df_new"), lit(0L))).as("df"))
    val global = newDocs
      .agg(count(lit(1)).as("n_docs_new"), Exact.sumLong(col("n_chars")).as("sum_len_new"))
      .crossJoin(broadcast(globalOld))
      .select((col("n_docs_old") + col("n_docs_new")).as("n_docs"),
        (col("sum_len_old") + col("sum_len_new")).as("sum_len"))
    scoreDocs(eNew, byTerm, global, terms, k1, b)
  }

  /** Corpus-derived unigram language-model score — the "perplexity-lite"
    * quality filter (the CCNet recipe scores documents under an LM and
    * drops the tail; a unigram model is its self-contained form): train
    * token→log-probability on the corpus itself, then score each document
    * by the sum of its tokens' log-probs.
    *
    * Oracle-parity design: per-token `floor(ln(c/total)·1e6)` is computed
    * ONCE per distinct token (BIGINT), and document scores are integer
    * sums `Σ tf·lp` — so the doc aggregation is order-independent (a raw
    * double sum over tokens would hash-diverge on aggregation order). The
    * exported columns are the sum and n_tokens, not their ratio — division
    * of negatives rounds differently across engines. Same residual `ln`
    * boundary exposure as [[bm25Scores]].
    *
    * Scale shape: one token explode → (doc, tok) tf aggregate (map-side
    * combined), one broadcast-or-shuffle join against the (vocab-sized) LM
    * table, one per-doc aggregate. The LM table is bounded by vocabulary,
    * not corpus size.
    */
  /** Per-source unigram-distribution divergence from the corpus-wide
    * distribution: scaled KL(source‖corpus) and cross-entropy — the data-
    * mixing diagnostic behind temperature/rebalance decisions (a source
    * whose KL is near zero adds no distributional diversity; a high-KL
    * source shifts the mixture). Follows the [[unigramLogprob]] parity
    * recipe exactly: each log-probability is floored to an e6 integer
    * FIRST, contributions `c_st·(lp_s − lp_c)` are integer-summed (a
    * double sum over the vocabulary would hash-diverge on aggregation
    * order). `kl_sum_e6 / n_tokens` is the per-token KL in nats; the ratio
    * is left to the reader (division parity rule). Every source term
    * appears in the corpus vocabulary by construction, so no zero-prob
    * smoothing is needed.
    *
    * Scale shape: one token explode → (source, tok) aggregate (map-side
    * combined); everything downstream is vocabulary- or source-bounded —
    * the per-source totals broadcast, the corpus LM joins on `tok`.
    */
  def sourceDivergence(spark: SparkSession, d: String): DataFrame =
    divergenceOfCounts(tokenCountsBySource(Tables.documents(spark, d)))

  /** Per-(source, token) occurrence counts — the mergeable summary the
    * divergence family reduces the corpus to (vocabulary×sources rows).
    */
  private[graft] def tokenCountsBySource(docs: DataFrame): DataFrame =
    docs
      .select(col("source"),
        explode(split(trim(lower(col("text"))), " ")).as("tok"))
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c_st"))

  /** [[AnnStore]] kind for the persisted per-(source, token) counts. */
  private[graft] val SrcTokKind = "srctok-v1"

  /** Divergence under corpus growth — the incremental rung, same contract
    * as [[incrementalBm25]] / [[Temporal.incrementalAnomalies]]: the
    * persisted history contributes only its ingest-time (source, token)
    * counts (exactly mergeable by integer addition; vocabulary-bounded,
    * AnnStore-kept), the arriving batch tokenizes only its own slice, and
    * the merged counts reproduce the full-corpus [[sourceDivergence]]
    * HASH-EXACTLY (the oracle pins that) — the old corpus text is never
    * re-scanned.
    */
  def incrementalDivergence(spark: SparkSession, d: String,
      batchMod: Int = 10): DataFrame = {
    val docs = Tables.documents(spark, d)
    val isNew = col("doc_id") % batchMod === 0
    val oldCounts = Memo(spark, s"srctok_old|$d|$batchMod") {
      AnnStore.loadOrBuild(spark,
        AnnStore.path(spark, SrcTokKind, d, s"x$batchMod",
          corpusTable = "documents")) {
        tokenCountsBySource(docs.filter(!isNew))
          .withColumnRenamed("c_st", "c_old")
      }.persist()
    }
    val newCounts = tokenCountsBySource(docs.filter(isNew))
      .withColumnRenamed("c_st", "c_new")
    // full outer: a (source, token) cell seen by only one slice still
    // carries its exact merged count
    val merged = oldCounts.join(newCounts, Seq("source", "tok"), "full_outer")
      .select(col("source"), col("tok"),
        (coalesce(col("c_old"), lit(0L)) + coalesce(col("c_new"), lit(0L)))
          .as("c_st"))
    divergenceOfCounts(merged)
  }

  /** The scoring tail over an already-aggregated (source, tok, c_st) frame
    * — shared by the batch and incremental forms.
    */
  private[graft] def divergenceOfCounts(st: DataFrame): DataFrame = {
    val srcTot = st.groupBy(col("source")).agg(sum(col("c_st")).as("n_s"))
    val ct = st.groupBy(col("tok")).agg(sum(col("c_st")).as("c_t"))
    val tot = ct.agg(sum(col("c_t")).as("n"))
    val lmC = ct.crossJoin(broadcast(tot))
      .select(col("tok"),
        floor(log(col("c_t").cast("double") / col("n")) * lit(1000000.0))
          .cast("long").as("lp_c"))
    // the per-row products are formed in DECIMAL(38,0), not Long: c_st is a
    // corpus-wide per-(source,token) count, so at 100 TB a stop-word count
    // (~1e11-1e12) times an e6-scaled rare-token log-prob (~1e7) exceeds
    // Long.Max and Spark would wrap silently while DuckDB raises (r16
    // ADVICE; the join_explosion_check overflow precedent). The oracle
    // mirrors with HUGEINT casts before its multiplies.
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    st.join(broadcast(srcTot), Seq("source"))
      .withColumn("lp_s",
        floor(log(col("c_st").cast("double") / col("n_s")) * lit(1000000.0))
          .cast("long"))
      .join(lmC, Seq("tok"))
      .groupBy(col("source"))
      .agg(
        Exact.sumLong(col("c_st").cast(dec38) *
          (col("lp_s") - col("lp_c")).cast(dec38)).as("kl_sum_e6"),
        Exact.sumLong(-col("c_st").cast(dec38) * col("lp_c").cast(dec38))
          .as("xent_sum_e6"),
        Exact.sumLong(col("c_st")).as("n_tokens"),
        count(lit(1)).as("n_terms"))
      .orderBy("source")
  }

  /** Bigram conditional-LM document scoring — the next LM rung above
    * [[unigramLogprob]]: each bigram instance contributes
    * `ln(c(w₁w₂)/c_ctx(w₁))` where the CONTEXT count is the number of
    * bigrams starting with w₁ (so conditional probabilities sum to 1 per
    * context — the MLE bigram model). Same parity recipe: per-bigram
    * log-probs floored to e6 integers FIRST, then integer-summed per doc.
    * Docs with fewer than two tokens have no bigrams and are absent (both
    * engines). `n_bigrams` rides so the reader can normalize; the ratio is
    * left unexported (division parity rule).
    *
    * Scale shape: one windowed pass builds bigram instances (partitioned
    * by doc — the same shuffle the tf aggregation needs anyway), the LM
    * side is bigram-vocabulary-bounded, and the context table derives from
    * the bigram counts (no second corpus scan).
    */
  def bigramLogprob(spark: SparkSession, d: String): DataFrame = {
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val inst = Tables.documents(spark, d)
      .select(col("doc_id"),
        posexplode(split(trim(lower(col("text"))), " ")).as(Seq("pos", "tok")))
      .withColumn("prev", lag(col("tok"), 1).over(byDoc))
      .where(col("prev").isNotNull)
      // tokens contain no spaces (they were split on one), so the joined
      // string is an unambiguous bigram key
      .select(col("doc_id"), concat(col("prev"), lit(" "), col("tok")).as("bg"))
    val tfb = inst.groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("tf"))
    // the context key derives ONCE — ctx and lm must agree on it or the
    // conditional LM silently denormalizes
    val cb = tfb.groupBy(col("bg")).agg(sum(col("tf")).as("c2"))
      .withColumn("w1", substring_index(col("bg"), " ", 1))
    val ctx = cb.groupBy(col("w1")).agg(sum(col("c2")).as("c_ctx"))
    val lm = cb
      .join(ctx, Seq("w1"))
      .select(col("bg"),
        floor(log(col("c2").cast("double") / col("c_ctx")) * lit(1000000.0))
          .cast("long").as("lp"))
    tfb.join(lm, Seq("bg"))
      .groupBy(col("doc_id"))
      .agg(Exact.sumLong(col("tf")).as("n_bigrams"),
        Exact.sumLong(col("tf") * col("lp")).as("logprob_sum_e6"))
      .orderBy("doc_id")
  }

  def unigramLogprob(spark: SparkSession, d: String): DataFrame = {
    val tok = Tables.documents(spark, d)
      .select(col("doc_id"),
        explode(split(trim(lower(col("text"))), " ")).as("tok"))
    val tf = tok.groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    // corpus counts DERIVE from tf — the token explode runs once, not once
    // per aggregation (tf is the only consumer of the raw token stream)
    val cnt = tf.groupBy(col("tok")).agg(sum(col("tf")).as("c"))
    val tot = cnt.agg(sum(col("c")).as("t"))
    val lm = cnt.crossJoin(broadcast(tot))
      .select(col("tok"),
        floor(log(col("c").cast("double") / col("t")) * lit(1000000.0))
          .cast("long").as("lp"))
    tf.join(lm, "tok")
      .groupBy(col("doc_id"))
      .agg(Exact.sumLong(col("tf")).as("n_tokens"),
        Exact.sumLong(col("tf") * col("lp")).as("logprob_sum_e6"))
      .orderBy("doc_id")
  }

  /** Blocked edit-distance near-dup pairs: block on (lang, n_chars div w)
    * — near-identical docs share both — and run THRESHOLD-BANDED Levenshtein
    * on a bounded prefix within each block (the 3-arg `levenshtein` bands
    * the DP to O(len·maxDist) with early exit — at sf0.1 this cut the query
    * from 12.7s to ~2s vs the unbanded form). One shuffle on the block key;
    * the quadratic term is confined to a block (the standard blocking scheme
    * for fuzzy dedup; MinHash/SimHash cover the unblocked regime).
    *
    * The block width w is CORPUS-DERIVED, not fixed (the round-7 fixed
    * `div 32` made block population — and so the quadratic per-block term —
    * grow linearly with corpus size: 5.4× time at 10× data). Width
    * `clamp(1, 32, range(n_chars) · n_langs · targetBlock div n_docs)`
    * keeps the EXPECTED block population near `targetBlock` as the corpus
    * grows: 10× docs → ~1/10 width → ~10× blocks of the same size, so total
    * work scales ~linearly until the width floors at 1 (past that regime,
    * length-blocking has no resolution left and MinHash/SimHash are the
    * right tool). The chosen width is exported as `bucket_w` so the DuckDB
    * oracle re-derives the identical blocking from the same statistics.
    */
  def editDistPairs(spark: SparkSession, d: String,
                    prefixLen: Int = 60, maxDist: Int = 12,
                    targetBlock: Int = 16): DataFrame = {
    // Both self-join branches read the same 4-column projection; persisting
    // it turns two full text scans into one scan + a cached narrow frame
    // (prefixes only, not the document bodies).
    // ASCII guard: DuckDB's levenshtein is byte-based, Spark's is
    // character-based — they agree only on single-byte text. The identical
    // octet_length = length predicate on BOTH sides keeps the oracle exact
    // whatever the corpus holds (today's corpus is all-ASCII; this makes
    // that an invariant rather than luck).
    val blocked = Memo(spark, s"editdist_blocked|$d|$prefixLen|$targetBlock") {
      val docs = Tables.documents(spark, d)
      // one tiny aggregate row broadcast back — the corpus side stays one
      // scan; all arithmetic integer so the oracle reproduces w exactly
      val stats = docs
        .agg(count(lit(1)).as("n_docs"), min("n_chars").as("min_c"),
          max("n_chars").as("max_c"), countDistinct("lang").as("n_langs"))
        .select(greatest(lit(1L), least(lit(32L),
          expr(s"((max_c - min_c + 1) * n_langs * $targetBlock) div n_docs"))).as("bucket_w"))
      docs.crossJoin(broadcast(stats))
        .select(col("doc_id"), col("lang"), col("bucket_w"),
          expr("n_chars div bucket_w").as("bk"),
          substring(lower(col("text")), 1, prefixLen).as("s"))
        .filter(expr("octet_length(s) = length(s)"))
        .persist()
    }
    val a = blocked.select(col("doc_id").as("doc_a"), col("lang"), col("bk"),
      col("bucket_w"), col("s").as("sa"))
    val c = blocked.select(col("doc_id").as("doc_b"), col("lang"), col("bk"), col("s").as("sb"))
    // banded levenshtein returns -1 when the distance exceeds the threshold
    a.join(c, Seq("lang", "bk"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("dist", levenshtein(col("sa"), col("sb"), maxDist).cast("long"))
      .filter(col("dist") >= 0)
      .select(col("doc_a"), col("doc_b"), col("dist"), col("bucket_w"))
      .orderBy("doc_a", "doc_b")
  }
}
