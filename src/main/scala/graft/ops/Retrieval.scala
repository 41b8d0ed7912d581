package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval — reciprocal-rank fusion (RRF) of a LEXICAL ranking
  * (word n-gram Jaccard, the [[Dedup]] shingle machinery) and a SEMANTIC
  * ranking (embedding cosine, the [[Similarity]] machinery) for the same
  * bounded query panel. This is the retrieval shape a curation / RAG-style
  * pipeline actually runs: neither signal alone is robust (lexical misses
  * paraphrase, embedding misses exact terms), and RRF (Cormack et al. 2009)
  * fuses them in RANK space, so no score calibration between incomparable
  * scales is needed — which is also exactly what makes the operator
  * oracle-stable: every fused score here is an exact integer.
  *
  * Determinism contract (the reason the whole fusion hash-matches DuckDB):
  * the lexical key is `jaccard_e9`, exact integer `n_common·10⁹ div union`;
  * the semantic key is the floor-e6 cosine every similarity export uses;
  * both per-list ranks break ties on candidate id; the fused score is
  * `Σ 10⁹ div (rrfK + rank)` over the lists a candidate appears in —
  * integer arithmetic end to end, identical in any engine.
  *
  * Scale shape: the query panel is bounded (nQueries docs) and broadcasts
  * against both indexes — the corpus-side work is one shingle equi-join
  * (stop-shingle capped at `maxDf`, the standard rule — candidate volume
  * per query shingle is ≤ maxDf) and one cosine pass over the corpus rows
  * the panel's candidates touch; the fusion itself is rank-space over
  * ≤ 2·listK rows per query. At 100 TB the semantic list swaps to the ANN
  * probe ([[rrfFusionAnn]] — same fusion core, rows-only because the
  * candidate set is approximate) and the lexical list to a BM25 posting
  * prune; the fusion stage is unchanged — that independence is the point
  * of fusing in rank space.
  */
object Retrieval {

  /** Per-query top-`listK` lexical candidates by exact n-gram Jaccard:
    * `(qid, cid, jaccard_e9, lex_rank)`. Query-vs-corpus over the shared
    * distinct-shingle index — the inverted-index form of
    * [[Dedup.jaccardPairs]] restricted to a bounded probe side: the panel's
    * shingles semi-join the df-capped shingle universe, then equi-join the
    * corpus index on the shingle key (never doc x doc). Sizes count ALL
    * shingles (the cap only drops intersection evidence from boilerplate
    * shingles — same rule, same asymmetry as the dedup family).
    */
  private[ops] def lexicalTopK(spark: SparkSession, d: String, listK: Int,
      nQueries: Int, maxDf: Int): DataFrame =
    // session-memoized: the two full-index aggregations (sizes, df cap)
    // run once — the exact and ANN fusion queries share this list
    Memo(spark, s"lextopk|$d|$listK|$nQueries|$maxDf") {
      lexicalTopKUncached(spark, d, listK, nQueries, maxDf).persist()
    }

  private def lexicalTopKUncached(spark: SparkSession, d: String, listK: Int,
      nQueries: Int, maxDf: Int): DataFrame = {
    val sh = Dedup.cachedShingles(spark, d)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val allowed = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf).select(col("shingle"))
    val qsh = sh.filter(col("doc_id") < nQueries)
      .join(allowed, Seq("shingle"), "left_semi")
      .select(col("doc_id").as("qid"), col("shingle"))
    val csh = sh.join(allowed, Seq("shingle"), "left_semi")
      .select(col("doc_id").as("cid"), col("shingle"))
    val inter = broadcast(qsh).join(csh, Seq("shingle"))
      .filter(col("qid") =!= col("cid"))
      .groupBy(col("qid"), col("cid")).agg(count(lit(1)).as("n_common"))
    val lw = Window.partitionBy(col("qid")).orderBy(desc("jaccard_e9"), asc("cid"))
    inter
      .join(sizes.select(col("doc_id").as("qid"), col("n_sh").as("n_q")), Seq("qid"))
      .join(sizes.select(col("doc_id").as("cid"), col("n_sh").as("n_c")), Seq("cid"))
      .withColumn("jaccard_e9",
        expr("(n_common * 1000000000) div (n_q + n_c - n_common)"))
      .withColumn("lex_rank", row_number().over(lw).cast("long"))
      .filter(col("lex_rank") <= listK)
      .select(col("qid"), col("cid"), col("jaccard_e9"), col("lex_rank"))
  }

  /** Per-query top-`listK` semantic candidates by EXACT cosine:
    * `(qid, cid, sim_e6, sem_rank)` — [[Similarity.bruteForceTopK]] at
    * list depth, rank renamed (ONE brute-force definition: a tie-break or
    * floor-convention change there propagates here instead of diverging —
    * this was a verbatim re-implementation until the r15 review).
    * Session-memoized like the lexical list.
    */
  private[ops] def semanticTopK(spark: SparkSession, d: String, listK: Int,
      nQueries: Int): DataFrame =
    Memo(spark, s"semtopk|$d|$listK|$nQueries") {
      Similarity.bruteForceTopK(spark, d, nQueries, listK)
        .select(col("qid"), col("cid"), col("sim_e6"),
          col("rank").as("sem_rank"))
        .persist()
    }

  /** Rank-space fusion core shared by the oracled exact form and the ANN
    * form: full-outer on (qid, cid), `rrf_score = Σ 10⁹ div (rrfK + rank)`
    * over the lists the candidate appears in, final top-`k` by
    * (rrf_score desc, cid). Absent-list ranks export as NULL (evidence of
    * WHICH signal found the candidate), never a fake rank.
    */
  private[ops] def fuse(sem: DataFrame, lex: DataFrame, k: Int,
      rrfK: Int): DataFrame = {
    val fw = Window.partitionBy(col("qid")).orderBy(desc("rrf_score"), asc("cid"))
    sem.select(col("qid"), col("cid"), col("sem_rank"))
      .join(lex.select(col("qid"), col("cid"), col("lex_rank")),
        Seq("qid", "cid"), "full_outer")
      .withColumn("rrf_score",
        coalesce(expr(s"1000000000 div ($rrfK + sem_rank)"), lit(0L)) +
          coalesce(expr(s"1000000000 div ($rrfK + lex_rank)"), lit(0L)))
      .withColumn("rank", row_number().over(fw).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("cid"), col("rrf_score"),
        col("sem_rank"), col("lex_rank"))
      .orderBy("qid", "rank")
  }

  /** The oracled hybrid query: exact lexical + exact semantic lists, RRF
    * top-`k` per query. DuckDB replays both rankings and the integer fusion
    * hash-for-hash.
    */
  def rrfFusion(spark: SparkSession, d: String, k: Int = 5, listK: Int = 20,
      rrfK: Int = 60, nQueries: Int = 8, maxDf: Int = 256): DataFrame =
    fuse(semanticTopK(spark, d, listK, nQueries),
      lexicalTopK(spark, d, listK, nQueries, maxDf), k, rrfK)

  final case class MmrCand(qid: Long, cid: Long, rel_e6: Long)
  final case class MmrPair(qid: Long, a: Long, b: Long, sim_e6: Long)
  final case class MmrPick(qid: Long, sel_rank: Long, cid: Long, mmr_score10: Long)

  /** MMR-diversified rerank (Carbonell & Goldstein 1998): from each query's
    * exact top-`listK` semantic candidates, greedily select `k` maximizing
    * `λ·relevance − (1−λ)·max-similarity-to-already-selected` — the
    * redundancy-suppressing rerank a retrieval pipeline runs so the final
    * list isn't `k` near-copies of the same best hit. With λ = `lamNum /
    * lamDen`, every score is the exact integer `lamNum·rel_e6 −
    * (lamDen−lamNum)·max_sim_e6` (scores scaled by lamDen — hence
    * `mmr_score10` at the 7/10 default; the first pick carries no penalty
    * term), ties broken on cid, so the greedy trajectory is deterministic
    * and DuckDB replays it move-for-move with a recursive CTE over an
    * accumulating selected-list.
    *
    * Execution shape — the one operator family where per-group IMPERATIVE
    * logic is genuinely right: greedy selection is inherently sequential in
    * `k`, but each query's state is bounded (listK candidates + their
    * listK² pairwise sims), so the iteration runs inside
    * `KeyValueGroupedDataset.cogroup` per qid — queries spread across
    * executors, no driver-side loop, no k-round job cascade. Candidate and
    * pairwise-sim generation stay declarative: the candidate list is the
    * session-memoized [[semanticTopK]], and the pair sims are one bounded
    * self-join of the candidate embeddings within each qid (nQueries·listK²
    * rows total), reusing the exact floor-e6 cosine convention.
    *
    * At 100 TB the candidate stage swaps to the ANN probe exactly as
    * [[rrfFusionAnn]] does; the greedy stage's cost is unchanged (it never
    * sees the corpus, only the per-query candidate lists).
    */
  def mmrRerank(spark: SparkSession, d: String, k: Int = 10, listK: Int = 20,
      nQueries: Int = 8, lamNum: Int = 7, lamDen: Int = 10): DataFrame =
    mmrSelect(spark, d,
      semanticTopK(spark, d, listK, nQueries).select(col("qid"), col("cid")),
      k, lamNum, lamDen)

  /** The scale form: SAME greedy core over the multi-probe LSH ANN
    * candidate list instead of the exact brute force. Rows-only — the
    * candidate set is approximate; RetrievalSpec pins the core's
    * list-agnosticism and the panel agreement between the two forms.
    */
  def mmrRerankAnn(spark: SparkSession, d: String, k: Int = 10, listK: Int = 20,
      nQueries: Int = 8, lamNum: Int = 7, lamDen: Int = 10): DataFrame =
    mmrSelect(spark, d,
      Similarity.annTopK(spark, d, k = listK, recallQueries = 0)
        .filter(col("qid") < nQueries)
        .select(col("qid"), col("cid")),
      k, lamNum, lamDen)

  /** Candidate-list-agnostic MMR greedy: the list supplies only
    * `(qid, cid)` — relevance AND pairwise similarity are recomputed here
    * as exact floor-e6 cosines (so any candidate source, exact or
    * approximate, feeds the same deterministic selection), then the
    * per-qid sequential selection runs inside cogroup.
    */
  private def mmrSelect(spark: SparkSession, d: String, cand0: DataFrame,
      k: Int, lamNum: Int, lamDen: Int): DataFrame = {
    import spark.implicits._
    val emb = Similarity.withNorm(Tables.embeddings(spark, d))
    val ce = cand0.select(col("qid"), col("cid"))
      .join(emb.select(col("vec_id").as("cid"), col("embedding"), col("nrm")), Seq("cid"))
    val cand = ce
      .join(emb.select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("nrm").as("qn")), Seq("qid"))
      .select(col("qid"), col("cid"),
        floor(graft.functions.VectorFunctions.dot_product(col("qe"), col("embedding")) /
          (col("qn") * col("nrm")) * lit(1000000.0)).cast("long").as("rel_e6"))
    val a = ce.select(col("qid"), col("cid").as("a"), col("embedding").as("ea"), col("nrm").as("na"))
    val b = ce.select(col("qid").as("qid_b"), col("cid").as("b"), col("embedding").as("eb"), col("nrm").as("nb"))
    val pairs = a.join(b, col("qid") === col("qid_b") && col("a") =!= col("b"))
      .select(col("qid"), col("a"), col("b"),
        floor(graft.functions.VectorFunctions.dot_product(col("ea"), col("eb")) /
          (col("na") * col("nb")) * lit(1000000.0)).cast("long").as("sim_e6"))
    val penalty = (lamDen - lamNum).toLong
    val out = cand.as[MmrCand].groupByKey(_.qid)
      .cogroup(pairs.as[MmrPair].groupByKey(_.qid)) { (qid, cs, ps) =>
        val cands = cs.toArray.sortBy(c => (c.cid))
        val sim = ps.map(p => (p.a, p.b) -> p.sim_e6).toMap
        val selected = scala.collection.mutable.ArrayBuffer.empty[Long]
        val picks = scala.collection.mutable.ArrayBuffer.empty[MmrPick]
        val remaining = scala.collection.mutable.LinkedHashSet(cands.map(_.cid): _*)
        val rel = cands.map(c => c.cid -> c.rel_e6).toMap
        var step = 1L
        while (step <= k && remaining.nonEmpty) {
          // argmax of the integer MMR score; ties -> smallest cid (the
          // candidate array is cid-sorted, and strict > keeps the first)
          var bestCid = -1L
          var bestSc = Long.MinValue
          remaining.toSeq.sorted.foreach { cid =>
            val sc =
              if (selected.isEmpty) lamNum * rel(cid)
              else lamNum * rel(cid) - penalty * selected.map(s => sim((cid, s))).max
            if (sc > bestSc) { bestSc = sc; bestCid = cid }
          }
          picks += MmrPick(qid, step, bestCid, bestSc)
          selected += bestCid
          remaining -= bestCid
          step += 1
        }
        picks.iterator
      }
    out.toDF().orderBy("qid", "sel_rank")
  }

  /** The scale form: SAME lexical list and SAME fusion, but the semantic
    * list comes from the multi-probe LSH ANN top-k ([[Similarity.annTopK]])
    * instead of the exact brute force — what the fusion runs at a corpus
    * size where an exact cosine list is off the table. Rows-only (the ANN
    * candidate set is approximate); RetrievalSpec pins the fusion core's
    * list-agnosticism (identical input lists ⇒ identical fused output) and
    * the panel-level agreement between the two forms.
    */
  def rrfFusionAnn(spark: SparkSession, d: String, k: Int = 5, listK: Int = 20,
      rrfK: Int = 60, nQueries: Int = 8, maxDf: Int = 256): DataFrame = {
    val sem = Similarity.annTopK(spark, d, k = listK, recallQueries = 0)
      .filter(col("qid") < nQueries)
      .select(col("qid"), col("cid"), col("rank").as("sem_rank"))
    fuse(sem, lexicalTopK(spark, d, listK, nQueries, maxDf), k, rrfK)
  }
}
