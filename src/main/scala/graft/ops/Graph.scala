package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph algorithms over the relational tables — the operator
  * class (bounded-iteration join+aggregate convergence loops, the classic
  * Spark workload shape) the engine's other families don't exercise;
  * [[Dedup.dupClusters]]' pointer-jumping components are the only other
  * iterative op.
  *
  * INTEGER-EXACT PageRank: ranks live as e9-scaled BIGINTs and every
  * per-edge contribution is `rank div out_degree` (floor division), so the
  * fixpoint iteration is bit-identical in any engine — float PageRank is
  * NOT cross-engine comparable (summation order changes the last ulps),
  * which is why public graph benchmarks only compare float ranks to a
  * tolerance. The floor semantics leak a little probability mass per step;
  * that is part of the (documented, deterministic) operator contract, not
  * an accident — the oracle recomputes the identical floors.
  */
object Graph {

  /** PageRank over the bipartite part↔supplier co-occurrence graph from
    * `lineitem` (part nodes = 2·partkey, supplier nodes = 2·suppkey+1 —
    * disjoint id spaces; each distinct (part, supplier) lineitem pair
    * contributes both directed edges). Fixed `iters` damped iterations
    * (d = 0.85 as integer 85/100 arithmetic).
    *
    * Scale shape: each iteration is ONE shuffle — contributions keyed by
    * edge destination with map-side partial sums — joined back to the node
    * list; cost is O(iters · |E|), the textbook distributed PageRank
    * shape. Edges and degrees are computed once and persisted; the
    * iteration count is bounded (a convergence-threshold variant would
    * check the rank delta per round — same loop, one extra aggregate).
    */
  /** One damped iteration: contributions keyed by destination (map-side
    * partial sums), folded back onto the node list. `useBroadcast` selects
    * the small-graph plan (per-node contributions broadcast → ONE shuffle
    * per round) vs the web-scale plan (rank side shuffle-joined on the
    * node key — an unconditional broadcast of the full rank table is the
    * scale-killer once |V| outgrows executor memory). Identical arithmetic
    * either way; GraphSpec pins both plan shapes and their value equality.
    *
    * r21 shape: `rank div deg` is computed ONCE PER NODE (`deg` joins the
    * |V|-row rank table, not the |E|-row edge list), so the big side —
    * cached locally, shuffled in the web-scale plan — carries only
    * (src, dst) and never the degree column: one long per edge fewer in
    * cache and in the web-scale exchange. Per-edge floors are unchanged
    * (every edge of `src` contributed the identical `rank div deg` before),
    * so rank values are bit-identical to the pre-r21 plan.
    */
  private[graft] def iterate(edges: DataFrame, deg: DataFrame, nodes: DataFrame,
      ranks: DataFrame, basePart: Long, useBroadcast: Boolean): DataFrame = {
    def side(df: DataFrame): DataFrame = if (useBroadcast) broadcast(df) else df
    // per-node out-contribution: |V| divisions instead of |E|
    val c = ranks.join(side(deg), Seq("node"))
      .select(col("node").as("src"), expr("rank_e9 div deg").as("c"))
    // Plain long sum is exact here BY INVARIANT: per-destination
    // contributions sum to at most the total mass (1e9), nowhere near
    // 2^63 — the DECIMAL(38,0) accumulate rule is for unbounded money
    // sums, not mass-conserving fixpoints.
    val contrib = edges
      .join(side(c), Seq("src"))
      .select(col("dst").as("node"), col("c"))
      .groupBy("node").agg(sum(col("c")).as("acc"))
    nodes
      .join(side(contrib), Seq("node"), "left")
      .select(col("node"),
        (lit(basePart) + expr("(85 * coalesce(acc, CAST(0 AS BIGINT))) div 100")).as("rank_e9"))
  }

  /** @param broadcastMaxNodes broadcast the |V|-row rank table per round
    *   only while |V| stays under this bound; above it, the rank side
    *   shuffle-joins on the node key (the plan that survives a graph whose
    *   rank table outgrows executor memory). Default 8M rows ≈ 128 MB of
    *   (node, rank_e9) pairs — comfortably broadcastable, far below where
    *   a broadcast build would OOM an executor.
    * @param tolE9 optional convergence stop: when > 0, iteration ends early
    *   once the max per-node |Δrank| of a round is ≤ this (exact integer
    *   compare — no float tolerance). 0 = fixed `iters` rounds, the
    *   oracle-recomputable default.
    */
  def pagerankBipartite(spark: SparkSession, d: String, iters: Int = 3,
      broadcastMaxNodes: Long = 8000000L, tolE9: Long = 0L): DataFrame = {
    require(iters >= 1, "need at least one iteration")
    // distinct ONCE and cache: both union branches (and everything
    // downstream) read the cached pair list instead of re-running the
    // distinct shuffle per branch
    val li = Tables.lineitem(spark, d)
      .select((col("l_partkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct().persist()
    // the |E|-row side stays (src, dst) — two longs per edge; the union is
    // two scans of the cached pair list, never a materialized second copy
    val edges = li.unionAll(li.select(col("dst").as("src"), col("src").as("dst")))
    // out-degrees are a |V|-row table and double as the node list: groupBy
    // makes the keys distinct by construction, so the pre-r21 separate
    // `nodes.distinct()` shuffle+cache and the |E|-row edges⋈deg
    // materialization are both gone
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
      .select(col("src").as("node"), col("deg")).persist()
    val n = deg.count() // driver scalar: one count, bounded
    require(n > 0, "pagerankBipartite: empty graph (lineitem has no part-supplier pairs)")
    val nodes = deg.select("node")
    val basePart = 150000000L / n // floor(0.15e9 / N), exact integer
    val useBroadcast = n <= broadcastMaxNodes
    var ranks = nodes.withColumn("rank_e9", lit(1000000000L / n))
    var i = 1
    var converged = false
    while (i <= iters && !converged) {
      val prev = ranks
      ranks = iterate(edges, deg, nodes, ranks, basePart, useBroadcast)
      // materialize EVERY iteration (the Pregel/GraphX discipline): without
      // this each round's plan embeds all predecessors, so lineage depth —
      // and the re-execution every action (including each round's own
      // broadcast build) pays — grows with the round count (measured ~2×
      // at 3 rounds, and compounding). Persist-then-count pins each round;
      // the previous round's cache is dropped immediately.
      ranks.persist().count()
      if (tolE9 > 0L && i > 1) {
        // convergence stop: one bounded |V|-row aggregate over both cached
        // rank tables; exact integer compare, so the stop round is
        // deterministic run-over-run
        val delta = ranks.join(prev.withColumnRenamed("rank_e9", "prev_e9"), "node")
          .agg(max(abs(col("rank_e9") - col("prev_e9"))).as("d"))
          .head().getLong(0)
        converged = delta <= tolE9
      }
      if (i > 1) prev.unpersist()
      i += 1
    }
    // drop the scaffolding caches; the FINAL round's |V|-row cache is the
    // result and intentionally stays — the returned frame reads it, and a
    // caller wanting it freed unpersists the returned frame's source. One
    // bounded cached relation per call is the deliberate cost.
    li.unpersist(); deg.unpersist()
    ranks.orderBy("node")
  }
}
