package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Quality checks the DuckDB oracle can't express: LSH recall against the
  * exact baselines, simhash locality, and plan-shape assertions (pushdown,
  * broadcast) — the 100 TB-posture guarantees.
  */
class OpsSpec extends SparkSuite {

  test("minhash LSH finds the high-jaccard pairs (recall vs exact)") {
    val exact = Dedup.ngramJaccard(spark, sf, threshold = 0.8)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLsh(spark, sf, threshold = 0.5)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "test data should contain near-dup docs")
    val recall = exact.count(lsh.contains).toDouble / exact.size
    assert(recall >= 0.9, s"LSH recall $recall too low (found ${lsh.size}, exact ${exact.size})")
  }

  test("eval contamination: hits recompute from raw texts; eval slice excluded") {
    import spark.implicits._
    val rows = Dedup.evalContamination(spark, sf).collect()
    assert(rows.nonEmpty, "corpus with near-dups should show contamination")
    assert(rows.forall(_.getLong(0) % 97 != 0), "eval docs must not be flagged")
    // independent recompute from raw texts for every flagged doc
    val texts = Tables.documents(spark, sf).select("doc_id", "text")
      .as[(Long, String)].collect().toMap
    val evalSh = texts.collect { case (id, t) if id % 97 == 0 =>
      Dedup.shingleHashes(t, 5).toSet
    }.fold(Set.empty[Long])(_ ++ _)
    rows.foreach { r =>
      val mine = Dedup.shingleHashes(texts(r.getLong(0)), 5).toSet
      val hits = mine.count(evalSh.contains).toLong
      assert(r.getLong(1) == hits && r.getLong(2) == mine.size.toLong,
        s"doc ${r.getLong(0)}: exported (${r.getLong(1)},${r.getLong(2)}) != ($hits,${mine.size})")
      assert(r.getLong(3) == hits * 1000000L / mine.size)
    }
    // and no contaminated doc was missed
    val flagged = rows.map(_.getLong(0)).toSet
    texts.foreach { case (id, t) =>
      if (id % 97 != 0 && Dedup.shingleHashes(t, 5).exists(evalSh.contains))
        assert(flagged.contains(id), s"doc $id shares an eval shingle but was not flagged")
    }
  }

  test("minhash LSH pairs carry exact-jaccard evidence (invariant column)") {
    import spark.implicits._
    val rows = Dedup.minhashLsh(spark, sf, threshold = 0.5)
      .select("a", "b", "exact_jaccard_e6").collect()
    assert(rows.nonEmpty)
    // the exported invariant must be the TRUE (uncapped) shingle jaccard,
    // recomputed here independently from the raw texts
    val texts = Tables.documents(spark, sf).select("doc_id", "text")
      .as[(Long, String)].collect().toMap
    rows.foreach { r =>
      val sa = Dedup.shingleHashes(texts(r.getLong(0)), 5).toSet
      val sb = Dedup.shingleHashes(texts(r.getLong(1)), 5).toSet
      val n = sa.intersect(sb).size
      val j = math.floor(n.toDouble * 1e6 / (sa.size + sb.size - n)).toLong
      assert(r.getLong(2) == j,
        s"pair (${r.getLong(0)},${r.getLong(1)}): exported ${r.getLong(2)} != recomputed $j")
    }
  }

  test("lshBuckets codegen expression == typed reference path, row for row") {
    // the codegen'd HyperplaneBuckets expression replaced the typed flatMap;
    // bucket ids (home AND multi-probe flips) are the recall contract, so
    // the two paths must agree on the FULL index (every (vec_id, table,
    // probe) cell, not a sample)
    val expr = Similarity.lshBuckets(spark, sf, nTables = 16, bitsPerTable = 5, probes = 2)
      .collect().map(r => ((r.getLong(0), r.getInt(1), r.getInt(2)), r.getLong(3))).toMap
    val typed = Similarity.lshSignaturesTyped(spark, sf, nTables = 16, bitsPerTable = 5, probes = 2)
      .collect().map(r => ((r.getLong(0), r.getInt(1), r.getInt(2)), r.getLong(3))).toMap
    assert(expr.nonEmpty && expr.size == typed.size)
    typed.foreach { case (k, b) =>
      assert(expr(k) == b, s"bucket mismatch at (vec,table,probe)=$k: expr=${expr(k)} typed=$b")
    }
  }

  test("approx_event_stats_check exports its real error, within HLL++ bounds") {
    val rows = Sketches.approxEventStatsCheck(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getLong(r.fieldIndex("approx_users"))
      val exact = r.getLong(r.fieldIndex("exact_users"))
      val err = r.getLong(r.fieldIndex("users_err_e6"))
      assert(err == math.floor(math.abs(approx - exact).toDouble * 1e6 / exact).toLong,
        s"users_err_e6 $err is not the real relative error")
      assert(err < 100000, s"HLL++ error ${err / 1e4}% exceeds 10% (rsd 0.05)")
    }
  }

  test("embedding near-dup pairs: exact sim parity with cosinePairs; high recall on strong pairs") {
    val lsh = Similarity.embeddingNearDupPairs(spark, sf, threshold = 0.3)
      .filter(col("a") < 300 && col("b") < 300)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val exact = Similarity.cosinePairs(spark, sf, maxId = 300, threshold = 0.3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(exact.nonEmpty && lsh.nonEmpty)
    // the rerank is exact: every emitted pair's sim_e6 must equal the
    // all-pairs computation bit-for-bit
    lsh.foreach { case (p, sim) =>
      assert(exact.get(p).contains(sim), s"pair $p: lsh $sim != exact ${exact.get(p)}")
    }
    // candidate generation approximates: strong pairs (sim >= 0.5) must be
    // found with high recall (hyperplane collision prob rises with sim)
    val strong = exact.filter(_._2 >= 500000L)
    if (strong.nonEmpty) {
      val recall = strong.keys.count(lsh.contains).toDouble / strong.size
      assert(recall >= 0.8, s"strong-pair recall $recall (${strong.size} pairs)")
    }
  }

  test("ann_topk_lsh recall vs brute force; exported recall_e6 matches") {
    val exact = Similarity.bruteForceTopK(spark, sf, nQueries = 8, k = 5)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val annRows = Similarity.annTopK(spark, sf, k = 5)
      .filter(col("qid") < 8)
      .select("qid", "cid", "recall_e6").collect()
    val ann = annRows.map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // the exported per-query recall_e6 must equal the recall computed here
    annRows.foreach { r =>
      val q = r.getLong(0)
      val computed = math.floor(
        exact(q).count(ann(q).contains).toDouble * 1e6 / 5.0).toLong
      assert(!r.isNullAt(2) && r.getLong(2) == computed,
        s"qid $q: exported ${r.get(2)} != computed $computed")
    }
    // LSH with few bits on weakly-clustered vectors: partial recall, not zero
    val hits = exact.map { case (q, ex) => ex.count(ann.getOrElse(q, Set.empty).contains) }.sum
    val recall = hits.toDouble / (exact.size * 5)
    assert(recall > 0.2, s"ANN recall $recall suspiciously low")
    // unmeasured queries (outside the bounded query set) export NULL, not 0
    val unmeasured = Similarity.annTopK(spark, sf, k = 5)
      .filter(col("qid") >= 8).select("recall_e6").limit(5).collect()
    assert(unmeasured.forall(_.isNullAt(0)))
  }

  test("incremental ANN: slice discipline, exact rerank parity, panel recall") {
    import spark.implicits._
    val out = Similarity.incrementalAnnTopK(spark, sf).collect()
    assert(out.nonEmpty)
    // queries come from the NEW batch, candidates only from the OLD corpus
    out.foreach { r =>
      assert(r.getLong(0) % 10 == 0, s"qid must be new-batch: $r")
      assert(r.getLong(2) % 10 != 0, s"cid must be old-corpus: $r")
    }
    // exact rerank parity: the reported sim is the exact cosine of the raw
    // vectors (the probe approximates candidate GENERATION, never the score)
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    out.foreach { r =>
      val want = cos(emb(r.getLong(0)), emb(r.getLong(2)))
      assert(math.abs(r.getDouble(3) - want) <= 1e-6, s"sim mismatch at $r")
    }
    // recall evidence: present exactly on the panel (first 8 new ids),
    // NULL beyond it, and equal to the recall computed here from brute force
    val old = emb.filter(_._1 % 10 != 0)
    val got = out.map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    out.foreach { r =>
      val q = r.getLong(0)
      if (q < 80) {
        val exact = old.toSeq.map { case (c, e) => (c, cos(emb(q), e)) }
          .sortBy { case (c, s) => (-s, c) }.take(5).map(_._1).toSet
        val computed = math.floor(exact.count(got(q).contains).toDouble * 1e6 / 5.0).toLong
        assert(!r.isNullAt(4) && r.getLong(4) == computed,
          s"qid $q: exported ${r.get(4)} != computed $computed")
      } else assert(r.isNullAt(4), s"non-panel qid $q must carry NULL recall")
    }
  }

  test("incremental IVF: slice discipline, exact rerank parity, panel recall floor") {
    import spark.implicits._
    val out = Similarity.incrementalIvfTopK(spark, sf).collect()
    assert(out.nonEmpty)
    // queries come from the NEW batch, candidates only from the OLD corpus
    out.foreach { r =>
      assert(r.getLong(0) % 10 == 0, s"qid must be new-batch: $r")
      assert(r.getLong(2) % 10 != 0, s"cid must be old-corpus: $r")
    }
    // exact rerank parity: the probe approximates candidate GENERATION
    // (which cells), never the score
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    out.foreach { r =>
      val want = cos(emb(r.getLong(0)), emb(r.getLong(2)))
      assert(math.abs(r.getDouble(3) - want) <= 1e-6, s"sim mismatch at $r")
    }
    // recall evidence: present exactly on the panel, NULL beyond, equal to
    // the recall computed here from new x old brute force, mean above the
    // floor the operating point is chosen for
    val old = emb.filter(_._1 % 10 != 0)
    val got = out.map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val panelRecalls = scala.collection.mutable.Map.empty[Long, Long]
    out.foreach { r =>
      val q = r.getLong(0)
      if (q < 80) {
        val exact = old.toSeq.map { case (c, e) => (c, cos(emb(q), e)) }
          .sortBy { case (c, s) => (-s, c) }.take(5).map(_._1).toSet
        val computed = math.floor(exact.count(got(q).contains).toDouble * 1e6 / 5.0).toLong
        assert(!r.isNullAt(4) && r.getLong(4) == computed,
          s"qid $q: exported ${r.get(4)} != computed $computed")
        panelRecalls(q) = computed
      } else assert(r.isNullAt(4), s"non-panel qid $q must carry NULL recall")
    }
    val mean = panelRecalls.values.sum.toDouble / math.max(1, panelRecalls.size)
    assert(mean >= 600000.0, s"panel mean recall_e6 $mean below the 0.6 floor")
  }

  test("duplication report: totals reconcile with the per-doc remediation output") {
    import spark.implicits._
    val rep = Dedup.duplicationBySource(spark, sf).collect()
    assert(rep.nonEmpty)
    val srcOf = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source")).as[(Long, String)].collect().toMap
    val clean = Dedup.substringClean(spark, sf)
      .select(col("doc_id"), col("tokens_removed")).as[(Long, Long)].collect()
    val affectedBySrc = clean.groupBy(t => srcOf(t._1))
      .view.mapValues(v => (v.size.toLong, v.map(_._2).sum)).toMap
    rep.foreach { r =>
      val (affected, removed) = affectedBySrc.getOrElse(r.getString(0), (0L, 0L))
      assert(r.getLong(2) == affected, s"${r.getString(0)}: docs_affected")
      assert(r.getLong(4) == removed, s"${r.getString(0)}: tokens_removed")
      assert(r.getLong(3) > 0 && r.getLong(1) > 0)
      assert(r.getLong(5) == removed * 1000000L / r.getLong(3), "removed_ppm arithmetic")
    }
    // the report is corpus-complete: every source appears
    assert(rep.map(_.getString(0)).toSet == srcOf.values.toSet)
  }

  test("source overlap: pair laws hold and counts reconcile with the shingle sets") {
    import spark.implicits._
    val out = Dedup.sourceOverlap(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      val (na, nb, common) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(a < b, s"orientation: $a !< $b")
      assert(common >= 1 && common <= math.min(na, nb), s"$a-$b count bounds")
      assert(r.getLong(6) >= r.getLong(5), s"$a-$b: containment < jaccard")
      assert(r.getLong(5) == common * 1000000L / (na + nb - common), "jaccard_ppm")
      assert(r.getLong(6) == common * 1000000L / math.min(na, nb), "containment_ppm")
    }
    // ground truth from the shingle sets, driver-side
    val srcOf = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source")).as[(Long, String)].collect().toMap
    val bySrc = Dedup.cachedShingles(spark, sf).as[(Long, Long)].collect()
      .groupBy(t => srcOf(t._1)).view.mapValues(_.map(_._2).toSet).toMap
    val expected = (for {
      a <- bySrc.keys; b <- bySrc.keys if a < b
      common = (bySrc(a) & bySrc(b)).size if common > 0
    } yield (a, b) -> common.toLong).toMap
    assert(out.map(r => (r.getString(0), r.getString(1)) -> r.getLong(4)).toMap
      == expected, "overlap matrix != set-intersection ground truth")
  }

  test("source overlap sketch twin: full pair coverage, HLL error bounds vs exact") {
    import spark.implicits._
    val rows = Dedup.sourceOverlapApprox(spark, sf).collect()
    val nSrc = Tables.documents(spark, sf).select("source").distinct().count()
    assert(rows.length.toLong == nSrc * (nSrc - 1) / 2,
      "the sketch matrix covers every source pair, overlap or not")
    // exact per-source distinct shingle counts, driver-side
    val srcOf = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source")).as[(Long, String)].collect().toMap
    val bySrc = Dedup.cachedShingles(spark, sf).as[(Long, Long)].collect()
      .groupBy(t => srcOf(t._1)).view.mapValues(_.map(_._2).toSet).toMap
    rows.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      assert(a < b, s"orientation: $a !< $b")
      val (estA, estB, estCommon) = (r.getLong(2), r.getLong(3), r.getLong(4))
      val (nA, nB) = (bySrc(a).size.toLong, bySrc(b).size.toLong)
      // per-sketch estimates: lgK=14 has RSE ~0.8%; 5% is a generous gate
      assert(math.abs(estA - nA) <= math.max(4L, (0.05 * nA).toLong),
        s"$a size estimate $estA vs exact $nA")
      assert(math.abs(estB - nB) <= math.max(4L, (0.05 * nB).toLong),
        s"$b size estimate $estB vs exact $nB")
      // inclusion-exclusion compounds three estimates — bound the
      // intersection error by a share of the involved set sizes
      val exactCommon = (bySrc(a) & bySrc(b)).size.toLong
      assert(r.getLong(7) == exactCommon, s"$a-$b evidence column")
      assert(math.abs(estCommon - exactCommon) <=
        math.max(8L, (0.05 * (nA + nB)).toLong),
        s"$a-$b intersection estimate $estCommon vs exact $exactCommon")
    }
    // determinism: HLL registers are max-based, insertion order irrelevant
    val again = Dedup.sourceOverlapApprox(spark, sf).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("incremental source overlap: merged sketches track the from-scratch matrix") {
    val rows = Dedup.incrementalSourceOverlap(spark, sf).collect()
    val nSrc = Tables.documents(spark, sf).select("source").distinct().count()
    assert(rows.length.toLong == nSrc * (nSrc - 1) / 2)
    rows.foreach { r =>
      val merged = r.getLong(4)
      val full = r.getLong(7)
      // union of partial sketches vs the direct sketch: register-identical
      // in dense mode; sparse-mode promotion can differ by a hair — bound
      // the gap at 2% of the involved sizes plus a small absolute slack
      val tol = math.max(8L, (0.02 * (r.getLong(2) + r.getLong(3))).toLong)
      assert(math.abs(merged - full) <= tol,
        s"${r.getString(0)}-${r.getString(1)}: merged $merged vs full $full")
    }
    // the persisted old-slice sketch store round-trips: a fresh session
    // loads it (no rebuild) and produces the identical matrix
    val before = AnnStore.buildCount.get()
    Memo.clear(spark)
    val again = Dedup.incrementalSourceOverlap(spark, sf).collect()
    assert(AnnStore.buildCount.get() == before,
      "fresh session must LOAD the old-slice sketches, not rebuild")
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("semantic dedup: group laws + within-cell completeness vs ground truth") {
    import spark.implicits._
    val out = Similarity.semanticDedup(spark, sf).collect()
    val n = Tables.embeddings(spark, sf).count()
    assert(out.length.toLong == n, "one verdict row per corpus vector")
    // groups partition the corpus; exactly one keeper per group, and it is
    // the group minimum (the canonical-selection contract)
    val byGroup = out.groupBy(_.getLong(2))
    byGroup.foreach { case (g, rows) =>
      assert(rows.count(_.getBoolean(4)) == 1, s"group $g: keeper count")
      assert(rows.filter(_.getBoolean(4)).head.getLong(0) == rows.map(_.getLong(0)).min,
        s"group $g: keeper is not the min id")
      assert(rows.map(_.getLong(0)).min == g, s"group $g: label is not the min id")
      rows.foreach(r => assert(r.getLong(3) == rows.length, s"group $g: n_group"))
    }
    // ground truth: within-cell τ-pairs computed driver-side from the raw
    // embeddings + the exported cell column; the operator must connect
    // EXACTLY the components of that graph (completeness + nothing extra)
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .collect().toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d0 = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d0 += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      d0 / (math.sqrt(na) * math.sqrt(nb))
    }
    val cellOf = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ids = emb.keys.toSeq.sorted
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r0 = x; while (parent.getOrElse(r0, r0) != r0) r0 = parent(r0); r0
    }
    for (i <- ids.indices; j <- (i + 1) until ids.length) {
      val (a, b) = (ids(i), ids(j))
      if (cellOf(a) == cellOf(b) &&
          math.floor(cos(emb(a), emb(b)) * 1e6).toLong >= 400000L) {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
    }
    val expected = ids.map(x => x -> find(x)).toMap
    val got = out.map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == expected, "group labels != within-cell τ-graph components")
    // the prune actually bites at test scale: some duplicates exist
    assert(out.exists(!_.getBoolean(4)), "no semantic duplicates found — threshold inert")
  }

  test("incremental semantic dedup: driver-side replay of the probe semantics") {
    import spark.implicits._
    val out = Similarity.incrementalSemanticDedup(spark, sf).collect()
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .collect().toMap
    val newIds = emb.keys.filter(_ % 10 == 0).toSeq.sorted
    val oldIds = emb.keys.filter(_ % 10 != 0).toSeq.sorted
    assert(out.map(_.getLong(0)).toSeq == newIds, "one row per new vector, id-ordered")
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d0 = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d0 += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      d0 / (math.sqrt(na) * math.sqrt(nb))
    }
    // replay: assignment to the persisted old-slice centroids, the nProbe
    // probe list, the cell-restricted candidate set, the exact best
    val cents = Similarity.ivfCentroids(spark, sf, 64, excludeMod = 10)
    val cellOfOld = oldIds.map(c => c -> Similarity.nearestCentroid(emb(c), cents)).toMap
    out.foreach { r =>
      val q = r.getLong(0)
      val probed = Similarity.nearestCentroids(emb(q), cents, 24).toSet
      val cands = oldIds.filter(c => probed(cellOfOld(c)))
      if (cands.isEmpty) {
        assert(r.isNullAt(1) && r.isNullAt(2) && !r.getBoolean(3), s"qid $q: empty-cell totality")
      } else {
        // winner = max (raw sim, then min cid) over the probed candidates
        val best = cands.map(c => (c, cos(emb(q), emb(c))))
          .minBy { case (c, s0) => (-s0, c) }
        val bestE6 = math.floor(best._2 * 1e6).toLong
        assert(r.getLong(1) == best._1, s"qid $q: winner ${r.getLong(1)} != ${best._1}")
        assert(r.getLong(2) == bestE6, s"qid $q: sim ${r.getLong(2)} != $bestE6")
        assert(r.getBoolean(3) == (bestE6 >= 400000L), s"qid $q: verdict law")
      }
    }
    // one-sided error law: every positive is a TRUE tau-pair (the cell
    // prune can only cause false negatives, never false positives)
    out.filter(_.getBoolean(3)).foreach { r =>
      assert(math.floor(cos(emb(r.getLong(0)), emb(r.getLong(1))) * 1e6).toLong >= 400000L)
    }
  }

  test("ivf cell stats: cells partition the corpus, sims bounded, deterministic") {
    val out = Similarity.ivfCellStats(spark, sf).collect()
    assert(out.nonEmpty && out.length <= 64)
    assert(out.map(_.getLong(1)).sum == Tables.embeddings(spark, sf).count(),
      "cell member counts must partition the corpus exactly")
    out.foreach { r =>
      assert(r.getLong(2) <= 1000000L && r.getLong(2) >= -1000000L,
        s"mean sim out of cosine range: $r")
    }
    // per-row floor-scaling before the integer mean makes the stat
    // independent of partitioning/summation order: a second run is equal
    val again = Similarity.ivfCellStats(spark, sf).collect()
    assert(out.toSeq == again.toSeq)
  }

  test("ivf_topk recall vs brute force; exported recall_e6 matches") {
    val exact = Similarity.bruteForceTopK(spark, sf, nQueries = 8, k = 5)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val ivfRows = Similarity.ivfTopK(spark, sf, k = 5, nQueries = 8)
      .select("qid", "cid", "recall_e6").collect()
    val ivf = ivfRows.map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    ivfRows.foreach { r =>
      val q = r.getLong(0)
      val computed = math.floor(
        exact(q).count(ivf(q).contains).toDouble * 1e6 / 5.0).toLong
      assert(!r.isNullAt(2) && r.getLong(2) == computed,
        s"qid $q: exported ${r.get(2)} != computed $computed")
    }
    val hits = exact.map { case (q, ex) => ex.count(ivf.getOrElse(q, Set.empty).contains) }.sum
    val recall = hits.toDouble / (exact.size * 5)
    assert(recall > 0.2, s"IVF recall $recall suspiciously low")
    // structural: every query answered with exactly k ranked rows
    val perQ = Similarity.ivfTopK(spark, sf, k = 5, nQueries = 8)
      .groupBy("qid").count().collect().map(_.getLong(1))
    assert(perQ.forall(_ == 5L))
  }

  test("simhash: near-identical docs land within small hamming distance") {
    import spark.implicits._
    val pairs = Dedup.ngramJaccard(spark, sf, threshold = 0.9)
      .select("a", "b").as[(Long, Long)].collect()
    assume(pairs.nonEmpty)
    val fp = Dedup.simhash(spark, sf).as[(Long, Long)].collect().toMap
    val hams = pairs.toSeq.map { case (a, b) =>
      java.lang.Long.bitCount(fp(a) ^ fp(b))
    }
    assert(hams.min <= 6, s"simhash not locality-sensitive: min hamming ${hams.min}")
  }

  test("simhashPairs: every reported pair is within the hamming bound") {
    import spark.implicits._
    val fp = Dedup.simhash(spark, sf).as[(Long, Long)].collect().toMap
    val pairs = Dedup.simhashPairs(spark, sf, maxHamming = 3)
      .as[(Long, Long, Long)].collect()
    assert(pairs.forall { case (a, b, h) =>
      h <= 3 && java.lang.Long.bitCount(fp(a) ^ fp(b)) == h
    })
    // completeness within the banding guarantee: hamming<=3 pairs share a chunk
    val all = fp.toSeq
    val expected = for {
      i <- all.indices; j <- (i + 1) until all.size
      if java.lang.Long.bitCount(all(i)._2 ^ all(j)._2) <= 3
    } yield (math.min(all(i)._1, all(j)._1), math.max(all(i)._1, all(j)._1))
    assert(expected.toSet == pairs.map(p => (p._1, p._2)).toSet)
  }

  test("train/test split: no near-dup cluster straddles the split") {
    import spark.implicits._
    val rows = TextOps.trainTestSplit(spark, sf)
      .select("cluster_id", "split").as[(Long, String)].collect()
    assert(rows.nonEmpty)
    val perCluster = rows.groupBy(_._1).values
    assert(perCluster.forall(_.map(_._2).distinct.length == 1),
      "a cluster appears in both splits")
    val trainFrac = rows.count(_._2 == "train").toDouble / rows.length
    assert(trainFrac > 0.75 && trainFrac < 0.98, s"train fraction $trainFrac off target")
  }

  test("epoch shuffle: per-epoch permutation, contiguous shard positions, epochs differ") {
    import spark.implicits._
    val rows = TextOps.epochShuffle(spark, sf)
      .as[(Long, Long, Long, Long)].collect() // (epoch, shard, pos, doc_id)
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.length == 2 * nDocs, "each epoch visits every document once")
    val byEpoch = rows.groupBy(_._1)
    assert(byEpoch.keySet == Set(0L, 1L))
    val allDocs = Tables.documents(spark, sf)
      .select("doc_id").as[Long].collect().toSet
    byEpoch.values.foreach { ep =>
      assert(ep.map(_._4).toSet == allDocs, "an epoch is a permutation of the corpus")
      // positions within each shard are contiguous 1..n — a loader can
      // stream a shard by pos with no gaps
      ep.groupBy(_._2).values.foreach { sh =>
        assert(sh.map(_._3).sorted.toSeq == (1L to sh.length).toSeq)
      }
    }
    // different epochs yield different orders (md5 keyed by epoch): compare
    // the doc sequence in (shard, pos) order
    def order(ep: Array[(Long, Long, Long, Long)]): Seq[Long] =
      ep.sortBy(r => (r._2, r._3)).map(_._4).toSeq
    assert(order(byEpoch(0L)) != order(byEpoch(1L)), "epochs must reshuffle")
    // determinism: a second evaluation is identical
    val again = TextOps.epochShuffle(spark, sf).as[(Long, Long, Long, Long)].collect()
    assert(rows.toSeq == again.toSeq)
  }

  test("clusterPairs: transitive chains land in one component (min label)") {
    import spark.implicits._
    // chain 1-2-3 (no direct 1-3 edge), isolated pair 10-11, pair 5-20
    val pairs = Seq((2L, 3L), (1L, 2L), (10L, 11L), (5L, 20L)).toDF("a", "b")
    val got = Dedup.clusterPairs(pairs).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L,
      5L -> 5L, 20L -> 5L))
  }

  test("clusterPairs: 40-node path graph converges within few rounds (pointer jump)") {
    import spark.implicits._
    // diameter 39 — plain min-propagation would need 39 rounds; pointer
    // jumping must finish in O(log n), well under maxIters = 10.
    // localLimit = 0 forces the DISTRIBUTED loop (the local union-find path
    // is covered by the transitive-chain test above).
    val chain = (0L until 40L).sliding(2).map(s => (s.head, s(1))).toSeq.toDF("a", "b")
    val got = Dedup.clusterPairs(chain, maxIters = 10, localLimit = 0)
      .as[(Long, Long)].collect().toMap
    assert(got.size == 40 && got.values.forall(_ == 0L))
  }

  test("containmentPairs: catches an embedded quote symmetric Jaccard misses") {
    import spark.implicits._
    val big = (1 to 60).map(i => s"w$i").mkString(" ")
    val quote = (20 to 30).map(i => s"w$i").mkString(" ") // fully inside big
    val docs = Seq((1L, big), (2L, quote), (3L, "entirely unrelated words " +
      "about different topics nothing shared here at all truly")).toDF("doc_id", "text")
    val sh = Dedup.shingles(docs)
    // jaccard at the dedup threshold misses the pair (|quote|/|big| ~ 0.13)
    assert(Dedup.jaccardPairs(sh, threshold = 0.5, maxDf = 256).count() == 0)
    // ...while containment flags exactly (quote contained-in big)
    val caught = Dedup.containmentPairsOf(sh, 900000L, 256).collect()
    assert(caught.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((2L, 1L)),
      caught.mkString(";"))
    assert(caught.head.getLong(4) == 1000000L, "full embedding must score 1e6 ppm")
    // driver-side recompute of the containment on live data
    val out = Dedup.containmentPairs(spark, sf).collect()
    val sizes = Dedup.shingles(Tables.documents(spark, sf)).groupBy("doc_id")
      .agg(count(lit(1)).as("n")).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.nonEmpty)
    out.foreach { r =>
      val (cd, ct) = (r.getLong(0), r.getLong(1))
      assert(sizes(cd) <= sizes(ct), s"contained side $cd is the larger set")
      assert(r.getLong(3) == math.min(sizes(cd), sizes(ct)))
      assert(r.getLong(4) == r.getLong(2) * 1000000L / r.getLong(3))
      assert(r.getLong(4) >= 900000L)
    }
  }

  test("jaccardPairs: boilerplate shingle past maxDf generates no pairs") {
    import spark.implicits._
    // 10 docs, all sharing one boilerplate 5-gram; docs 0 and 1 additionally
    // share real content. With the df cap the boilerplate is a stop-shingle,
    // so candidate generation (threshold 0 exposes it) yields ONLY (0, 1) —
    // not the 45 all-pairs a hot shingle would otherwise square into.
    val boiler = "all rights reserved by corp"
    val docs = (0L until 10L).map { i =>
      val body =
        if (i <= 1) s"shared near duplicate body text here variant $i"
        else s"doc$i u${i}a u${i}b u${i}c u${i}d u${i}e u${i}f"
      (i, s"$boiler $body")
    }.toDF("doc_id", "text")
    val capped = Dedup.jaccardPairs(Dedup.shingles(docs), threshold = 0.0, maxDf = 4)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(capped == Set((0L, 1L)), s"expected only (0,1), got $capped")
    val uncapped = Dedup.jaccardPairs(Dedup.shingles(docs), threshold = 0.0, maxDf = 1000)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(uncapped.size == 45, s"sanity: without cap all pairs meet, got ${uncapped.size}")
  }

  test("variant shredded storage: typed_value lands in parquet, values roundtrip") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-variant-shred").toString
    // deterministic subset: LIMIT without ORDER BY may pick different rows
    // across the two independent evaluations below
    val src = Tables.events(spark, sf).orderBy("event_id").limit(200)
      .select(col("event_id"), parse_json(col("props")).as("v"))
    VariantStorage.writeShredded(src, dir)
    // the parquet footer must contain the shredded typed_value group
    val pf = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet")).head
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(pf.getAbsolutePath),
        spark.sessionState.newHadoopConf()))
    val schema = try reader.getFooter.getFileMetaData.getSchema.toString finally reader.close()
    assert(schema.contains("typed_value"), s"no shredded column in:\n$schema")
    // typed path extraction over the shredded file matches the source values
    val back = VariantStorage.readBack(spark, dir)
      .select(col("event_id"), variant_get(col("v"), "$.k", "int").as("k"))
      .as[(Long, Int)].collect().toMap
    val orig = Tables.events(spark, sf).orderBy("event_id").limit(200)
      .select(col("event_id"), get_json_object(col("props"), "$.k").cast("int"))
      .as[(Long, Int)].collect().toMap
    assert(back == orig && back.nonEmpty)
  }

  test("variant get semantics: missing path is NULL either way; try_ guards bad casts") {
    import spark.implicits._
    val df = Seq("""{"k": 5, "s": "not a number"}""").toDF("j")
      .select(parse_json(col("j")).as("v"))
    // missing path: plain variant_get already yields NULL (why variantProps
    // does not need try_variant_get on its absent-path column)
    val missing = df.select(
      variant_get(col("v"), "$.nope", "string").as("plain"),
      try_variant_get(col("v"), "$.nope", "string").as("tried")).head()
    assert(missing.isNullAt(0) && missing.isNullAt(1))
    // cast failure: the one case where try_ differs — NULL instead of throwing
    assert(df.select(try_variant_get(col("v"), "$.s", "int")).head().isNullAt(0))
    intercept[Exception] {
      df.select(variant_get(col("v"), "$.s", "int")).head()
    }
  }

  test("variant_props scans the shredded layout: no VariantType survives the scan") {
    val df = VariantOps.variantProps(spark, sf)
    // pushVariantIntoScan must replace the variant column in the scan schema
    // with a struct of the requested fields — the per-row binary decode the
    // round-3 bench paid is gone when no VariantType reaches the scan output.
    // Asserted on the optimized LOGICAL leaves (the rule rewrites the
    // relation output); the physical plan hides behind AQE's adaptive root.
    val leaves = df.queryExecution.optimizedPlan.collectLeaves()
    assert(leaves.nonEmpty, "expected a scan relation in the plan")
    leaves.foreach { rel =>
      rel.output.foreach { a =>
        assert(!a.dataType.sql.toLowerCase.contains("variant"),
          s"scan still outputs variant: ${a.name}: ${a.dataType.sql}")
      }
    }
    // results identical to the direct parse_json path (incl. absent → NULL,
    // which reads the shredded residual, not a typed column)
    val direct = Tables.events(spark, sf)
      .select(col("event_id"),
        variant_get(parse_json(col("props")), "$.k", "int").as("k"),
        variant_get(parse_json(col("props")), "$.missing", "string").as("absent"),
        col("event_type"))
      .orderBy("event_id").collect()
    val shredded = df.collect()
    assert(shredded.sameElements(direct) && shredded.nonEmpty)
  }

  test("session-conf hygiene: per-read nanos option; shredded flags don't break plain variant readers") {
    import org.apache.spark.sql.types.LongType
    // Tables.events reads TIMESTAMP(NANOS) via a per-read option — the
    // session conf must stay untouched at both plan and action time
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong") // back to default false
    val ev = Tables.events(spark, sf)
    assert(ev.schema("ts").dataType == LongType)
    assert(ev.select("ts").limit(3).collect().length == 3)
    // the read above succeeded WITH the session conf at its default (false):
    // the explicit LongType schema alone drives the NANOS→long decode, and
    // the session stays clean
    assert(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "false",
      "Tables.events mutated session conf")
    // the widening-only shredded-read flags: a PLAIN (unshredded) variant
    // file written and read in the same session is unaffected
    VariantStorage.enableShredded(spark)
    val dir = java.nio.file.Files.createTempDirectory("graft-plain-variant").toString
    spark.range(3).selectExpr("id", """parse_json(concat('{"k":', id, '}')) as v""")
      .write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
      .selectExpr("id", "variant_get(v, '$.k', 'long') as k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(back == Set((0L, 0L), (1L, 1L), (2L, 2L)))
  }

  test("binned range join equals the naive inequality join") {
    import spark.implicits._
    val weekMs = 7L * 86400000L
    val o = Tables.orders(spark, sf).select(
      col("o_custkey").as("key"), col("o_orderkey").as("id"),
      (unix_timestamp(col("o_orderdate")) * 1000L).as("ts"))
    val binned = RangeJoin.windowPairs(o, o, weekMs)
      .select("l_id", "r_id").as[(Long, Long)].collect().toSet
    val l = o.select(col("key"), col("id").as("l_id"), col("ts").as("l_ts"))
    val r = o.select(col("key").as("rk"), col("id").as("r_id"), col("ts").as("r_ts"))
    val naive = l.join(r, col("key") === col("rk") &&
        col("r_ts") > col("l_ts") && col("r_ts") <= col("l_ts") + weekMs)
      .select("l_id", "r_id").as[(Long, Long)].collect().toSet
    assert(binned.nonEmpty && binned == naive)
  }

  test("quality filter: keep verdict is consistent with its own rule columns") {
    import spark.implicits._
    val rows = TextOps.qualityFilter(spark, sf)
      .select("n_words", "mean_word_len", "symbol_ratio", "n_stop", "keep")
      .as[(Long, Double, Double, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (w, mwl, sym, stop, keep) =>
      val expect = if (w >= 50 && w <= 100000 && mwl >= 3.0 && mwl <= 10.0 &&
        sym < 0.1 && stop >= 2) 1L else 0L
      assert(keep == expect, s"($w, $mwl, $sym, $stop) -> $keep")
    }
  }

  test("pii redaction changes the text digest exactly when something matched") {
    import spark.implicits._
    val joined = TextOps.redactPii(spark, sf)
      .join(Tables.documents(spark, sf).select(col("doc_id"), md5(col("text")).as("orig_md5")), "doc_id")
      .select(col("n_emails") + col("n_ips") + col("n_phones"),
        (col("redacted_md5") =!= col("orig_md5")).cast("long"))
      .as[(Long, Long)].collect()
    joined.foreach { case (hits, changed) =>
      assert((hits > 0) == (changed == 1L), s"hits=$hits changed=$changed")
    }
  }

  test("pii redaction: positive path — counts and exact replacements") {
    import spark.implicits._
    // the sf docs contain no PII, so the operator's match path is exercised
    // here with synthetic rows (counts AND the exact redacted text via md5)
    val docs = Seq(
      (1L, "contact bob.smith+x@example-mail.co or 10.0.255.1 or 415-555-1234 now"),
      (2L, "no pii here at all"),
      (3L, "two mails: a@b.io c.d@e.org and ip 1.2.3.4")
    ).toDF("doc_id", "text")
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val rows = TextOps.redactPiiDocs(docs)
      .as[(Long, Long, Long, Long, String)].collect().sortBy(_._1)
    assert(rows(0) == ((1L, 1L, 1L, 1L, md5hex("contact [EMAIL] or [IP] or [PHONE] now"))))
    assert(rows(1) == ((2L, 0L, 0L, 0L, md5hex("no pii here at all"))))
    assert(rows(2) == ((3L, 2L, 1L, 0L, md5hex("two mails: [EMAIL] [EMAIL] and ip [IP]"))))
  }

  test("corpus curation = quality ∩ exact-canonical − near-dup losers") {
    import spark.implicits._
    val kept = TextOps.curateCorpus(spark, sf).as[Long].collect().toSet
    val quality = TextOps.qualityFilter(spark, sf).filter(col("keep") === 1L)
      .select("doc_id").as[Long].collect().toSet
    val canon = Dedup.exact(spark, sf).select("canonical_id").as[Long].collect().toSet
    val losers = Dedup.ngramJaccard(spark, sf).select("b").as[Long].collect().toSet
    assert(kept.nonEmpty)
    assert(kept.subsetOf(quality) && kept.subsetOf(canon))
    assert(kept.intersect(losers).isEmpty)
    assert(kept == (quality intersect canon) -- losers)
  }

  test("narrow shingle generation matches the SQL expression path exactly") {
    import spark.implicits._
    val texts = Seq((1L, "  a b  c d e f g "), (2L, "one two three four five"),
      (3L, "too short"), (4L, "x x x x x x"), (5L, "päck my böx with five dozen jugs"))
    val docs = texts.toDF("doc_id", "text")
    // the original DataFrame-expression generator, kept here as the reference
    val sql = docs.select(col("doc_id"), split(trim(col("text")), " ").as("w"))
      .filter(size(col("w")) >= 5)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(w) - 5), i -> xxhash64(" +
          "concat_ws(' ', w[i], w[i + 1], w[i + 2], w[i + 3], w[i + 4])))")).as("shingle"))
      .distinct().as[(Long, Long)].collect().toSet
    val narrow = Dedup.shingles(docs).as[(Long, Long)].collect().toSet
    assert(narrow == sql)
  }

  test("simhash typed map uses Spark's own xxhash64 (bit-compatible)") {
    import spark.implicits._
    val toks = Seq("alpha", "βeta", "", "the quick", "7")
    val sql = toks.toDF("t").select(xxhash64(col("t"))).as[Long].collect().toSeq
    val jvm = toks.map { t =>
      val b = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, b.length, 42L)
    }
    assert(sql == jvm)
  }

  test("cohortRetention: driver recompute of the full triangle; events conserved") {
    val out = Sessions.cohortRetention(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3)))).toMap
    val ud = Tables.events(spark, sf)
      .select(col("user_id"), Sessions.dayIdx(spark, sf).as("day"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val first = ud.groupBy(_._1).map { case (u, rs) => (u, rs.map(_._2).min) }
    val want = ud.groupBy { case (u, day) => (first(u), day - first(u)) }
      .map { case (k, rs) => (k, (rs.map(_._1).distinct.length.toLong, rs.length.toLong)) }
    assert(out == want)
    // every event lands in exactly one cell; offsets are non-negative
    assert(out.values.map(_._2).sum == ud.length.toLong)
    assert(out.keys.forall(_._2 >= 0L))
  }

  test("sessionColift: driver recompute; independence baseline; symmetric-pair hygiene") {
    val out = Sessions.sessionColift(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
    assert(out.nonEmpty)
    // driver recompute: sessionize, distinct types per session, pair counts
    val gap = 30 * 60 * 1000L
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"),
        Sessions.msFloor(spark, sf).as("ms"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val sessions = ev.groupBy(_._1).toSeq.flatMap { case (u, rs) =>
      var idx = 0L; var prev = Long.MinValue
      rs.sortBy(_._2).toSeq.map { case (_, _, ms, tpe) =>
        if (prev == Long.MinValue || ms - prev > gap) idx += 1
        prev = ms
        ((u, idx), tpe)
      }
    }
    val perSession = sessions.groupBy(_._1).map { case (k, rs) => (k, rs.map(_._2).toSet) }
    val nSessions = perSession.size.toLong
    val typeCount = perSession.values.toSeq.flatten.groupBy(identity)
      .map { case (t, xs) => (t, xs.size.toLong) }
    val want = perSession.values.toSeq
      .flatMap(ts => ts.toSeq.sorted.combinations(2).map(p => (p(0), p(1))))
      .groupBy(identity).map { case ((a, b), xs) =>
        val (na, nb, nBoth) = (typeCount(a), typeCount(b), xs.size.toLong)
        ((a, b), (nBoth, na, nb, nSessions,
          (BigInt(nBoth) * nSessions * 1000000 / (BigInt(na) * nb)).toLong))
      }
    assert(out.toMap == want)
    // unordered pairs appear once, in lexical order
    assert(out.forall { case ((a, b), _) => a < b })
  }

  test("cohortChurn: driver recompute; recent cohorts excluded; ppm bounded") {
    val horizon = 7L
    val out = Sessions.cohortChurn(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val ud = Tables.events(spark, sf)
      .select(col("user_id"), Sessions.dayIdx(spark, sf).as("day"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val spans = ud.groupBy(_._1).map { case (u, rs) =>
      (u, (rs.map(_._2).min, rs.map(_._2).max)) }
    val maxDay = spans.values.map(_._2).max
    val want = spans.values.toSeq
      .filter { case (first, _) => first + horizon <= maxDay }
      .groupBy(_._1).map { case (cohort, rs) =>
        val n = rs.size.toLong
        val churned = rs.count { case (_, last) => last < maxDay - horizon }.toLong
        (cohort, (n, churned, churned * 1000000L / n))
      }
    assert(out == want)
    assert(out.nonEmpty)
    // no cohort younger than the horizon is judged
    assert(out.keys.forall(_ + horizon <= maxDay))
    assert(out.values.forall { case (n, c, ppm) => c <= n && ppm <= 1000000L })
  }

  test("eventTrigrams: driver recompute; shares bounded; incremental matches the full log") {
    val out = Sessions.eventTrigrams(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1), r.getString(2)),
        (r.getLong(3), r.getLong(4)))).toMap
    assert(out.nonEmpty)
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val triples = ev.groupBy(_._1).toSeq.flatMap { case (_, rs) =>
      rs.sortBy(_._2).map(_._3).toSeq.sliding(3).collect {
        case Seq(a, b, c) => (a, b, c) }
    }
    val total = triples.size.toLong
    val want = triples.groupBy(identity).map { case (k, xs) =>
      (k, (xs.size.toLong, xs.size.toLong * 1000000L / total)) }
    assert(out == want)
    assert(out.values.map(_._1).sum == total)
    // the order-2 boundary state reproduces the full log exactly
    assert(Sessions.incrementalTrigrams(spark, sf).collect().toSeq ==
      Sessions.eventTrigrams(spark, sf).collect().toSeq)
  }

  test("rfmSegments: driver recompute of quintile boundaries and the segment matrix") {
    val out = Analytics.rfmSegments(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)), (r.getLong(3), r.getLong(4))))
      .toMap
    assert(out.nonEmpty)
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), Sessions.dayIdx(spark, sf).as("day"),
        graft.ops.Exact.c2(col("value")).as("c2"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val maxDay = ev.map(_._2).max
    val users = ev.groupBy(_._1).map { case (u, rs) =>
      (u, maxDay - rs.map(_._2).max, rs.length.toLong, rs.map(_._3).sum) }.toSeq
    val n = users.length.toLong
    def quints(vals: Seq[Long]): Seq[Long] = {
      val sorted = vals.sorted
      (1 to 4).map(k => sorted(((k * n + 4) / 5 - 1).toInt))
    }
    val (rq, fq, mq) = (quints(users.map(_._2)), quints(users.map(_._3)), quints(users.map(_._4)))
    def bucket(v: Long, qs: Seq[Long]): Long = 1L + qs.count(v > _)
    val want = users.groupBy { case (_, r, f, m) =>
      (bucket(r, rq), bucket(f, fq), bucket(m, mq)) }
      .map { case (k, rs) => (k, (rs.size.toLong, rs.map(_._4).sum)) }
    assert(out == want)
    // every user lands in exactly one cell; buckets are in 1..5
    assert(out.values.map(_._1).sum == n)
    assert(out.keys.forall { case (a, b, c) =>
      Seq(a, b, c).forall(x => x >= 1L && x <= 5L) })
  }

  test("userStickiness: driver recompute; day-0 ratio is 1e6; ratios bounded") {
    val out = Sessions.userStickiness(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out.nonEmpty)
    val dau = Tables.events(spark, sf)
      .select(col("user_id"), Sessions.dayIdx(spark, sf).as("day"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val minDay = dau.map(_._2).min
    val want = dau.map(_._2).distinct.map { d =>
      val dauN = dau.count(_._2 == d).toLong
      val mauN = dau.filter { case (_, x) => x <= d && x > d - 30 }
        .map(_._1).distinct.length.toLong
      (d, (dauN, mauN, dauN * 1000000L / mauN))
    }.toMap
    assert(out == want)
    // the first observed day's trailing window is just itself
    assert(out(minDay)._3 == 1000000L)
    assert(out.values.forall { case (a, m, ppm) => a <= m && ppm <= 1000000L })
  }

  test("userConcentration: driver recompute; p99 head is a subset of the p90 head") {
    val out = Analytics.userConcentration(spark, sf).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val counts = Tables.events(spark, sf).select("user_id")
      .collect().map(_.getLong(0)).groupBy(identity).map(_._2.length.toLong).toSeq
    val n = counts.length.toLong
    val sorted = counts.sorted
    def q(num: Long, den: Long) = sorted(((num * n + den - 1) / den - 1).toInt)
    val total = counts.sum
    def head(t: Long) = {
      val above = counts.filter(_ > t)
      (t, above.length.toLong, above.sum, above.sum * 1000000L / total)
    }
    assert(out == Map("p90" -> head(q(9, 10)), "p99" -> head(q(99, 100))))
    assert(out("p99")._2 <= out("p90")._2 && out("p99")._3 <= out("p90")._3)
  }

  test("the four new incremental rungs reproduce their full-log twins") {
    assert(Temporal.incrementalDrift(spark, sf).collect().toSeq ==
      Temporal.dailyDrift(spark, sf).collect().toSeq)
    assert(Sessions.incrementalStickiness(spark, sf).collect().toSeq ==
      Sessions.userStickiness(spark, sf).collect().toSeq)
    assert(Analytics.incrementalConcentration(spark, sf).collect().toSeq ==
      Analytics.userConcentration(spark, sf).collect().toSeq)
    assert(Analytics.incrementalRfmSegments(spark, sf).collect().toSeq ==
      Analytics.rfmSegments(spark, sf).collect().toSeq)
  }

  test("incrementalChurn: DAU-store min/max spans reproduce the full-log churn") {
    val full = Sessions.cohortChurn(spark, sf).collect().toSeq
    assert(Sessions.incrementalChurn(spark, sf).collect().toSeq == full)
    assert(full.nonEmpty)
  }

  test("incrementalCohortRetention: merged DAU reproduces the full-log triangle exactly") {
    val full = Sessions.cohortRetention(spark, sf).collect().toSeq
    val inc = Sessions.incrementalCohortRetention(spark, sf).collect().toSeq
    assert(inc == full)
    assert(full.nonEmpty)
  }

  test("retentionCurve: offset-0 is 1e6 ppm; denominators shrink with offset; recompute") {
    val out = Sessions.retentionCurve(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
    val tri = Sessions.cohortRetention(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
    val maxDay = tri.map { case ((c, o), _) => c + o }.max
    val sizes = tri.collect { case ((c, 0L), n) => (c, n) }.toMap
    val minCohort = sizes.keys.min
    val want = (0L to (maxDay - minCohort)).map { o =>
      val num = tri.collect { case ((_, `o`), n) => n }.sum
      val den = sizes.collect { case (c, n) if c + o <= maxDay => n }.sum
      (o, (num, den, num * 1000000L / den))
    }
    assert(out.toSeq == want)
    // offset 0: every cohort user is active on their cohort day
    assert(out.head == (0L, (out.head._2._2, out.head._2._2, 1000000L)))
    // denominators are non-increasing in offset (observability only shrinks)
    out.map(_._2._2).sliding(2).foreach { case Array(a, b) => assert(a >= b); case _ => }
  }

  test("incrementalRetentionCurve: DAU-store merge reproduces the full-log curve; " +
      "denominators re-derive") {
    val full = Sessions.retentionCurve(spark, sf).collect().toSeq
    val inc = Sessions.incrementalRetentionCurve(spark, sf).collect().toSeq
    assert(inc == full)
    assert(full.nonEmpty)
    // the observability restriction re-derives from the incremental
    // triangle's own edge: denom(o) = Σ cohort sizes with cohort + o ≤ max
    val tri = Sessions.incrementalCohortRetention(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
    val maxDay = tri.map { case ((c, o), _) => c + o }.max
    val sizes = tri.collect { case ((c, 0L), n) => (c, n) }.toMap
    inc.foreach { r =>
      val o = r.getLong(0)
      val den = sizes.collect { case (c, n) if c + o <= maxDay => n }.sum
      assert(r.getLong(2) == den, s"denominator at offset $o")
    }
  }

  test("eventTransitions: counts and floored ppm recompute; row shares sum to ~1e6") {
    val out = Sessions.eventTransitions(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3), r.getLong(4))))
    val ev = Tables.events(spark, sf).select("user_id", "event_id", "event_type")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val pairs = ev.groupBy(_._1).toSeq.flatMap { case (_, rs) =>
      val seq = rs.sortBy(_._2).map(_._3)
      seq.zip(seq.drop(1))
    }
    val cnt = pairs.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    val rowTot = cnt.groupBy(_._1._1).map { case (p, m) => (p, m.values.sum) }
    val want = cnt.map { case ((p, nx), c) => ((p, nx), (c, rowTot(p), c * 1000000L / rowTot(p))) }
    assert(out.toMap == want)
    // per prev_type, floored ppm shares sum to 1e6 minus at most one floor
    // unit per row (Σ floor(x_i) ∈ (Σx_i − k, Σx_i])
    out.groupBy(_._1._1).foreach { case (p, rows) =>
      val s = rows.map(_._2._3).sum
      assert(s <= 1000000L && s > 1000000L - rows.length, s"ppm sum off for $p: $s")
    }
  }

  test("qualityThresholdSweep: each threshold equals the direct cut; curve monotone") {
    val sweep = TextOps.qualityThresholdSweep(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
    assert(sweep.map(_._1).toSeq == (0L to 10L))
    val stats = TextOps.textStats(spark, sf).select("n_tokens", "quality_score")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val totalDocs = stats.length.toLong
    val totalToks = stats.map(_._1).sum
    sweep.foreach { case (t, (dk, tk, dppm, tppm)) =>
      // floor identity: floor(10q) >= t  <=>  10q >= t (t integer)
      val keep = stats.filter { case (_, q) => q * 10.0 >= t }
      assert(dk == keep.length.toLong, s"docs_kept at thr $t")
      assert(tk == keep.map(_._1).sum, s"tokens_kept at thr $t")
      assert(dppm == dk * 1000000L / totalDocs)
      assert(tppm == tk * 1000000L / totalToks)
    }
    val dks = sweep.sortBy(_._1).map(_._2._1)
    dks.sliding(2).foreach { case Array(a, b) => assert(a >= b); case _ => }
    assert(dks.head == totalDocs, "threshold 0 keeps everything")
  }

  test("incrementalTransitions: boundary-corrected merge reproduces the full log exactly") {
    val full = Sessions.eventTransitions(spark, sf).collect().toSeq
    val inc = Sessions.incrementalTransitions(spark, sf).collect().toSeq
    assert(inc == full)
    assert(full.nonEmpty)
    // the suffix really is non-empty (the boundary correction is exercised)
    val evFrame = Tables.events(spark, sf).select(col("event_id"))
    val cut = Sessions.suffixCut(evFrame, 9)
    val ev = evFrame.collect().map(_.getLong(0))
    assert(ev.count(_ > cut) > 0, "degenerate cut: no arriving suffix")
    assert(ev.count(_ <= cut) > 0, "degenerate cut: no history")
  }

  test("incrementalSessions: boundary-state merge reproduces the full log; a bridge is exercised") {
    val full = Sessions.sessionize(spark, sf).collect().toSeq
    val inc = Sessions.incrementalSessions(spark, sf).collect().toSeq
    assert(inc == full)
    assert(full.nonEmpty)
    // exercise the BRIDGE path explicitly: at the default 30-min gap this
    // corpus has no boundary session spanning the cut, so derive a gap
    // wide enough that at least one user's first suffix event continues
    // the open session, and re-check equality there
    val evFrame = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), Sessions.msFloor(spark, sf).as("ms"))
    val ev = evFrame.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val cut = Sessions.suffixCut(evFrame, 9)
    val perUser = ev.groupBy(_._1).view.mapValues { rs =>
      rs.sortBy(_._2).partition(_._2 <= cut)
    }.filter { case (_, (old, nw)) => old.nonEmpty && nw.nonEmpty }.toMap
    assert(perUser.nonEmpty, "degenerate cut: no user spans it")
    val wideGap = perUser.values.map { case (old, nw) => nw.head._3 - old.last._3 }.min + 1L
    val fullWide = Sessions.sessionize(spark, sf, wideGap).collect().toSeq
    val incWide = Sessions.incrementalSessions(spark, sf, wideGap).collect().toSeq
    assert(incWide == fullWide, "bridged merge diverged from the full log")
    // pin the bridge on the OUTPUT (not the inputs the gap derives from):
    // some emitted session must span the cut — starting at/before a
    // bridged user's last old event and ending at/after their first new
    val bridgedUsers = perUser.collect {
      case (u, (old, nw)) if nw.head._3 - old.last._3 <= wideGap => (u, old.last._3, nw.head._3)
    }
    val incRows = incWide.map(r => (r.getLong(0), r.getLong(3), r.getLong(4)))
    assert(bridgedUsers.exists { case (u, lastOldMs, firstNewMs) =>
      incRows.exists { case (ru, start, end) =>
        ru == u && start <= lastOldMs && end >= firstNewMs
      }
    }, "no emitted session spans the cut — the bridge merge went untested")
  }

  test("raw-events tripwire: ts is monotone in event_id per user (boundary-state precondition)") {
    // incrementalSessions' open-session gap reference and temporalJoin's
    // range tiling both rest on this; a silent testdata regeneration that
    // breaks it must fail HERE, not as an oracle mystery
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), Sessions.msFloor(spark, sf).as("ms"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    ev.groupBy(_._1).foreach { case (u, rs) =>
      val ms = rs.sortBy(_._2).map(_._3)
      ms.sliding(2).foreach {
        case Array(a, b) => assert(a <= b, s"user $u: ts not monotone in event_id")
        case _ =>
      }
    }
  }

  test("qualitySourceMatrix: ppm row laws; marginals reconcile with the sweep") {
    val m = TextOps.qualitySourceMatrix(spark, sf).collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
    assert(m.nonEmpty)
    // per source, floored ppm shares sum into (1e6 − k, 1e6]
    m.groupBy(_._1._1).foreach { case (src, rows) =>
      val d = rows.map(_._2._3).sum
      assert(d <= 1000000L && d > 1000000L - rows.length, s"docs ppm off for $src: $d")
      val t = rows.map(_._2._4).sum
      assert(t <= 1000000L && t > 1000000L - rows.length, s"toks ppm off for $src: $t")
    }
    // cells partition the corpus, and bucket marginals suffix-sum to the
    // threshold sweep's retention counts
    assert(m.map(_._2._1).sum == Tables.documents(spark, sf).count())
    val sweep = TextOps.qualityThresholdSweep(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val byBucket = m.groupBy(_._1._2).map { case (b, rs) => (b, rs.map(_._2._1).sum) }
    (0L to 10L).foreach { t =>
      assert(sweep(t) == byBucket.filter(_._1 >= t).values.sum,
        s"bucket marginal mismatch at thr $t")
    }
  }

  test("plan: cohort_retention has no join — the cohort derives from a window") {
    val df = Sessions.cohortRetention(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"cohort triangle grew a join:\n${plan.take(500)}")
  }

  test("plan: event_changepoint runs ONE data-sized exchange (the daily agg)") {
    val df = Temporal.eventChangepoint(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // allowed exchanges: daily agg to (type, day), re-key to type for the
    // windows, final orderBy range partitioning — anything beyond that
    // means a window stopped reusing the type partitioning. Count only the
    // FINAL plan (AdaptiveSparkPlan.toString appends the initial plan too).
    val exchanges = "Exchange".r.findAllIn(plan.split("== Initial Plan ==").head).size
    assert(exchanges <= 3, s"changepoint plan grew exchanges ($exchanges):\n${plan.take(800)}")
    assert(!plan.contains("Join"), "changepoint should not join")
  }

  test("plan: source_divergence broadcasts the per-source totals, never shuffles them") {
    val df = Scoring.sourceDivergence(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"per-source totals join is not broadcast:\n${plan.take(500)}")
    assert(!plan.contains("CartesianProduct"), "divergence plan degenerated")
  }

  test("msFloorExpr floors negative (pre-1970) ticks like DuckDB epoch_ms, per unit") {
    import spark.implicits._
    val ticks = Seq(-1L, -999999L, -1000000L, -1000001L, 0L, 1L, 999999L,
      1705276800000000000L, -1705276800000000001L)
    for (t <- Seq(1000000L, 1000L, 1L)) {
      val got = ticks.toDF("ts").select(Sessions.msFloorExpr(t).as("ms"))
        .as[Long].collect().toSeq
      val expected = ticks.map(Math.floorDiv(_, t))
      assert(got == expected, s"unit=$t: $got != $expected")
    }
  }

  test("tsTicksPerMs: footer unit turns raw ts into sane epoch-ms") {
    // The driver has regenerated testdata with different ts units (NANOS
    // through round 13, MICROS from round 14). Whatever the current file
    // says, the detected unit must map every event into a plausible epoch
    // window — the failure mode being guarded is a silent 1000× skew that
    // empties every time-window query.
    import spark.implicits._
    val t = Tables.tsTicksPerMs(spark, sf)
    assert(Set(1L, 1000L, 1000000L).contains(t), s"unexpected unit $t")
    val Seq((lo, hi)) = Tables.events(spark, sf)
      .select(Sessions.msFloor(spark, sf).as("ms"))
      .agg(min($"ms"), max($"ms")).as[(Long, Long)].collect().toSeq
    val y2000 = 946684800000L; val y2100 = 4102444800000L
    assert(lo >= y2000 && hi <= y2100, s"ms range [$lo,$hi] out of epoch bounds")
  }

  test("plan: range join executes as an equi-join on (key, bucket), not NLJ") {
    val df = RangeJoin.repeatOrders(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join degenerated to a loop join:\n${plan.take(500)}")
  }

  test("plan: gsi_view's window exchange is not a handful of partitions") {
    val df = CdcQueries.gsiView(spark, sf)
    df.collect()
    // the sharded pk gives ~5 types × 32 shards = ~160 window keys; with 32
    // shuffle partitions every partition holds work — assert the plan has no
    // single-partition exchange before the window
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), s"serial window:\n${plan.take(500)}")
  }

  test("orders pivot equals the plain conditional counts") {
    import spark.implicits._
    val piv = Analytics.ordersPivot(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val plain = Tables.orders(spark, sf)
      .withColumn("y", year(col("o_orderdate")).cast("long"))
      .groupBy("y")
      .agg(count(when(col("o_orderstatus") === "F", 1)).as("f"),
        count(when(col("o_orderstatus") === "O", 1)).as("o"),
        count(when(col("o_orderstatus") === "P", 1)).as("p"))
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(piv == plain && piv.nonEmpty)
  }

  test("embedding stats norm agrees with the native l2_norm expression") {
    import spark.implicits._
    val hof = Similarity.embeddingStats(spark, sf)
      .select("vec_id", "norm_e6").as[(Long, Long)].collect().toMap
    val native = Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        floor(graft.functions.VectorFunctions.l2_norm(col("embedding")) * 1000000.0)
          .cast("long")).as[(Long, Long)].collect().toMap
    assert(hof == native && hof.nonEmpty)
  }

  test("driver t1 smoke: SparkEntry.entry yields rows on sf0.001") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }

  test("plan lint: no query plans a CartesianProduct") {
    // BroadcastNestedLoopJoin with a small broadcast side is fine (topk,
    // cosine pairs); an unbroadcast CartesianProduct is never fine — it
    // means a non-equi join with two big sides slipped into a query.
    val offenders = graft.SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val plan = graft.SparkEntry.queries(name)(spark, sf)
        .queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty, s"cartesian product in: $offenders")
  }

  test("plan: pk prefix filter pushes into the parquet scan") {
    val df = Tables.customer(spark, sf).filter(col("c_name").startsWith("Customer#00000001"))
    val scan = df.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(scan.contains("PushedFilters") && scan.contains("StringStartsWith"),
      s"expected pushed StringStartsWith, got: ${scan.take(400)}")
  }

  test("plan: q1 scans only needed columns (pruning) and stays codegen'd") {
    val df = Analytics.pricingSummary(spark, sf)
    df.collect() // finalize the adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    // codegen'd stages print as "*(n) Op" in the finalized adaptive plan
    assert(plan.contains("*("), s"no WholeStageCodegen stage in:\n${plan.take(500)}")
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def fileScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case f: FileSourceScanExec => Seq(f)
      case a: AdaptiveSparkPlanExec => fileScans(a.executedPlan)
      case q: QueryStageExec => fileScans(q.plan)
      case other => other.children.flatMap(fileScans)
    }
    val scans = fileScans(df.queryExecution.executedPlan).flatMap(_.requiredSchema.fieldNames)
    assert(!scans.contains("l_orderkey"), s"q1 should not read l_orderkey, read: $scans")
    assert(scans.contains("l_quantity"))
  }

  test("plan: q3 broadcasts the filtered customer dimension") {
    val df = Analytics.shippingPriority(spark, sf)
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
  }

  test("sketches: approx distinct within 5% of exact; median inside value range") {
    import spark.implicits._
    val approx = Sketches.approxEventStats(spark, sf)
      .select("event_type", "approx_users", "approx_median_value")
      .as[(String, Long, Double)].collect()
      .map { case (k, u, m) => k -> ((u, m)) }.toMap
    val exact = Sessions.eventTypeStats(spark, sf)
      .select("event_type", "n_users", "min_value", "max_value")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    exact.foreach { case (tpe, (users, lo, hi)) =>
      val (au, am) = approx(tpe)
      assert(math.abs(au - users).toDouble / users <= 0.05, s"$tpe approx_users $au vs $users")
      assert(am >= lo && am <= hi)
    }
  }

  test("salted aggregation equals the plain groupBy exactly") {
    val salted = Skew.saltedEventAgg(spark, sf).collect().map(_.toSeq).toSeq
    val plain = Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        Exact.sumLong(Exact.c2(col("value"))).as("total_value_c2"))
      .orderBy("event_type").collect().map(_.toSeq).toSeq
    assert(salted == plain)
  }

  test("clustered layout: disjoint per-file zone maps; point scan skips row groups") {
    val dir = java.nio.file.Files.createTempDirectory("graft-layout").toString
    val orders = Tables.orders(spark, sf).select("o_orderkey", "o_totalprice", "o_orderpriority")
    val total = orders.count()
    Layout.writeClustered(orders, "o_orderkey", dir, nFiles = 4)
    // zone maps: every file owns a disjoint o_orderkey range
    val ranges = Layout.keyRanges(spark, dir, "o_orderkey").sortBy(_._2)
    assert(ranges.length == 4, ranges.mkString(","))
    ranges.sliding(2).foreach {
      case Seq((fa, _, maxA), (fb, minB, _)) =>
        assert(maxA < minB, s"$fa [..$maxA] overlaps $fb [$minB..]")
      case _ => ()
    }
    // a point query reads only the row group(s) whose zone map covers the
    // key: the scan's output rows stay far below the table size. Metrics
    // must be read from the SAME QueryExecution that ran — Dataset.count()
    // builds a separate derived plan whose metrics never populate here.
    val probe = ranges.head._2 // an existing key
    val scan = spark.read.parquet(dir).filter(col("o_orderkey") === probe)
    assert(scan.collect().length >= 1)
    val leaf = scan.queryExecution.executedPlan.collectLeaves().head
    val rowsRead = leaf.metrics("numOutputRows").value
    assert(rowsRead >= 1, "scan metric did not populate — wrong QueryExecution?")
    assert(rowsRead < total / 2,
      s"zone-map skipping ineffective: scan emitted $rowsRead of $total rows")
  }

  test("z-ordered layout: every file bounds a compact box on BOTH dimensions") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    // 64x64 grid: the worst case for 1-D clustering (second key spans the
    // full domain in every file), the showcase for z-order (4x4 tiles)
    val grid = (for (u <- 0L until 64L; v <- 0L until 64L) yield (u, v)).toDF("u", "v")
    Layout.writeZOrdered(grid, "u", "v", dir, nFiles = 16)
    val uRanges = Layout.keyRanges(spark, dir, "u")
    val vRanges = Layout.keyRanges(spark, dir, "v")
    assert(uRanges.length == 16 && vRanges.length == 16)
    val uSpan = uRanges.map { case (_, mn, mx) => mx - mn }.sum / 16.0
    val vSpan = vRanges.map { case (_, mn, mx) => mx - mn }.sum / 16.0
    // ideal tiles span 15 per dim; allow boundary slack but both dims must
    // prune (far below the 63 a 1-D layout leaves on its second key)
    assert(uSpan <= 32.0, s"u span $uSpan — z-order not clustering dim 1")
    assert(vSpan <= 32.0, s"v span $vSpan — z-order not clustering dim 2")
    // contrast: 1-D clustering leaves the second dimension unpruned
    val dir1 = java.nio.file.Files.createTempDirectory("graft-zorder1d").toString
    Layout.writeClustered(grid, "u", dir1, nFiles = 16)
    val v1Span = Layout.keyRanges(spark, dir1, "v").map { case (_, mn, mx) => mx - mn }.sum / 16.0
    assert(v1Span > 32.0, s"1-D layout unexpectedly clustered v (span $v1Span)")
    // sign-boundary regression: a second key straddling 2^31 puts the raw
    // interleave's top bit in the Long sign; the unsigned-order fix keeps
    // the curve contiguous so files still bound v tightly
    val hi = 1L << 31
    val grid2 = (for (u <- 0L until 64L; v <- (hi - 32) until (hi + 32)) yield (u, v)).toDF("u", "v")
    val dir2 = java.nio.file.Files.createTempDirectory("graft-zorder-sign").toString
    Layout.writeZOrdered(grid2, "u", "v", dir2, nFiles = 16)
    val v2Span = Layout.keyRanges(spark, dir2, "v").map { case (_, mn, mx) => mx - mn }.sum / 16.0
    assert(v2Span <= 32.0, s"v span $v2Span across the 2^31 boundary — signed z split the curve")
  }

  test("3-D z-order: every file bounds a compact box on ALL THREE dimensions") {
    import spark.implicits._
    // 16^3 grid; 16 files — ideal tiles are 16x16x4-ish boxes, and a 1-D
    // or 2-D layout would leave the remaining dimension(s) at full span
    val grid = (for (u <- 0L until 16L; v <- 0L until 16L; w <- 0L until 16L)
      yield (u, v, w)).toDF("u", "v", "w")
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder3").toString
    Layout.writeZOrderedK(grid, Seq("u", "v", "w"), dir, nFiles = 16)
    for (k <- Seq("u", "v", "w")) {
      val span = Layout.keyRanges(spark, dir, k).map { case (_, mn, mx) => mx - mn }.sum / 16.0
      assert(span <= 8.0, s"$k span $span of domain 15 — 3-D z-order not clustering it")
    }
  }

  test("zValueK aligned-box prefix property: every point in a 2^m-aligned box z-sorts between its corners") {
    import spark.implicits._
    // The law zone-map pruning rests on: for a box aligned at multiples of
    // 2^m with side 2^m, z(minCorner) <= z(p) <= z(maxCorner) for every p
    // inside — i.e. aligned boxes are CONTIGUOUS z ranges. Checked for both
    // arities over a deterministic set of boxes and all points inside.
    val m = 3
    val side = 1L << m
    for (origin <- Seq((0L, 0L, 0L), (8L, 16L, 24L), (128L, 8L, 0L), (1L << 20, 1L << 12, 8L))) {
      val (ox, oy, oz) = origin
      val pts = (for (i <- 0L until side; j <- 0L until side; k <- 0L until side)
        yield (ox + i, oy + j, oz + k)).toDF("u", "v", "w")
      for (arity <- Seq(2, 3)) {
        val keys = Seq("u", "v", "w").take(arity).map(col)
        val z = pts.select(Layout.zValueK(keys).as("z")).agg(min("z"), max("z"))
          .as[(Long, Long)].head()
        val zMin = pts.filter(col("u") === ox && col("v") === oy && col("w") === oz)
          .select(Layout.zValueK(keys)).as[Long].head()
        val zMax = pts.filter(col("u") === (ox + side - 1) && col("v") === (oy + side - 1) &&
            col("w") === (oz + side - 1))
          .select(Layout.zValueK(keys)).as[Long].head()
        assert(z._1 == zMin && z._2 == zMax,
          s"arity $arity box at $origin: z range $z, corners ($zMin, $zMax)")
      }
    }
  }

  test("zValueK aligned-box prefix property holds at arity 4 (nested-interleave composition)") {
    import spark.implicits._
    // arity 4 is the least obvious zValueK construction — built from nested
    // 2-D zValue calls with XOR cancellation — so the box-contiguity law
    // gets its own regression gate at that arity (round-7 advice)
    val m = 2
    val side = 1L << m
    // origins stay inside the arity-4 key domain [0, 2^16)
    for (origin <- Seq((0L, 0L, 0L, 0L), (4L, 8L, 12L, 16L), (64L, 4L, 0L, 8L),
        (1L << 12, 1L << 10, 4L, 1L << 8))) {
      val (ou, ov, ow, ox) = origin
      val pts = (for (i <- 0L until side; j <- 0L until side;
          k <- 0L until side; l <- 0L until side)
        yield (ou + i, ov + j, ow + k, ox + l)).toDF("u", "v", "w", "x")
      val keys = Seq("u", "v", "w", "x").map(col)
      val z = pts.select(Layout.zValueK(keys).as("z")).agg(min("z"), max("z"))
        .as[(Long, Long)].head()
      val zMin = pts.filter(col("u") === ou && col("v") === ov &&
          col("w") === ow && col("x") === ox)
        .select(Layout.zValueK(keys)).as[Long].head()
      val zMax = pts.filter(col("u") === (ou + side - 1) && col("v") === (ov + side - 1) &&
          col("w") === (ow + side - 1) && col("x") === (ox + side - 1))
        .select(Layout.zValueK(keys)).as[Long].head()
      assert(z._1 == zMin && z._2 == zMax,
        s"arity 4 box at $origin: z range $z, corners ($zMin, $zMax)")
    }
  }

  test("compactTo sizes file count from source bytes and preserves clustering") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("graft-compact-src").toString
    val out = java.nio.file.Files.createTempDirectory("graft-compact-out").toString
    // small-files problem: 64 files of ~180 rows each
    spark.range(12000).select(col("id").as("k"), sha2(col("id").cast("string"), 256).as("pad"))
      .repartition(64).write.mode("overwrite").parquet(src)
    val conf = spark.sessionState.newHadoopConf()
    def files(p: String) = {
      val d = new org.apache.hadoop.fs.Path(p)
      d.getFileSystem(conf).listStatus(d).toSeq
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    }
    val totalBytes = files(src).map(_.getLen).sum
    val target = totalBytes / 4
    val n = Layout.compactTo(spark, src, "k", out, target)
    assert(n == math.ceil(totalBytes.toDouble / target).toInt)
    assert(files(out).size == n, s"wrote ${files(out).size} files, sized $n")
    // rows preserved, layout clustered: file key ranges are disjoint
    assert(spark.read.parquet(out).count() == 12000L)
    val ranges = Layout.keyRanges(spark, out, "k").map { case (_, mn, mx) => (mn, mx) }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, aMax), (bMin, _)) =>
        assert(aMax < bMin, s"compacted files overlap on k: $ranges")
      case _ => ()
    }
  }

  test("training set build: equals the manual composition of its stage outputs") {
    import spark.implicits._
    val built = TextOps.trainingSetBuild(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // recompose independently from the stage operators' own outputs
    val curated = TextOps.curateCorpus(spark, sf).as[Long].collect().toSet
    val contaminated = Dedup.evalContamination(spark, sf)
      .filter(col("containment_e6") >= 100000L).select("doc_id").as[Long].collect().toSet
    val train = TextOps.trainTestSplit(spark, sf).filter(col("split") === "train")
      .select("doc_id").as[Long].collect().toSet
    val capped = TextOps.sourceCaps(spark, sf).select("doc_id").as[Long].collect().toSet
    val kept = curated.filter(id => id % 97 != 0 && !contaminated(id) && train(id) && capped(id))
    // remediation stage: affected survivors chunk their CLEANED length;
    // chunk boundaries recomputed here from chunkDocs' documented integer
    // arithmetic (size 500, overlap 50), not by calling the operator again
    val cleanedLen = Dedup.substringCleanText(spark, sf)
      .select(col("doc_id"), length(col("clean_text")).cast("long"))
      .as[(Long, Long)].collect().toMap
    val nChars = Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars").cast("long"))
      .as[(Long, Long)].collect().toMap
    val expected = kept.toSeq.sorted.flatMap { id =>
      val n = cleanedLen.getOrElse(id, nChars(id))
      val chunks = if (n <= 500) 1L else (n - 51) / 450 + 1
      (0L until chunks).map(i => (id, i, i * 450, math.min(i * 450 + 500, n)))
    }
    assert(built.nonEmpty && built == expected)
    // the composition genuinely filters: strictly fewer docs than curation alone
    assert(built.map(_._1).distinct.size < curated.size)
    // and the remediation path is really wired: any affected survivor's
    // chunks must cover its CLEANED length, not the stored n_chars
    val affectedKept = kept.filter(cleanedLen.contains)
    affectedKept.foreach { id =>
      val maxEnd = built.filter(_._1 == id).map(_._4).max
      assert(maxEnd == cleanedLen(id),
        s"doc $id chunks must end at the cleaned length, got $maxEnd vs ${cleanedLen(id)}")
    }
  }

  test("revenue percentiles: discrete positions recompute from a driver-side sort") {
    import spark.implicits._
    val df = Analytics.revenuePercentiles(spark, sf)
    // distributed-selection shape: the only rank window partitions by
    // (segment, bucket) — a window keyed on the segment alone would mean
    // one task per segment owns a whole-segment sort again
    val win = df.queryExecution.executedPlan.toString.linesIterator
      .filter(_.contains("row_number()")).mkString("\n")
    assert(win.contains("bucket"), s"rank window lost its bucket key:\n$win")
    val out = df.collect()
    val vals = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), Exact.c2(col("o_totalprice")).as("c2"))
      .as[(String, Long)].collect().groupBy(_._1)
    assert(out.map(_.getString(0)).toSet == vals.keySet)
    out.foreach { r =>
      val sorted = vals(r.getString(0)).map(_._2).sorted
      val n = sorted.length
      def at(num: Long, den: Long) = sorted(((num * n + den - 1) / den - 1).toInt)
      assert(r.getLong(1) == n.toLong)
      assert(r.getLong(2) == at(1, 2) && r.getLong(3) == at(9, 10) && r.getLong(4) == at(99, 100),
        s"${r.getString(0)}: got (${r.getLong(2)}, ${r.getLong(3)}, ${r.getLong(4)})")
      assert(r.getLong(2) <= r.getLong(3) && r.getLong(3) <= r.getLong(4))
    }
  }

  test("approx percentiles: rank-error bound holds against the exact sorted values") {
    import spark.implicits._
    val out = Analytics.revenuePercentilesApprox(spark, sf, accuracy = 10000).collect()
    val vals = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), Exact.c2(col("o_totalprice")).as("c2"))
      .as[(String, Long)].collect().groupBy(_._1)
    assert(out.nonEmpty)
    out.foreach { r =>
      val sorted = vals(r.getString(0)).map(_._2).sorted
      val n = sorted.length
      // percentile_approx guarantees rank error <= n/accuracy; convert to a
      // value assertion: the approx value must lie within the exact values
      // at rank ceil(p*n) +- ceil(n/accuracy) (plus one for the discrete
      // position convention)
      val slack = n / 10000 + 1
      for ((p, i) <- Seq(0.5 -> 2, 0.9 -> 3, 0.99 -> 4)) {
        val pos = math.ceil(p * n).toInt
        val lo = sorted(math.max(0, pos - 1 - slack))
        val hi = sorted(math.min(n - 1, pos - 1 + slack))
        val ap = r.getLong(i)
        assert(ap >= lo && ap <= hi,
          s"${r.getString(0)} p$p: approx $ap outside [$lo, $hi]")
      }
    }
  }

  test("length percentile filter: per-language decile cuts recompute from a driver-side sort") {
    import spark.implicits._
    val rows = TextOps.lengthPercentileFilter(spark, sf).collect()
    assert(rows.nonEmpty)
    val re = java.util.regex.Pattern.compile("[A-Za-z0-9]+")
    def nTokens(t: String): Long = {
      if (t == null) return 0L
      val m = re.matcher(t); var n = 0L; while (m.find()) n += 1; n
    }
    val docs = Tables.documents(spark, sf).select("doc_id", "lang", "text")
      .as[(Long, String, String)].collect()
      .map { case (id, l, t) => (id, l, nTokens(t)) }
    val byLang = docs.groupBy(_._2)
    val th = byLang.map { case (l, ds) =>
      val sorted = ds.map(_._3).sorted
      val n = sorted.length.toLong
      def at(num: Long, den: Long) = sorted((((num * n + den - 1) / den) - 1).toInt)
      l -> ((at(1, 10), at(9, 10)))
    }
    assert(rows.length == docs.length)
    rows.foreach { r =>
      val (lo, hi) = th(r.getString(1))
      assert(r.getLong(3) == lo && r.getLong(4) == hi,
        s"${r.getString(1)}: thresholds (${r.getLong(3)}, ${r.getLong(4)}) vs ($lo, $hi)")
      val keep = if (r.getLong(2) >= lo && r.getLong(2) <= hi) 1L else 0L
      assert(r.getLong(5) == keep, s"doc ${r.getLong(0)}: keep ${r.getLong(5)} vs $keep")
    }
    // the trim genuinely removes something at both ends per language
    val kept = rows.count(_.getLong(5) == 1L)
    assert(kept > 0 && kept < rows.length, s"vacuous trim: $kept of ${rows.length}")
  }

  test("pagerank: integer iteration recomputes exactly driver-side; mass bounded") {
    import spark.implicits._
    val out = Graph.pagerankBipartite(spark, sf, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_suppkey")).distinct()
      .as[(Long, Long)].collect()
    val edges = (pairs.map { case (p, s) => (p * 2, s * 2 + 1) } ++
      pairs.map { case (p, s) => (s * 2 + 1, p * 2) }).toVector
    val nodes = edges.map(_._1).distinct.sorted
    val deg = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val outAdj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val n = nodes.length.toLong
    var rank = nodes.map(_ -> 1000000000L / n).toMap
    for (_ <- 1 to 3) {
      val acc = scala.collection.mutable.HashMap.empty[Long, Long].withDefaultValue(0L)
      for (src <- nodes; dst <- outAdj(src)) acc(dst) += rank(src) / deg(src)
      rank = nodes.map(nd => nd -> (150000000L / n + 85L * acc(nd) / 100L)).toMap
    }
    assert(out == rank, s"spark vs driver ranks differ on ${out.size}/${rank.size} nodes")
    // floor division only ever LEAKS mass: total stays at or under 1e9
    assert(out.values.sum <= 1000000000L && out.values.forall(_ > 0L))
  }

  test("pagerank: broadcast vs shuffle rank join — both plan shapes, identical values") {
    // small graph (default threshold): the per-round rank join broadcasts
    val small = Graph.pagerankBipartite(spark, sf, iters = 2).collect().toSeq
    // threshold 0 forces the web-scale shape: ranks shuffle-join on the key
    val sharded = Graph.pagerankBipartite(spark, sf, iters = 2,
      broadcastMaxNodes = 0L).collect().toSeq
    assert(small.nonEmpty && small == sharded,
      "rank values must be independent of the join strategy")
    // pin both plan shapes on one un-executed iteration frame
    val li = Tables.lineitem(spark, sf)
      .select((col("l_partkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
    val edges = li.unionAll(li.select(col("dst").as("src"), col("src").as("dst")))
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
      .select(col("src").as("node"), col("deg"))
    val nodes = deg.select("node")
    val ranks0 = nodes.withColumn("rank_e9", lit(1000L))
    // disable the size-based auto-broadcast while checking shapes: a
    // web-scale rank table would be far over the threshold anyway, and this
    // pins that the EXPLICIT hint (not the optimizer's size guess) is what
    // separates the two shapes
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val bPlan = Graph.iterate(edges, deg, nodes, ranks0, 1L, useBroadcast = true)
        .queryExecution.executedPlan.toString
      val sPlan = Graph.iterate(edges, deg, nodes, ranks0, 1L, useBroadcast = false)
        .queryExecution.executedPlan.toString
      assert(bPlan.contains("BroadcastHashJoin"), s"broadcast shape missing:\n$bPlan")
      assert(!sPlan.contains("BroadcastHashJoin"), s"shuffle shape still broadcasts:\n$sPlan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("pagerank: convergence-delta stop halts early and matches the fixed-round result") {
    // a huge tolerance converges at round 2 (first round where the delta is
    // measured): result equals the fixed 2-round run, NOT the 9-round one
    val early = Graph.pagerankBipartite(spark, sf, iters = 9, tolE9 = 1000000000L)
      .collect().toSeq
    val two = Graph.pagerankBipartite(spark, sf, iters = 2).collect().toSeq
    assert(early == two, "tolerant run should stop after the round-2 delta check")
    // tol = 0 (the default) disables the stop: 3 fixed rounds differ from 2
    val three = Graph.pagerankBipartite(spark, sf, iters = 3).collect().toSeq
    assert(three != two)
  }

  test("mixture temperature: alpha=1/2 rates recompute exactly; smallest stratum kept whole") {
    import spark.implicits._
    val out = TextOps.mixtureTemperature(spark, sf).collect()
    assert(out.nonEmpty)
    val n = Tables.documents(spark, sf).groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    val nMin = n.values.min
    val want = n.map { case (l, c) =>
      l -> math.floor(math.sqrt((nMin * c).toDouble)).toLong * 10000L / c
    }
    val gotRates = out.map(r => r.getString(1) -> r.getLong(2)).toMap
    gotRates.foreach { case (l, rate) => assert(rate == want(l), s"$l: $rate != ${want(l)}") }
    // the smallest language is kept whole (isqrt(n_min^2) = n_min -> 10000 bp)
    assert(want(n.minBy(_._2)._1) == 10000L)
    // kept rows respect the Knuth-bucket membership bit-for-bit
    out.foreach { r =>
      val b = ((r.getLong(0) % 2147483648L) * 2654435761L % 4294967296L) % 10000L
      assert(b < r.getLong(2))
    }
  }

  test("source caps: at most cap docs per source, ranks dense, window prunes map-side") {
    import spark.implicits._
    val df = TextOps.sourceCaps(spark, sf, cap = 7)
    val rows = df.collect()
    val bySource = rows.groupBy(_.getString(1))
    assert(bySource.nonEmpty && bySource.values.forall(_.length <= 7))
    bySource.values.foreach { g =>
      assert(g.map(_.getLong(2)).sorted.toSeq == (1L to g.length.toLong))
    }
    // deterministic: same hash, same ranks on a second run
    assert(df.collect().map(r => (r.getLong(0), r.getLong(2))).toSeq ==
      rows.map(r => (r.getLong(0), r.getLong(2))).toSeq)
    // the rank <= cap gate must reach WindowGroupLimit so each task forwards
    // at most cap rows per source BEFORE the exchange — the property that
    // makes the cap safe under web-crawl domain skew
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(600))
  }

  test("source stats: per-source counts/volumes recompute from the raw table") {
    import spark.implicits._
    val out = TextOps.sourceStats(spark, sf, cap = 20).collect()
    val docs = Tables.documents(spark, sf).select("source", "n_chars")
      .as[(String, Long)].collect().groupBy(_._1)
    assert(out.map(_.getString(0)).toSet == docs.keySet)
    out.foreach { r =>
      val g = docs(r.getString(0))
      assert(r.getLong(1) == g.length.toLong)
      assert(r.getLong(2) == math.min(g.length.toLong, 20L))
      assert(r.getLong(3) == g.map(_._2).sum)
      assert(r.getLong(4) >= 0L && r.getLong(4) <= g.length.toLong)
    }
  }

  test("doc chunking: windows cover every char, overlap is exact, text reassembles") {
    import spark.implicits._
    val out = TextOps.docChunks(spark, sf, size = 500, overlap = 50)
      .collect().groupBy(_.getLong(0))
    val texts = Tables.documents(spark, sf).select("doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(out.keySet == texts.keySet, "every doc chunked")
    out.foreach { case (id, chunks) =>
      val sorted = chunks.sortBy(_.getLong(1))
      val text = texts(id)
      // offsets: stride 450, last window reaches the end, none starts past it
      sorted.zipWithIndex.foreach { case (c, i) =>
        assert(c.getLong(1) == i.toLong && c.getLong(2) == i * 450L)
        assert(c.getString(4) == text.substring(c.getLong(2).toInt, c.getLong(3).toInt))
      }
      assert(sorted.last.getLong(3) == text.length.toLong, s"doc $id last chunk short")
      // reassembly: chunk i minus its 50-char overlap with chunk i-1
      val rebuilt = sorted.map { c =>
        val s = c.getString(4)
        if (c.getLong(1) == 0L) s else s.substring(math.min(50, s.length))
      }.mkString
      assert(rebuilt == text, s"doc $id reassembly mismatch")
    }
  }

  test("mixture rebalance: over-represented langs downsample toward uniform, small ones keep all") {
    import spark.implicits._
    val out = TextOps.mixtureRebalance(spark, sf).collect()
    assert(out.nonEmpty)
    val before = Tables.documents(spark, sf).groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    val total = before.values.sum
    val targetShare = total.toDouble / before.size
    val after = out.groupBy(_.getString(1)).view.mapValues(_.length.toLong).toMap
    before.foreach { case (lang, n) =>
      val rate = math.min(10000L, total * 10000L / (before.size * n))
      // exported rate matches the recompute for every kept row of the lang
      out.filter(_.getString(1) == lang).foreach(r => assert(r.getLong(2) == rate))
      if (rate == 10000L) {
        assert(after.getOrElse(lang, 0L) == n, s"$lang under target must keep ALL rows")
      } else {
        // kept count lands near the uniform target (hash granularity slack)
        val kept = after.getOrElse(lang, 0L).toDouble
        assert(kept > targetShare * 0.5 && kept < targetShare * 1.6,
          s"$lang kept $kept, target ~$targetShare")
      }
    }
    // deterministic
    assert(out.toSeq == TextOps.mixtureRebalance(spark, sf).collect().toSeq)
  }

  test("stratified sample: deterministic, rates land near their strata targets") {
    val s1 = TextOps.stratifiedSample(spark, sf).collect()
    val s2 = TextOps.stratifiedSample(spark, sf).collect()
    assert(s1.toSeq == s2.toSeq && s1.nonEmpty) // no RNG: byte-stable
    val total = Tables.documents(spark, sf).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = s1.groupBy(_.getString(1)).view.mapValues(_.length.toLong).toMap
    val enFrac = kept.getOrElse("en", 0L).toDouble / total("en")
    assert(enFrac > 0.3 && enFrac < 0.7, s"en kept fraction $enFrac, want ~0.5")
    val deFrac = kept.getOrElse("de", 0L).toDouble / total("de")
    assert(deFrac > 0.08 && deFrac < 0.45, s"de kept fraction $deFrac, want ~0.25")
  }

  test("value histogram floors NEGATIVE values into the lower bucket (oracle parity)") {
    import spark.implicits._
    // -15.00 -> c2 -1500 -> floor bucket -2000 (DuckDB's // would say -1000)
    val df = Seq(-15.00, -0.01, 0.0, 9.99, 10.0, 25.50).toDF("value")
    val rows = Sessions.valueHistogramOf(df, bucketCents = 1000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(rows == Map(-2000L -> 1L, -1000L -> 1L, 0L -> 2L, 1000L -> 1L, 2000L -> 1L), rows.toString)
  }

  test("cube: subset rows are consistent with the grand total") {
    // plain Seq, no Map/Set anywhere: two margins can legitimately carry
    // identical (n, total) pairs and must both count
    val rows = Analytics.ordersCube(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    val Seq((_, _, grandN, grandT)) = rows.filter(r => r._1 == "ALL" && r._2 == "ALL")
    val byStatus = rows.filter(r => r._1 != "ALL" && r._2 == "ALL")
    val byPriority = rows.filter(r => r._1 == "ALL" && r._2 != "ALL")
    val cells = rows.filter(r => r._1 != "ALL" && r._2 != "ALL")
    for (group <- Seq(byStatus, byPriority, cells)) {
      assert(group.map(_._3).sum == grandN && group.map(_._4).sum == grandT,
        s"margin sums ${group.map(_._3).sum}/${group.map(_._4).sum} != $grandN/$grandT")
    }
  }

  test("top users: exactly k rows, sorted, deterministic tie-break") {
    val a = Sessions.topUsers(spark, sf, k = 10).collect()
    val b = Sessions.topUsers(spark, sf, k = 10).collect()
    assert(a.toSeq == b.toSeq && a.length == 10)
    val counts = a.map(_.getLong(1))
    assert(counts.sorted.reverse.toSeq == counts.toSeq, "not sorted by volume")
    // within equal counts, user_id ascending
    a.sliding(2).foreach {
      case Array(x, y) =>
        assert(x.getLong(1) > y.getLong(1) ||
          (x.getLong(1) == y.getLong(1) && x.getLong(0) < y.getLong(0)))
      case _ => ()
    }
  }

  test("salted join equals the plain join exactly") {
    val salted = Skew.saltedUserSegmentAgg(spark, sf).collect().toSeq
    val plain = Tables.events(spark, sf)
      .join(Tables.customer(spark, sf), col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_events"),
        Exact.sumLong(Exact.c2(col("value"))).as("total_value_c2"))
      .orderBy("c_mktsegment").collect().toSeq
    assert(salted == plain && salted.nonEmpty)
  }

  test("q4 correlated EXISTS decorrelates to a left-semi join") {
    val df = Analytics.orderPriorityLateShip(spark, sf)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("LeftSemi"), plan.take(500))
    assert(df.collect().nonEmpty)
  }

  test("q2 correlated MIN scalar subquery decorrelates into an aggregate join") {
    val df = Analytics.cheapestOrderPerCustomer(spark, sf)
    val plan = df.queryExecution.optimizedPlan.toString
    // decorrelated = the scalar-subquery expression is GONE from the
    // optimized plan, replaced by a per-custkey MIN aggregate joined back;
    // the naive shape would re-scan orders once per outer row
    assert(!plan.contains("scalar-subquery"), plan.take(800))
    assert(plan.contains("Aggregate") && plan.contains("Join"), plan.take(800))
    val rows = df.collect()
    assert(rows.nonEmpty)
    // every returned order really is its customer's min (spot the invariant)
    val minByCust = rows.groupBy(_.getLong(1)).view.mapValues(_.map(_.getLong(2)).min)
    assert(rows.forall(r => r.getLong(2) == minByCust(r.getLong(1))))
  }

  test("q13 left-outer count distribution preserves zero-order customers") {
    val df = Analytics.orderCountDistribution(spark, sf)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("LeftOuter"), plan.take(500))
    // the outer join must preserve EVERY customer: the distribution sums to
    // the full customer count (an inner join would silently drop the
    // urgent-only/zero-order customers)
    val total = df.agg(sum(col("custdist"))).head().getLong(0)
    assert(total == Tables.customer(spark, sf).count())
  }

  test("q21 EXISTS + NOT EXISTS decorrelate to left-semi + left-anti joins") {
    val df = Analytics.waitingSupplier(spark, sf)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("LeftSemi"), plan.take(800))
    assert(plan.contains("LeftAnti"), plan.take(800))
    assert(df.collect().nonEmpty)
  }

  test("q18 IN+HAVING becomes a left-semi against the once-computed aggregate") {
    val df = Analytics.largeQuantityOrders(spark, sf)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("LeftSemi"), plan.take(800))
    val rows = df.collect()
    assert(rows.nonEmpty)
    // every returned order genuinely clears the quantity threshold,
    // recomputed independently in exact cents
    val qty = Tables.lineitem(spark, sf)
      .groupBy(col("l_orderkey"))
      .agg(Exact.sumLong(Exact.c2(col("l_quantity"))).as("q"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(qty(r.getLong(0)) > 15000L,
      s"order ${r.getLong(0)} qty ${qty(r.getLong(0))} below threshold"))
  }

  test("q11 HAVING threshold holds against an independently computed global total") {
    val df = Analytics.segmentShareOverThreshold(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 5)
    val global = Tables.orders(spark, sf)
      .agg(Exact.sumLong(Exact.c2(col("o_totalprice")))).head().getLong(0)
    rows.foreach { r =>
      assert(r.getLong(1) * 5 > global,
        s"${r.getString(0)}: ${r.getLong(1)} * 5 <= $global")
    }
  }

  test("grouping sets: one Expand pass; marginals sum to the grand total") {
    val df = Analytics.ordersGroupingSets(spark, sf)
    assert(df.queryExecution.optimizedPlan.toString.contains("Expand"))
    val rows = df.collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val grand = rows.filter(r => r._1 == "ALL" && r._2 == "ALL")
    assert(grand.length == 1)
    val statusMarg = rows.filter(r => r._1 != "ALL")
    val prioMarg = rows.filter(r => r._2 != "ALL")
    assert(statusMarg.map(_._3).sum == grand.head._3 &&
      prioMarg.map(_._3).sum == grand.head._3, "marginal counts don't sum to grand total")
    assert(statusMarg.map(_._4).sum == grand.head._4 &&
      prioMarg.map(_._4).sum == grand.head._4, "marginal cents don't sum to grand total")
  }

  test("full outer activity covers users from either side, zeros for the absent side") {
    import spark.implicits._
    val rows = Analytics.userActivityFullOuter(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val orderUsers = Tables.orders(spark, sf)
      .select("o_custkey").as[Long].collect().toSet
    val eventUsers = Tables.events(spark, sf)
      .select("user_id").as[Long].collect().toSet
    assert(rows.map(_._1).toSet == (orderUsers ++ eventUsers),
      "full outer must cover exactly the union of both key sets")
    rows.foreach { case (u, no, ne) =>
      assert((no > 0) == orderUsers.contains(u), s"user $u n_orders=$no")
      assert((ne > 0) == eventUsers.contains(u), s"user $u n_events=$ne")
    }
  }

  test("joinExplosionCheck: totals, top-k order, and shares recompute exactly") {
    val out = Analytics.joinExplosionCheck(spark, sf).collect()
    assert(out.length == 10)
    val counts = Tables.events(spark, sf).groupBy(col("user_id"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val total = counts.map { case (_, n) => BigInt(n) * BigInt(n) }.sum
    assert(out.forall(_.getLong(5) == total.toLong), "total_pairs drifted")
    val expectedTop = counts.map { case (u, n) => (u, n, n * n) }
      .sortBy { case (u, _, p) => (-p, u) }.take(10)
    out.zip(expectedTop).zipWithIndex.foreach { case ((r, (u, n, p)), i) =>
      assert(r.getLong(0) == i + 1L && r.getLong(1) == u
        && r.getLong(2) == n && r.getLong(3) == p,
        s"rank ${i + 1} drifted: got ${r.toSeq}, want ($u,$n,$p)")
      assert(r.getLong(4) == (BigInt(p) * 1000000 / total).toLong, "share_ppm drifted")
    }
  }

  test("lateral top-2 rewrites to a windowed per-key limit and returns the true top-2") {
    import spark.implicits._
    val df = Analytics.lateralTopOrders(spark, sf)
    // Catalyst must rewrite the correlated LATERAL + LIMIT into a window
    // row_number per key — not a per-customer re-scan of orders
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("row_number"), plan.take(800))
    assert(!plan.contains("LateralJoin"), "lateral left unrewritten: " + plan.take(400))
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val expected = Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .as[(Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(
        _.sortBy(o => (-o._3, o._2)).take(2).map(_._2).toSet).toMap
    assert(got.nonEmpty && got == expected.filter(_._2.nonEmpty))
  }


  test("ranking_windows: all five ranking functions share one Window node; semantics verified") {
    val df = Analytics.rankingWindows(spark, sf)
    val nWindows = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }.size
    assert(nWindows == 1, s"expected 1 Window node, got $nWindows")
    val rows = df.collect()
    assert(rows.nonEmpty)
    // independent recompute per segment
    val src = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val bySeg = src.groupBy(_._2)
    rows.foreach { r =>
      val (ck, seg) = (r.getLong(0), r.getString(1))
      val part = bySeg(seg).sortBy(t => (t._3, t._1))
      val n = part.length
      val i = part.indexWhere(_._1 == ck) // 0-based row index (unique order key)
      // ntile: first (n % 4) buckets get an extra row
      val base = n / 4; val extra = n % 4
      val quartile =
        if (i < (base + 1) * extra) i / (base + 1) + 1
        else (i - (base + 1) * extra) / base + extra + 1
      assert(r.getLong(2) == quartile, s"ntile mismatch at $ck")
      assert(r.getLong(3) == i + 1) // unique ordering: rank == row_number
      assert(r.getLong(4) == i + 1)
      val pct = if (n == 1) 0.0 else i.toDouble / (n - 1)
      assert(r.getLong(5) == math.floor(pct * 1e6).toLong)
      assert(r.getLong(6) == math.floor((i + 1).toDouble / n * 1e6).toLong)
    }
  }

  test("running_revenue: both window functions share one Window node; frame semantics hold") {
    val df = Analytics.runningRevenue(spark, sf)
    // one logical Window node carries BOTH the frame sum and the lag — two
    // nodes would mean two sorts (and with different keys, two exchanges)
    val nWindows = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }.size
    assert(nWindows == 1, s"expected 1 Window node, got $nWindows")
    val rows = df.collect()
    assert(rows.nonEmpty)
    // independent recompute: per customer ordered by (orderdate, orderkey),
    // running_c2 is the prefix sum and prev_c2 the previous order's cents
    val src = Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        Exact.c2(col("o_totalprice")).as("c2")).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getAs[java.time.LocalDateTime](2).toInstant(java.time.ZoneOffset.UTC).toEpochMilli,
        r.getLong(3)))
    val expected: Map[Long, (Long, Option[Long])] =
      src.groupBy(_._1).iterator.flatMap { case (_, os) =>
        val ordered = os.sortBy(o => (o._3, o._2))
        var run = 0L
        var prev: Option[Long] = None
        ordered.iterator.map { o =>
          run += o._4
          val e = o._2 -> ((run, prev))
          prev = Some(o._4)
          e
        }
      }.toMap
    rows.foreach { r =>
      val (run, prev) = expected(r.getLong(1))
      assert(r.getLong(2) == run, s"order ${r.getLong(1)}: running ${r.getLong(2)} != $run")
      assert((if (r.isNullAt(3)) None else Some(r.getLong(3))) == prev,
        s"order ${r.getLong(1)}: prev mismatch")
    }
  }

  test("writeBucketed clears a stale warehouse dir through Hadoop FS (URI-form path)") {
    import spark.implicits._
    // orphan location with no catalog entry — the pre-CTAS cleanup must
    // remove it via the Hadoop FileSystem API (the warehouse conf is a
    // `file:` URI here; on a cluster it is hdfs:/s3a: where java.io.File
    // would silently no-op and CTAS would fail)
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    assert(wh.contains(":"), s"expected URI-form warehouse, got $wh")
    val stale = new org.apache.hadoop.fs.Path(wh, "graft_stale_b")
    val fs = stale.getFileSystem(spark.sessionState.newHadoopConf())
    spark.sql("DROP TABLE IF EXISTS graft_stale_b")
    fs.mkdirs(stale)
    val junk = fs.create(new org.apache.hadoop.fs.Path(stale, "junk"))
    junk.writeBytes("stale"); junk.close()
    Bucketing.writeBucketed(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), "graft_stale_b", "k", 2)
    assert(spark.table("graft_stale_b").count() == 2)
    spark.sql("DROP TABLE IF EXISTS graft_stale_b")
  }

  test("bucketed join on the order key runs without a shuffle exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    try {
      val df = Bucketing.bucketedOrderJoin(spark, sf)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n${plan.take(600)}")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("claim-check boundary: 63KB inline, 65KB blob (SURVEY Q5 threshold)") {
    import graft.cdc._
    val cfg = CdcConfig()
    def rec(size: Long) = CdcRecord(Some("e"), Some("INSERT"), Some(CdcStreamPart(
      Some(size), Some("""{"pk":{"S":"U"}}"""), Some("""{"pk":{"S":"U"}}"""), None)))
    assert(RecordProcessor.process(rec(63 * 1024), cfg).get.event.imagesUrl.isEmpty)
    assert(RecordProcessor.process(rec(65 * 1024), cfg).get.event.imagesUrl.nonEmpty)
    assert(RecordProcessor.process(rec(64 * 1024), cfg).get.event.imagesUrl.nonEmpty) // threshold is strict <
  }

  test("deletion impact: revoked-source scoping, keeper re-election laws, chunk exposure") {
    import spark.implicits._
    val out = TextOps.deletionImpact(spark, sf).collect()
    assert(out.nonEmpty)
    // the takedown set is exactly the revoked (min) source's docs
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"source").as[(Long, String)].collect()
    val revoked = docs.map(_._2).min
    val expectRemoved = docs.filter(_._2 == revoked).map(_._1).toSet
    val removed = out.map(_.getLong(0)).toSet
    assert(removed == expectRemoved, s"takedown set mismatch: $removed")
    out.foreach { r =>
      val docId = r.getLong(0)
      val cluster = r.getLong(1)
      val wasKeeper = r.getLong(2)
      val nLive = r.getLong(4)
      // new_keeper exists exactly when someone in the cluster survives
      assert((nLive == 0L) == r.isNullAt(3),
        s"new_keeper/n_live_members disagree at $r")
      if (!r.isNullAt(3)) {
        val nk = r.getLong(3)
        assert(!removed.contains(nk), s"re-elected keeper $nk is itself removed")
        // the old label is the component min, so re-election can only move up
        assert(nk >= cluster, s"new keeper $nk precedes cluster label $cluster")
      }
      if (wasKeeper == 1L) assert(cluster == docId,
        s"was_keeper requires the doc to carry the min label: $r")
      assert(r.getLong(5) >= 0L)
    }
    // chunk exposure reconciles against the built training set
    val chunkCounts = TextOps.trainingSetBuild(spark, sf)
      .select("doc_id").as[Long].collect()
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    out.foreach { r =>
      assert(r.getLong(5) == chunkCounts.getOrElse(r.getLong(0), 0L),
        s"n_chunks_affected mismatch at $r")
    }
  }
}
