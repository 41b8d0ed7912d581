package graft.ops

import graft.SparkSuite

/** Product-quantization ANN gates: codebook/code-domain invariants, the
  * EXACTNESS of the rerank (exported sim_e6 recomputed independently), the
  * brute-force-equality limit (rerankK covering the corpus must reproduce
  * [[Similarity.bruteForceTopK]] row-for-row — only candidate generation
  * approximates, so widening it to everything removes the approximation
  * entirely), a recall floor at the production operating point, and the
  * fresh-session [[AnnStore]] load path.
  */
class PqSpec extends SparkSuite {

  test("codebooks: deterministic shape, codes: one row per vector, sub-codes in domain") {
    val m = 8; val ksub = 16
    val books = Pq.codebooks(spark, sf, m, ksub)
    assert(books.length == m)
    assert(books.forall(_.length == ksub))
    assert(books.forall(_.forall(_.length == 64 / m)))

    val enc = Pq.codes(spark, sf, m, ksub).collect()
    val n = Tables.embeddings(spark, sf).count()
    assert(enc.length == n, "one code row per corpus vector")
    assert(enc.map(_.getAs[Long]("vec_id")).distinct.length == n)
    val bits = java.lang.Integer.numberOfTrailingZeros(ksub)
    val mask = ksub - 1
    enc.foreach { r =>
      val code = r.getAs[Long]("code")
      (0 until m).foreach { s0 =>
        val c = ((code >>> (s0 * bits)) & mask).toInt
        assert(c >= 0 && c < ksub, s"sub-code $c out of [0, $ksub)")
      }
      // packed layout uses exactly m*bits low bits
      assert(m * bits == 64 || (code >>> (m * bits)) == 0L)
    }
  }

  test("rerank is exact: exported sim_e6 matches an independent recomputation") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf)
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("embedding"))
      .as[(Long, Array[Float])].collect().toMap
    def nrm(v: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < v.length) { acc += v(i).toDouble * v(i); i += 1 }
      math.sqrt(acc)
    }
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i); i += 1 }
      acc
    }
    val rows = Pq.pqTopK(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val q = emb(r.getAs[Long]("qid")); val c = emb(r.getAs[Long]("cid"))
      val expect = math.floor(dot(q, c) / (nrm(q) * nrm(c)) * 1e6).toLong
      assert(r.getAs[Long]("sim_e6") == expect,
        s"rerank must be exact for (${r.getAs[Long]("qid")}, ${r.getAs[Long]("cid")})")
    }
  }

  test("rerankK covering the corpus reproduces brute force row-for-row") {
    val n = Tables.embeddings(spark, sf).count().toInt
    val pq = Pq.pqTopK(spark, sf, rerankK = n, recallQueries = 0)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("rank"),
        r.getAs[Long]("cid"), r.getAs[Long]("sim_e6")))
    val brute = Similarity.bruteForceTopK(spark, sf)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("rank"),
        r.getAs[Long]("cid"), r.getAs[Long]("sim_e6")))
    assert(pq.toSeq == brute.toSeq,
      "ADC candidates covering everything + exact rerank == brute force")
  }

  test("recall floor at the production operating point; distortion evidence rides") {
    val rows = Pq.pqTopK(spark, sf).collect()
    assert(rows.forall(r => !r.isNullAt(r.fieldIndex("recall_e6"))),
      "default panel covers every query")
    val recalls = rows.map(_.getAs[Long]("recall_e6"))
    val mean = recalls.map(_.toDouble).sum / recalls.length
    assert(mean >= 600000.0, s"panel mean recall ${mean / 1e6} below the 0.6 floor")
    // asim is the quantized approximation — present, bounded like a cosine
    rows.foreach { r =>
      val a = r.getAs[Long]("asim_e6")
      assert(a >= -1100000L && a <= 1100000L, s"asim_e6 $a outside plausible cosine range")
    }
  }

  test("IVF-PQ with nProbe = nCells reproduces flat PQ row-for-row") {
    // the composition gate: the cell prune is the ONLY approximation IVFPQ
    // adds on top of the shared quantizer — probing every cell removes it
    val full = Pq.ivfpqTopK(spark, sf, nCells = 64, nProbe = 64, recallQueries = 0)
      .collect()
    val flat = Pq.pqTopK(spark, sf, recallQueries = 0).collect()
    assert(full.toSeq == flat.toSeq)
  }

  test("IVF-PQ: recall floor at the production operating point") {
    val rows = Pq.ivfpqTopK(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => !r.isNullAt(r.fieldIndex("recall_e6"))))
    val mean = rows.map(_.getAs[Long]("recall_e6").toDouble).sum / rows.length
    assert(mean >= 600000.0, s"panel mean recall ${mean / 1e6} below the 0.6 floor")
  }

  test("fresh-session ivfpqTopK loads centroids+codebooks+code lists, bit-identical") {
    val before = AnnStore.buildCount.get()
    val r1 = Pq.ivfpqTopK(spark, sf, nCells = 16, nProbe = 8, m = 4, ksub = 8,
      recallQueries = 0).collect()
    val afterBuild = AnnStore.buildCount.get()
    assert(afterBuild > before, "first call on a cold store must build+publish")
    assert(r1.nonEmpty)

    Memo.clear(spark)
    val r2 = Pq.ivfpqTopK(spark, sf, nCells = 16, nProbe = 8, m = 4, ksub = 8,
      recallQueries = 0).collect()
    assert(AnnStore.buildCount.get() == afterBuild,
      "fresh session must LOAD all three artifacts, not rebuild")
    assert(r2.toSeq == r1.toSeq)
  }

  test("ann method panel: all four methods, sane bounds, means match the sources") {
    val rows = Pq.annMethodPanel(spark, sf).collect()
    assert(rows.map(_.getAs[String]("method")).toSeq ==
      Seq("ivf", "ivfpq", "lsh", "pq"))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_queries") == 8L, "default panel is 8 queries")
      val mean = r.getAs[Long]("mean_recall_e6")
      val mn = r.getAs[Long]("min_recall_e6")
      assert(mean >= 0L && mean <= 1000000L)
      assert(mn >= 0L && mn <= mean, "min cannot exceed the mean")
    }
    // cross-check one method's mean against an independent recomputation
    val pqRows = Pq.pqTopK(spark, sf).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("recall_e6"))).distinct
    val expect = pqRows.map(_._2).sum / pqRows.length
    val got = rows.find(_.getAs[String]("method") == "pq").get
      .getAs[Long]("mean_recall_e6")
    assert(got == expect)
  }

  test("incremental IVFADC: slice discipline, exact rerank, evidence columns") {
    import spark.implicits._
    val out = Pq.incrementalIvfPqTopK(spark, sf).collect()
    assert(out.nonEmpty)
    // queries come from the NEW batch, candidates only from the OLD corpus
    out.foreach { r =>
      assert(r.getAs[Long]("qid") % 10 == 0, s"qid must be new-batch: $r")
      assert(r.getAs[Long]("cid") % 10 != 0, s"cid must be old-corpus: $r")
    }
    // the ADC scan approximates candidate GENERATION and ORDERING, never
    // the exported score: sim is the exact cosine
    val emb = Tables.embeddings(spark, sf)
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("embedding"))
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
      val want = cos(emb(r.getAs[Long]("qid")), emb(r.getAs[Long]("cid")))
      assert(math.abs(r.getAs[Double]("sim") - want) <= 1e-6, s"sim mismatch at $r")
      // asim is the quantized approximation — present, bounded like a cosine
      assert(math.abs(r.getAs[Double]("asim")) <= 1.1, s"asim out of range at $r")
    }
    // recall evidence exactly on the panel (first 8 new ids), NULL beyond,
    // with the production-operating-point floor the other paths carry
    val panel = out.filter(_.getAs[Long]("qid") < 80)
    assert(panel.nonEmpty)
    assert(panel.forall(r => !r.isNullAt(r.fieldIndex("recall_e6"))))
    assert(out.filter(_.getAs[Long]("qid") >= 80)
      .forall(r => r.isNullAt(r.fieldIndex("recall_e6"))),
      "non-panel qids must carry NULL recall")
    val recalls = panel.map(r => (r.getAs[Long]("qid"), r.getAs[Long]("recall_e6")))
      .distinct
    val mean = recalls.map(_._2.toDouble).sum / recalls.length
    assert(mean >= 600000.0, s"panel mean recall ${mean / 1e6} below the 0.6 floor")
  }

  test("incremental IVFADC composition gate: full probe + full rerank == exact incremental IVF") {
    // probing every cell and reranking every candidate removes BOTH
    // approximations (cell prune, ADC ordering) — the result must equal the
    // plain incremental IVF at the same full-probe point, which is itself
    // the exact new x old top-k there
    val oldN = Tables.embeddings(spark, sf)
      .filter(org.apache.spark.sql.functions.col("vec_id") % 10 =!= 0)
      .count().toInt
    val full = Pq.incrementalIvfPqTopK(spark, sf, nProbe = 64, rerankK = oldN,
      recallQueries = 0).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("rank"),
        r.getAs[Long]("cid"), r.getAs[Double]("sim")))
    val ivf = Similarity.incrementalIvfTopK(spark, sf, nProbe = 64,
      recallQueries = 0).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(full.toSeq == ivf.toSeq)
  }

  test("fresh-session incremental IVFADC loads all three SLICED artifacts, bit-identical") {
    // non-default parameter point so no other suite pre-warmed the stores;
    // the -x10 params keep sliced artifacts from aliasing the full ones
    val before = AnnStore.buildCount.get()
    val r1 = Pq.incrementalIvfPqTopK(spark, sf, nCells = 16, nProbe = 8,
      m = 4, ksub = 8, recallQueries = 0).collect()
    val afterBuild = AnnStore.buildCount.get()
    assert(afterBuild > before, "first call on a cold store must build+publish")
    assert(r1.nonEmpty)

    Memo.clear(spark)
    val r2 = Pq.incrementalIvfPqTopK(spark, sf, nCells = 16, nProbe = 8,
      m = 4, ksub = 8, recallQueries = 0).collect()
    assert(AnnStore.buildCount.get() == afterBuild,
      "fresh session must LOAD centroids+codebooks+code lists, not rebuild")
    assert(r2.toSeq == r1.toSeq)
  }

  test("pq code stats: partition per subspace, assignment-consistent with stored codes") {
    val m = 8; val ksub = 16
    val rows = Pq.pqCodeStats(spark, sf, m, ksub).collect()
    assert(rows.nonEmpty)
    val n = Tables.embeddings(spark, sf).count()
    // per subspace, memberships partition the corpus
    (0 until m).foreach { s0 =>
      val sub = rows.filter(_.getAs[Int]("sub") == s0)
      assert(sub.map(_.getAs[Long]("n_members")).sum == n,
        s"subspace $s0 memberships must sum to the corpus")
      sub.foreach { r =>
        val c = r.getAs[Int]("cell")
        assert(c >= 0 && c < ksub)
        assert(r.getAs[Long]("mean_d2_e6") >= 0L)
      }
    }
    // the stats' assignments are the SAME the stored codes carry: per
    // (sub, cell), the count must equal the code-column decode
    val bits = java.lang.Integer.numberOfTrailingZeros(ksub)
    val mask = ksub - 1
    val fromCodes = Pq.codes(spark, sf, m, ksub).collect()
      .flatMap { r =>
        val code = r.getAs[Long]("code")
        (0 until m).map(s0 => (s0, ((code >>> (s0 * bits)) & mask).toInt))
      }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    rows.foreach { r =>
      val key = (r.getAs[Int]("sub"), r.getAs[Int]("cell"))
      assert(r.getAs[Long]("n_members") == fromCodes.getOrElse(key, 0L),
        s"stats and stored codes disagree at $key")
    }
    // determinism
    val again = Pq.pqCodeStats(spark, sf, m, ksub).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("fresh-session pqTopK loads the published codebooks+codes, bit-identical") {
    // non-default parameter point: no other suite can have pre-warmed it
    val before = AnnStore.buildCount.get()
    val r1 = Pq.pqTopK(spark, sf, m = 4, ksub = 8, recallQueries = 0).collect()
    val afterBuild = AnnStore.buildCount.get()
    assert(afterBuild > before, "first call on a cold store must build+publish")
    assert(r1.nonEmpty)

    Memo.clear(spark)
    val r2 = Pq.pqTopK(spark, sf, m = 4, ksub = 8, recallQueries = 0).collect()
    assert(AnnStore.buildCount.get() == afterBuild,
      "fresh session must LOAD codebooks and codes, not rebuild")
    assert(r2.toSeq == r1.toSeq)
  }
}
