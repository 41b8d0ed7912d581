package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product-quantization (PQ) ANN — the third scale path next to LSH and IVF,
  * completing the standard coarse-quantization family: split the embedding
  * space into `m` subspaces, train a tiny k-means codebook per subspace on a
  * bounded sample, and encode every corpus vector as `m` sub-cell ids packed
  * into ONE BIGINT. Query-time ranking is an ADC (asymmetric distance
  * computation) scan: per query, precompute a (m x ksub) lookup table of
  * query-subvector . sub-centroid dots, then score every code with `m` table
  * lookups — no float vector is touched until the exact rerank of the
  * surviving candidates.
  *
  * WHY this exists next to LSH/IVF: the 100 TB problem PQ solves is INDEX
  * RESIDENCY. A 64-dim float corpus is 256 B/vector; the default PQ8x4 code
  * + stored norm is 16 B/vector (8 B packed code + 8 B double norm — a
  * production trim stores the norm as float4 for 12 B; 16x smaller either
  * way, and the ranked scan reads only the 8-byte code column) — the
  * difference between an index that fits executor memory fleet-wide and one
  * that doesn't. The ADC scan is still O(n) per
  * query — at billion scale it composes with the IVF cell prune
  * ([[Similarity.ivfTopK]]'s inverted lists carrying codes instead of
  * vectors, the FAISS IVFPQ layout) — but its per-row cost is m integer
  * shifts + m array reads vs 64 FMAs + 256 B of column I/O for brute force.
  *
  * Everything is deterministic and AnnStore-persisted like the other ANN
  * artifacts: sample-trained codebooks ([[BookKind]]) and the encoded corpus
  * ([[CodesKind]]) are ingest-time work a fresh query session LOADS;
  * generation token `km1` covers the shared k-means recipe
  * ([[Similarity.kmeans]]), `p4` the bit-packing layout below. Approximate —
  * recall_e6 evidence vs [[Similarity.bruteForceTopK]] rides the result,
  * and PqSpec pins codebook determinism, code-domain bounds, rerank
  * exactness, a recall floor, and the fresh-session load path.
  */
object Pq {

  private[graft] val BookKind = "pqbook-v1-km1"
  private[graft] val CodesKind = "pqcodes-v1-km1p4"

  /** Codebooks as [m][ksub][dsub]: per subspace, `ksub` centroids over the
    * `dsub = dim/m` slice. Trained on the SAME deterministic bounded sample
    * recipe as [[Similarity.ivfCentroids]] (xxhash64-ordered ids, fixed
    * iteration count) — training never touches the full corpus.
    * `excludeMod > 0` trains on `vec_id % excludeMod != 0` only — the
    * "existing corpus" slice the incremental IVFADC path scores new
    * arrivals against (training on data that includes the arrivals would
    * leak the future); the store params carry the slice so full and sliced
    * codebooks never alias.
    */
  def codebooks(spark: SparkSession, d: String, m: Int = 8, ksub: Int = 16,
      sampleN: Int = 4096, iters: Int = 10,
      excludeMod: Int = 0): Array[Array[Array[Float]]] =
    Memo(spark, s"pqbook|$d|$m|$ksub|$sampleN|$iters|x$excludeMod") {
      import spark.implicits._
      val params = Similarity.sliceParams(s"$m-$ksub-$sampleN-$iters", excludeMod)
      val stored = AnnStore.loadOrBuild(spark,
        AnnStore.path(spark, BookKind, d, params)) {
        val sample = Similarity.embeddingsSlice(spark, d, excludeMod)
          .select(col("vec_id"), col("embedding"))
          .orderBy(xxhash64(col("vec_id")), col("vec_id"))
          .limit(sampleN)
          .as[(Long, Array[Float])].collect().map(_._2)
        val dim = sample.head.length
        require(dim % m == 0, s"PQ needs dim ($dim) divisible by m ($m)")
        val dsub = dim / m
        (0 until m).flatMap { s0 =>
          val sub = sample.map(v =>
            java.util.Arrays.copyOfRange(v, s0 * dsub, (s0 + 1) * dsub))
          Similarity.kmeans(sub, math.min(ksub, sub.length), iters)
            .zipWithIndex.map { case (c, i) => (s0, i, c) }
        }.toDF("sub", "cell", "centroid")
      }
      stored.as[(Int, Int, Array[Float])].collect()
        .groupBy(_._1).toArray.sortBy(_._1)
        .map(_._2.sortBy(_._2).map(_._3))
    }

  /** log2(ksub), the per-subspace code width; PQ packs `m * bits` into one
    * long, so `ksub` must be a power of two and the product at most 64.
    */
  private def codeBits(m: Int, ksub: Int): Int = {
    require(ksub >= 2 && (ksub & (ksub - 1)) == 0, s"ksub must be a power of 2, got $ksub")
    val bits = java.lang.Integer.numberOfTrailingZeros(ksub)
    require(m * bits <= 64, s"code m=$m x $bits bits exceeds one long")
    bits
  }

  /** Nearest sub-centroid of `x[off, off+dsub)` — the encode inner loop,
    * indexing the parent array in place (no per-subspace slice allocation).
    */
  private def nearestSub(x: Array[Float], off: Int, cents: Array[Array[Float]]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cents.length) {
      val ct = cents(c)
      var dist = 0.0
      var j = 0
      while (j < ct.length) {
        val diff = x(off + j) - ct(j)
        dist += diff * diff
        j += 1
      }
      if (dist < bestD) { bestD = dist; best = c } // ties keep lowest index
      c += 1
    }
    best
  }

  /** The encoded corpus: one (vec_id, code BIGINT, nrm DOUBLE) row per
    * vector — sub-cell `s` occupies bits `[s*bits, (s+1)*bits)`. One narrow
    * map with the codebooks riding the task closure (m x ksub x dsub floats,
    * a few KB); [[AnnStore]]-persisted so query sessions load 16 B/vector
    * instead of re-encoding the corpus.
    */
  def codes(spark: SparkSession, d: String, m: Int = 8, ksub: Int = 16,
      sampleN: Int = 4096, iters: Int = 10): DataFrame =
    Memo(spark, s"pqcodes|$d|$m|$ksub|$sampleN|$iters") {
      import spark.implicits._
      val books = codebooks(spark, d, m, ksub, sampleN, iters)
      val bits = codeBits(m, ksub)
      val dsub = books(0)(0).length
      AnnStore.loadOrBuild(spark,
        AnnStore.path(spark, CodesKind, d, s"$m-$ksub-$sampleN-$iters")) {
        Similarity.withNorm(Tables.embeddings(spark, d))
          .select(col("vec_id"), col("embedding"), col("nrm"))
          .as[(Long, Array[Float], Double)]
          .map { case (id, e, n) =>
            var code = 0L
            var s0 = 0
            while (s0 < m) {
              code |= nearestSub(e, s0 * dsub, books(s0)).toLong << (s0 * bits)
              s0 += 1
            }
            (id, code, n)
          }
          .toDF("vec_id", "code", "nrm")
      }.persist()
    }

  /** The collected (bounded) query set with norms, id-ordered. */
  private def querySet(spark: SparkSession, d: String,
      nQueries: Int): Array[(Long, Array[Float], Double)] = {
    import spark.implicits._
    Similarity.withNorm(
      Tables.embeddings(spark, d).filter(col("vec_id") < nQueries))
      .select(col("vec_id"), col("embedding"), col("nrm"))
      .as[(Long, Array[Float], Double)].collect().sortBy(_._1)
  }

  /** Per-query ADC lookup tables: (qid, qn, flat m x ksub array of
    * query-subvector . sub-centroid dots). nQueries x m x ksub doubles —
    * a few KB riding the task closure.
    */
  private def buildLuts(qs: Array[(Long, Array[Float], Double)],
      books: Array[Array[Array[Float]]], m: Int,
      ksub: Int): Array[(Long, Double, Array[Double])] = {
    val dsub = books(0)(0).length
    qs.map { case (qid, qe, qn) =>
      val lut = new Array[Double](m * ksub)
      var s0 = 0
      while (s0 < m) {
        val cents = books(s0)
        var c = 0
        while (c < cents.length) {
          val ct = cents(c)
          var acc = 0.0
          var j = 0
          while (j < dsub) { acc += qe(s0 * dsub + j).toDouble * ct(j); j += 1 }
          lut(s0 * ksub + c) = acc
          c += 1
        }
        s0 += 1
      }
      (qid, qn, lut)
    }
  }

  /** The shared ADC-prune tail: keep each qid's top `rerankK` candidates by
    * (asim DESC, cid ASC) via the bounded top-k hash aggregate
    * ([[graft.functions.TopKRank]]) — row-identical to the
    * `row_number() <= rerankK` window it replaces (every (qid, cid) pair
    * appears at most once in the ADC scan output on all three call sites),
    * with no sort and a |qids| x rerankK-bounded exchange.
    */
  private def pruneTopAsim(cand: DataFrame, rerankK: Int): DataFrame = {
    val spark = cand.sparkSession
    cand.groupBy(col("qid"))
      .agg(graft.functions.TopKAgg.topkRank(spark, col("asim"), col("cid"), rerankK).as("tk"))
      .select(col("qid"), explode(col("tk")).as("t"))
      .select(col("qid"), col("t.cid").as("cid"), col("t.sim").as("asim"))
  }

  /** Exact rerank of an ADC candidate frame (qid, cid, asim): broadcast the
    * tiny candidate set against the float corpus on cid, compute the exact
    * cosine, keep top-k per query. Shared by [[pqTopK]] and [[ivfpqTopK]] —
    * float vectors are touched ONLY here, for candidates.
    */
  private def exactRerank(spark: SparkSession, d: String, cand: DataFrame,
      nQueries: Int, k: Int): DataFrame = {
    val emb = Similarity.withNorm(Tables.embeddings(spark, d))
    val qdf = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("nrm").as("qn"))
    val ce = emb
      .select(col("vec_id").as("cid"), col("embedding").as("ce"), col("nrm").as("cn"))
    val w = Window.partitionBy(col("qid")).orderBy(desc("sim_e6"), asc("cid"))
    broadcast(cand).join(ce, "cid").join(broadcast(qdf), "qid")
      .withColumn("sim_e6",
        floor(graft.functions.VectorFunctions.dot_product(col("qe"), col("ce"))
          / (col("qn") * col("cn")) * lit(1000000.0)).cast("long"))
      .withColumn("asim_e6", floor(col("asim") * lit(1000000.0)).cast("long"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("cid"), col("sim_e6"), col("asim_e6"))
  }

  /** PQ top-k for the standard query set: ADC scan over the encoded corpus
    * ranks every candidate approximately, the top `rerankK` per query are
    * reranked EXACTLY against the float corpus, and recall_e6 evidence vs
    * the brute-force top-k rides the first `recallQueries` queries.
    *
    * Scan shape: the per-query LUTs (nQueries x m x ksub doubles, ~8 KB at
    * the defaults) are built driver-side from the bounded query set and ride
    * the task closure; the scan is ONE narrow pass over the (vec_id, code,
    * nrm) columns emitting (qid, cid, asim) rows whose per-row cost is m
    * shifted lookups. The `rerankK` prune is a rank window — Spark's
    * WindowGroupLimit keeps only locally-rankable rows per map partition, so
    * the exchange carries ~partitions x qids x rerankK rows, never the n x
    * nQueries scan output. The exact rerank joins the ~nQueries x rerankK
    * survivors (broadcast) against the corpus on cid — the expensive float
    * I/O touches only candidates.
    *
    * asim_e6 rides next to sim_e6 as evidence of the quantization
    * distortion the rerank corrects (PqSpec bounds rank correlation via the
    * recall floor; the exported sim_e6 itself is exact, same convention as
    * every LSH/IVF export).
    */
  def pqTopK(spark: SparkSession, d: String, k: Int = 5, nQueries: Int = 8,
      m: Int = 8, ksub: Int = 16, rerankK: Int = 64,
      recallQueries: Int = 8): DataFrame = {
    val topk = Memo(spark, s"pqtopk|$d|$k|$nQueries|$m|$ksub|$rerankK") {
      import spark.implicits._
      val books = codebooks(spark, d, m, ksub)
      val enc = codes(spark, d, m, ksub)
      val bits = codeBits(m, ksub)
      val mask = ksub - 1
      val luts = buildLuts(querySet(spark, d, nQueries), books, m, ksub)
      val approx = enc
        .as[(Long, Long, Double)]
        .flatMap { case (cid, code, cn) =>
          luts.iterator.filter(_._1 != cid).map { case (qid, qn, lut) =>
            var acc = 0.0
            var s0 = 0
            while (s0 < m) {
              acc += lut(s0 * ksub + ((code >>> (s0 * bits)) & mask).toInt)
              s0 += 1
            }
            (qid, cid, acc / (qn * cn))
          }
        }
        .toDF("qid", "cid", "asim")
      // r21: bounded top-k hash aggregate replaces the ADC rank window —
      // each (qid, cid) appears at most once in the scan output, so the
      // aggregate's distinct-pair ranks equal row_number (see TopKRank).
      val cand = pruneTopAsim(approx, rerankK)
      exactRerank(spark, d, cand, nQueries, k).persist()
    }
    if (recallQueries <= 0) topk.orderBy("qid", "rank")
    else Similarity.withRecall(topk, spark, d, recallQueries, k)
      // unmeasured queries carry NULL, never a fake 0 (same mask as annTopK)
      .withColumn("recall_e6",
        when(col("qid") < recallQueries, col("recall_e6")))
      .select(col("qid"), col("rank"), col("cid"), col("sim_e6"),
        col("asim_e6"), col("recall_e6"))
      .orderBy("qid", "rank")
  }

  /** IVF inverted lists carrying PQ CODES — the IVFADC layout: one
    * (cell, cid, code, cn) row per corpus vector at its assigned coarse
    * cell, 16 B of payload instead of the 256 B embedding the
    * embedding-carrying home store pays. Cell assignment and PQ encode
    * happen in ONE narrow map (centroids + codebooks ride the closure);
    * [[AnnStore]]-persisted, params pin BOTH quantizers' full identity.
    */
  private[graft] val IvfPqKind = "ivfpqhome-v1-km1p4"

  private[graft] def ivfpqHome(spark: SparkSession, d: String, nCells: Int,
      m: Int, ksub: Int, sampleN: Int = 4096, iters: Int = 10,
      excludeMod: Int = 0): DataFrame =
    Memo(spark, s"ivfpqhome|$d|$nCells|$m|$ksub|$sampleN|$iters|x$excludeMod") {
      import spark.implicits._
      val cents = Similarity.ivfCentroids(spark, d, nCells, sampleN, iters, excludeMod)
      val books = codebooks(spark, d, m, ksub, sampleN, iters, excludeMod)
      val bits = codeBits(m, ksub)
      val dsub = books(0)(0).length
      val params = Similarity.sliceParams(s"$nCells-$m-$ksub-$sampleN-$iters", excludeMod)
      AnnStore.loadOrBuild(spark,
        AnnStore.path(spark, IvfPqKind, d, params)) {
        Similarity.withNorm(Similarity.embeddingsSlice(spark, d, excludeMod))
          .select(col("vec_id"), col("embedding"), col("nrm"))
          .as[(Long, Array[Float], Double)]
          .map { case (id, e, n) =>
            var code = 0L
            var s0 = 0
            while (s0 < m) {
              code |= nearestSub(e, s0 * dsub, books(s0)).toLong << (s0 * bits)
              s0 += 1
            }
            (Similarity.nearestCentroid(e, cents), id, code, n)
          }
          .toDF("cell", "cid", "code", "cn")
      }.persist()
    }

  /** IVF-PQ top-k — the composition that survives BILLION-vector scale,
    * where neither parent suffices alone: plain IVF's inverted lists carry
    * full float vectors (residency problem), plain PQ's ADC scan is O(n)
    * per query (scan problem). Here each query probes its `nProbe` nearest
    * coarse cells (the IVF prune: candidates ~ nProbe/nCells of the
    * corpus), candidates arrive as 16 B code rows scored by the SAME ADC
    * lookup tables as [[pqTopK]], and the exact rerank touches float
    * vectors only for the `rerankK` survivors. FAISS's IVFADC recipe,
    * minus residual encoding (codes quantize the raw vectors, shared with
    * the flat-PQ store; the residual refinement is a codebook change under
    * a new generation token, not a plan change).
    *
    * Composition gate (PqSpec): with `nProbe = nCells` the cell prune
    * admits everything, so the result must equal [[pqTopK]] at the same
    * rerankK row-for-row — candidate generation is the ONLY approximation
    * either path adds on top of the shared quantizer.
    *
    * Scale shape: the probe list (nQueries x nProbe rows) broadcasts into
    * a cell-keyed equi-join against the code-carrying lists — never
    * query x corpus; a cid lives in exactly one cell so no post-rank
    * dedup; recall_e6 evidence rides the panel as everywhere.
    */
  def ivfpqTopK(spark: SparkSession, d: String, k: Int = 5, nQueries: Int = 8,
      nCells: Int = 64, nProbe: Int = 24, m: Int = 8, ksub: Int = 16,
      rerankK: Int = 64, recallQueries: Int = 8): DataFrame = {
    val topk = Memo(spark, s"ivfpqtopk|$d|$k|$nQueries|$nCells|$nProbe|$m|$ksub|$rerankK") {
      import spark.implicits._
      val cents = Similarity.ivfCentroids(spark, d, nCells)
      val books = codebooks(spark, d, m, ksub)
      val bits = codeBits(m, ksub)
      val mask = ksub - 1
      val qs = querySet(spark, d, nQueries)
      val luts = buildLuts(qs, books, m, ksub).map(l => l._1 -> ((l._2, l._3))).toMap
      // driver-side probe lists for the bounded query set (the incremental
      // IVF path does the same assignment executor-side for large batches)
      val probes = qs.flatMap { case (qid, qe, _) =>
        Similarity.nearestCentroids(qe, cents, nProbe).map(c => (c, qid))
      }.toSeq.toDF("cell", "qid")
      val home = ivfpqHome(spark, d, nCells, m, ksub)
      val cand = home.join(broadcast(probes), Seq("cell"))
        .filter(col("qid") =!= col("cid"))
        .select(col("qid"), col("cid"), col("code"), col("cn"))
        .as[(Long, Long, Long, Double)]
        .map { case (qid, cid, code, cn) =>
          val (qn, lut) = luts(qid)
          var acc = 0.0
          var s0 = 0
          while (s0 < m) {
            acc += lut(s0 * ksub + ((code >>> (s0 * bits)) & mask).toInt)
            s0 += 1
          }
          (qid, cid, acc / (qn * cn))
        }
        .toDF("qid", "cid", "asim")
      // r21: same bounded top-k aggregate prune as pqTopK (unique pairs)
      val pruned = pruneTopAsim(cand, rerankK)
      exactRerank(spark, d, pruned, nQueries, k).persist()
    }
    if (recallQueries <= 0) topk.orderBy("qid", "rank")
    else Similarity.withRecall(topk, spark, d, recallQueries, k)
      .withColumn("recall_e6",
        when(col("qid") < recallQueries, col("recall_e6")))
      .select(col("qid"), col("rank"), col("cid"), col("sim_e6"),
        col("asim_e6"), col("recall_e6"))
      .orderBy("qid", "rank")
  }

  /** IVFADC probe core shared by [[incrementalIvfPqTopK]] (batch) and
    * [[graft.streaming.StreamingAnn.admissionStreamIvfPq]] (per
    * micro-batch): top-k nearest index vectors for every probe-side vector,
    * scored against 16 B code rows. Each vector is assigned its `nProbe`
    * nearest centroids in one narrow map (centroids ride the closure),
    * candidates come from the cell-keyed equi-join against the code-carrying
    * inverted lists — never probe x index — and are ADC-scored in a
    * mapPartitions pass that builds each query's (m x ksub) lookup table
    * ONCE per partition on first sight (the LUT cache; per-candidate cost is
    * then m shifted lookups, and the embedding never rides past this stage).
    * The `rerankK` prune is a rank window (WindowGroupLimit bounds the
    * exchange), and the exact rerank joins the bounded survivor set against
    * the FLOAT corpus (`corpusEmb`: (cid, ce, cn)) — float vectors are
    * touched only for candidates, exactly the [[pqTopK]] discipline.
    */
  private[graft] def probeIvfPqTopK(newVecs: DataFrame, idxHome: DataFrame,
      corpusEmb: DataFrame, cents: Array[Array[Float]],
      books: Array[Array[Array[Float]]], m: Int, ksub: Int, nProbe: Int,
      rerankK: Int, k: Int, broadcastIdx: Boolean): DataFrame = {
    val spark = newVecs.sparkSession
    import spark.implicits._
    val bits = codeBits(m, ksub)
    val mask = ksub - 1
    val dsub = books(0)(0).length
    val newSide = Similarity.withNorm(newVecs)
      .select(col("vec_id"), col("embedding"), col("nrm"))
      .as[(Long, Array[Float], Double)]
      .flatMap { case (id, e, n) =>
        Similarity.nearestCentroids(e, cents, nProbe).map(c => (c, id, e, n)) }
      .toDF("cell", "qid", "qe", "qn")
    val cand = newSide
      .join(if (broadcastIdx) broadcast(idxHome) else idxHome, Seq("cell"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("qe"), col("qn"), col("cid"), col("cn"), col("code"))
      .as[(Long, Array[Float], Double, Long, Double, Long)]
      .mapPartitions { it =>
        // per-partition LUT cache: one (m x ksub) table per distinct qid
        // seen, built from the query embedding riding the candidate row
        val luts = scala.collection.mutable.HashMap.empty[Long, Array[Double]]
        it.map { case (qid, qe, qn, cid, cn, code) =>
          val lut = luts.getOrElseUpdate(qid, {
            val t = new Array[Double](m * ksub)
            var s0 = 0
            while (s0 < m) {
              val cs = books(s0)
              var c = 0
              while (c < cs.length) {
                val ct = cs(c)
                var acc = 0.0
                var j = 0
                while (j < dsub) { acc += qe(s0 * dsub + j).toDouble * ct(j); j += 1 }
                t(s0 * ksub + c) = acc
                c += 1
              }
              s0 += 1
            }
            t
          })
          var acc = 0.0
          var s0 = 0
          while (s0 < m) {
            acc += lut(s0 * ksub + ((code >>> (s0 * bits)) & mask).toInt)
            s0 += 1
          }
          (qid, cid, acc / (qn * cn))
        }
      }
      .toDF("qid", "cid", "asim")
    // r21: bounded top-k hash aggregate replaces the ADC rank window (a cid
    // lives in one cell, so pairs are unique and ranks equal row_number)
    val pruned = pruneTopAsim(cand, rerankK)
    // exact rerank: survivors (qids x rerankK) join the float corpus on
    // cid; the query embedding comes back from the batch. NO broadcast
    // hint — the survivor count is proportional to the PROBE side
    // (incrementalIvfPqTopK probes corpus/batchMod vectors, so a forced
    // broadcast would grow with the corpus); the size-gated planner picks
    // the strategy, exactly as the LSH/IVF incremental twins leave it
    // (the bounded-query-set pqTopK/ivfpqTopK reranks broadcast their
    // ~nQueries x rerankK frames explicitly and legitimately)
    val q = Similarity.withNorm(newVecs)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("nrm").as("qn"))
    val w = Window.partitionBy(col("qid")).orderBy(desc("sim"), asc("cid"))
    pruned.join(corpusEmb, "cid").join(q, "qid")
      .withColumn("sim",
        graft.functions.VectorFunctions.dot_product(col("qe"), col("ce"))
          / (col("qn") * col("cn")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("cid"),
        round(col("sim"), 6).as("sim"), round(col("asim"), 6).as("asim"))
  }

  /** Incremental IVF-PQ under CDC — IVFADC parity for the incremental path,
    * completing the ladder for the composition the way
    * [[Similarity.incrementalIvfTopK]] did for plain IVF: a NEW batch of
    * vectors (`vec_id % batchMod == 0`) is assigned to the PERSISTED
    * old-slice coarse centroids and probes `nProbe` cells of the persisted
    * old-slice CODE store ([[ivfpqHome]] with `excludeMod` — 16 B rows, the
    * index-residency argument, now for the admission path too); ADC scoring
    * via [[probeIvfPqTopK]]'s LUT cache, exact rerank against the old-slice
    * float corpus only for the `rerankK` survivors.
    *
    * All three artifacts (centroids, codebooks, code lists) are
    * [[AnnStore]]-persisted ingest-time work trained on the old slice only
    * (training on data that includes the arrivals would leak the future);
    * their store params carry `-x$batchMod` so sliced and full artifacts
    * never alias. Per-batch cost: one narrow assignment+LUT map + one
    * cell-keyed equi-join against code rows + a bounded rerank join.
    *
    * recall_e6 evidence vs the exact new x old brute force rides the first
    * `recallQueries` new ids ([[Similarity.withIncrementalRecall]] — NULL
    * beyond the panel, never a fake 0); `asim` rides as quantization-
    * distortion evidence like every PQ export.
    */
  def incrementalIvfPqTopK(spark: SparkSession, d: String, k: Int = 5,
      batchMod: Int = 10, nCells: Int = 64, nProbe: Int = 24, m: Int = 8,
      ksub: Int = 16, rerankK: Int = 64, recallQueries: Int = 8): DataFrame = {
    val topk = Memo(spark,
      s"incivfpq|$d|$k|$batchMod|$nCells|$nProbe|$m|$ksub|$rerankK") {
      val cents = Similarity.ivfCentroids(spark, d, nCells, excludeMod = batchMod)
      val books = codebooks(spark, d, m, ksub, excludeMod = batchMod)
      val home = ivfpqHome(spark, d, nCells, m, ksub, excludeMod = batchMod)
      val corpusEmb = Similarity.withNorm(
        Tables.embeddings(spark, d)
          .filter(pmod(col("vec_id"), lit(batchMod)) =!= 0))
        .select(col("vec_id").as("cid"), col("embedding").as("ce"),
          col("nrm").as("cn"))
      // code rows are ~48 B with row overhead (vs 300 B for the
      // embedding-carrying IVF home) — the broadcast gate reflects that
      val homeBroadcastable =
        Similarity.corpusSize(spark, d) * 48L < 50L * 1024 * 1024
      probeIvfPqTopK(
        Tables.embeddings(spark, d)
          .filter(pmod(col("vec_id"), lit(batchMod)) === 0),
        home, corpusEmb, cents, books, m, ksub, nProbe, rerankK, k,
        homeBroadcastable)
        .persist()
    }
    if (recallQueries <= 0) topk.orderBy("qid", "rank")
    else Similarity.withIncrementalRecall(topk, spark, d, batchMod, k, recallQueries)
  }

  /** PQ codebook-HEALTH stats — [[Similarity.ivfCellStats]]' analogue for
    * the product quantizer, completing the drift-monitor symmetry (LSH has
    * the recall panels, IVF has cell stats, PQ gets code stats): per
    * (subspace, sub-cell), member count and the integer-mean squared
    * distortion between the sub-vector and its assigned sub-centroid
    * (floor(dist²·1e6) per row, then integer `div` — deterministic under
    * any partitioning). Distortion creep per subspace is the number that
    * decides when to retrain the codebooks under a new generation token;
    * a sub-cell whose membership collapses to ~0 means the codebook no
    * longer spans the ingested distribution.
    *
    * Scale shape: one narrow map (codebooks ride the closure, a few KB) +
    * one hash aggregation on (sub, cell) — ≤ m × ksub output rows, no
    * joins, no explode beyond the in-row m-way emit.
    */
  def pqCodeStats(spark: SparkSession, d: String, m: Int = 8,
      ksub: Int = 16): DataFrame = {
    import spark.implicits._
    val books = codebooks(spark, d, m, ksub)
    val dsub = books(0)(0).length
    Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .flatMap { case (_, e) =>
        (0 until m).iterator.map { s0 =>
          val c = nearestSub(e, s0 * dsub, books(s0))
          val ct = books(s0)(c)
          var d2 = 0.0
          var j = 0
          while (j < dsub) {
            val diff = e(s0 * dsub + j) - ct(j)
            d2 += diff * diff
            j += 1
          }
          (s0, c, math.floor(d2 * 1e6).toLong)
        }
      }
      .toDF("sub", "cell", "d2_e6")
      .groupBy(col("sub"), col("cell"))
      .agg(count(lit(1)).as("n_members"),
        sum(col("d2_e6")).cast("long").as("d2_e6_sum"))
      .withColumn("mean_d2_e6", expr("d2_e6_sum div n_members"))
      .select(col("sub"), col("cell"), col("n_members"), col("mean_d2_e6"))
      .orderBy("sub", "cell")
  }

  /** Cross-method ANN quality panel — the monitoring face of the whole
    * similarity family (the analogue of [[Similarity.ivfCellStats]] for
    * method choice rather than index drift): per approximate path
    * (lsh / ivf / pq / ivfpq), the measured-panel query count and the
    * mean/min per-query recall_e6 vs the shared exact brute force. This is
    * the number an operator watches to pick (or demote) a method as the
    * corpus and its distribution grow — recall decay shows up here before
    * it shows up in product metrics.
    *
    * One row per qid enters each aggregate (recall_e6 rides duplicated on
    * every rank row — distinct'd first); means are integer `div` over the
    * e6 sums, deterministic under any partitioning. Every input is the
    * session-memoized operator result, so the panel costs four ~40-row
    * aggregations on top of work the bench/verify run already did.
    */
  def annMethodPanel(spark: SparkSession, d: String): DataFrame = {
    def summarize(df: DataFrame, method: String): DataFrame =
      df.filter(col("recall_e6").isNotNull)
        .select(col("qid"), col("recall_e6")).distinct()
        .agg(count(lit(1)).as("n_queries"),
          sum(col("recall_e6")).cast("long").as("recall_e6_sum"),
          min(col("recall_e6")).as("min_recall_e6"))
        .select(lit(method).as("method"), col("n_queries"),
          expr("recall_e6_sum div n_queries").as("mean_recall_e6"),
          col("min_recall_e6"))
    summarize(Similarity.annTopK(spark, d), "lsh")
      .unionAll(summarize(Similarity.ivfTopK(spark, d), "ivf"))
      .unionAll(summarize(pqTopK(spark, d), "pq"))
      .unionAll(summarize(ivfpqTopK(spark, d), "ivfpq"))
      .orderBy("method")
  }
}
