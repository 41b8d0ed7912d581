package graft.ops

import graft.SparkSuite

/** The VERDICT r9–r11 gate for persistent ANN indexes: a FRESH session
  * (simulated by [[Memo.clear]] — the only cross-session state besides the
  * [[AnnStore]] parquet) must serve its top-k by LOADING the published
  * store, not rebuilding it, and the loaded answer must be bit-identical to
  * the building session's.
  *
  * Non-default parameter points are used throughout so no other suite in
  * this JVM can have pre-warmed either the Memo or the store for these keys
  * — the first call is provably a build, the post-clear call provably a
  * load ([[AnnStore.buildCount]] is the witness).
  */
class AnnStoreSpec extends SparkSuite {

  test("LSH: fresh-session annTopK loads the published index, bit-identical") {
    val before = AnnStore.buildCount.get()
    val r1 = Similarity.annTopK(spark, sf, nTables = 6, recallQueries = 0).collect()
    val afterBuild = AnnStore.buildCount.get()
    assert(afterBuild > before, "first call on a cold store must build+publish")
    assert(r1.nonEmpty)

    Memo.clear(spark) // the fresh-driver cache state
    val r2 = Similarity.annTopK(spark, sf, nTables = 6, recallQueries = 0).collect()
    assert(AnnStore.buildCount.get() == afterBuild,
      "fresh session must LOAD the store, not rebuild it")
    // qid/rank/cid are longs, sim a round-6 double computed from parquet-
    // round-tripped (bit-exact) floats/doubles — Row equality is exact
    assert(r2.toSeq == r1.toSeq)
  }

  test("IVF: fresh-session ivfTopK loads the published centroids, bit-identical") {
    val before = AnnStore.buildCount.get()
    val r1 = Similarity.ivfTopK(spark, sf, nCells = 32, withRecallCol = false).collect()
    val afterBuild = AnnStore.buildCount.get()
    assert(afterBuild > before, "first call on a cold store must train+publish")
    assert(r1.nonEmpty)

    Memo.clear(spark)
    val r2 = Similarity.ivfTopK(spark, sf, nCells = 32, withRecallCol = false).collect()
    assert(AnnStore.buildCount.get() == afterBuild,
      "fresh session must LOAD the centroids, not retrain")
    assert(r2.toSeq == r1.toSeq)
  }

  test("sliced (excludeMod) index: fresh-session incremental ANN loads, bit-identical") {
    val before = AnnStore.buildCount.get()
    val r1 = Similarity.incrementalAnnTopK(spark, sf, nTables = 7, recallQueries = 0).collect()
    val afterBuild = AnnStore.buildCount.get()
    assert(afterBuild > before, "cold sliced store must build+publish")
    assert(r1.nonEmpty)

    Memo.clear(spark)
    val r2 = Similarity.incrementalAnnTopK(spark, sf, nTables = 7, recallQueries = 0).collect()
    assert(AnnStore.buildCount.get() == afterBuild,
      "fresh session must LOAD the sliced store, not rebuild it")
    assert(r2.toSeq == r1.toSeq)
  }

  test("publish loses a race gracefully: no nesting inside an existing store") {
    // ADVICE r13 (medium): FileSystem.rename into an existing directory
    // MOVES the tmp dir inside it (returning true) — the loser's dataset
    // would nest under the winner's and corrupt every later read. publish()
    // must detect the existing target, delete its own attempt, and report
    // the loss.
    import org.apache.hadoop.fs.Path
    val conf = spark.sessionState.newHadoopConf()
    val base = java.nio.file.Files.createTempDirectory("graft_ann_race").toString
    val target = new Path(s"$base/store")
    val fs = target.getFileSystem(conf)
    fs.mkdirs(target)
    val marker = new Path(target, "_SUCCESS")
    fs.create(marker).close() // the winner's published store
    val tmp = new Path(s"$base/store.build-loser")
    fs.mkdirs(tmp)
    fs.create(new Path(tmp, "part-0.parquet")).close()

    assert(!AnnStore.publish(fs, conf, tmp, target), "must report the lost race")
    assert(!fs.exists(tmp), "loser's tmp must be deleted")
    assert(fs.exists(marker), "winner's store must be untouched")
    val nested = fs.listStatus(target).map(_.getPath.getName).toSet
    assert(nested == Set("_SUCCESS"), s"nothing may nest inside the store: $nested")
  }

  test("stale .build-* orphans are swept on load; corpus fingerprint keys the path") {
    import org.apache.hadoop.fs.Path
    val conf = spark.sessionState.newHadoopConf()

    // fingerprint: metadata-derived, so touching the corpus file's mtime
    // must move the store path (ADVICE r13: a regenerated corpus at the
    // same path must never be served the old index)
    val corpus = java.nio.file.Files.createTempDirectory("graft_ann_fp")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/embeddings.parquet"),
      corpus.resolve("embeddings.parquet"))
    val p1 = AnnStore.path(spark, "t-v1", corpus.toString, "x")
    java.nio.file.Files.setLastModifiedTime(corpus.resolve("embeddings.parquet"),
      java.nio.file.attribute.FileTime.fromMillis(12345678L))
    val p2 = AnnStore.path(spark, "t-v1", corpus.toString, "x")
    assert(p1 != p2, "corpus fingerprint must change with the corpus data")

    // orphan sweep: an abandoned tmp older than the TTL disappears on the
    // next successful loadOrBuild of the same target; a FRESH one survives
    // (it may belong to a live builder)
    val dir = AnnStore.path(spark, "t-v1", corpus.toString, "sweep")
    val fs = new Path(dir).getFileSystem(conf)
    val stale = new Path(dir + ".build-stale")
    val fresh = new Path(dir + ".build-fresh")
    fs.mkdirs(stale); fs.mkdirs(fresh)
    fs.setTimes(stale, System.currentTimeMillis() - AnnStore.OrphanTtlMs - 60000L, -1)
    AnnStore.loadOrBuild(spark, dir) {
      spark.range(3).toDF("id")
    }.collect()
    assert(!fs.exists(stale), "stale orphan must be swept")
    assert(fs.exists(fresh), "fresh tmp may belong to a live builder — keep it")
  }

  test("incremental IVF: fresh session loads sliced centroids + home store, bit-identical") {
    val before = AnnStore.buildCount.get()
    val r1 = Similarity.incrementalIvfTopK(spark, sf, nCells = 24, recallQueries = 0).collect()
    val afterBuild = AnnStore.buildCount.get()
    assert(afterBuild > before, "cold sliced IVF stores must build+publish")
    assert(r1.nonEmpty)

    Memo.clear(spark)
    val r2 = Similarity.incrementalIvfTopK(spark, sf, nCells = 24, recallQueries = 0).collect()
    assert(AnnStore.buildCount.get() == afterBuild,
      "fresh session must LOAD centroids and the assignment store, not rebuild")
    assert(r2.toSeq == r1.toSeq)
  }

  test("bloom sketch: fresh session loads the published bytes, verdicts identical") {
    // warm the store (may build, or load one published earlier this JVM —
    // the gate is the FRESH-session behavior, not who built it)
    val r1 = Incremental.bloomPrunedSemiJoin(spark, sf).collect()
    assert(r1.nonEmpty)
    val builds = AnnStore.buildCount.get()
    Memo.clear(spark) // the fresh-driver cache state
    val r2 = Incremental.bloomPrunedSemiJoin(spark, sf).collect()
    assert(AnnStore.buildCount.get() == builds,
      "fresh session must LOAD the sketch bytes, not re-aggregate orders")
    assert(r2.toSeq == r1.toSeq)
    // and the cached-sketch plan still equals the unpruned reference
    assert(r2.toSeq == Incremental.plainSemiJoin(spark, sf).collect().toSeq)
  }

  test("bm25 stats: fresh session loads the published aggregates, scores identical") {
    // non-default term set + slice so no other suite pre-warmed this key
    val terms = Seq("spark", "data")
    val before = AnnStore.buildCount.get()
    val r1 = Scoring.incrementalBm25(spark, sf, terms = terms, batchMod = 7).collect()
    val afterBuild = AnnStore.buildCount.get()
    assert(afterBuild > before, "first call on a cold stats store must build+publish")
    assert(r1.nonEmpty)

    Memo.clear(spark)
    val r2 = Scoring.incrementalBm25(spark, sf, terms = terms, batchMod = 7).collect()
    assert(AnnStore.buildCount.get() == afterBuild,
      "fresh session must LOAD the stats, not rescan the old corpus")
    assert(r2.toSeq == r1.toSeq)
    // merged-stat scoring still equals the batch form on the slice
    val full = Scoring.bm25Scores(spark, sf, terms = terms).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1.forall(r => full(r.getLong(0)) == r.getLong(1)))
  }

  test("store round-trip preserves the LSH index rows exactly") {
    // the frame annTopK consumes vs the raw parquet it was published from:
    // identical row multisets, embedding floats compared bit-for-bit
    val idx = Similarity.lshIndex(spark, sf, nTables = 6)
    val stored = spark.read.parquet(
      AnnStore.path(spark, Similarity.LshKind, sf, "6-6-2"))
    def key(r: org.apache.spark.sql.Row): (Long, Int, Int, Long, String, Long) = (
      r.getAs[Long]("vec_id"), r.getAs[Int]("table"), r.getAs[Int]("probe"),
      r.getAs[Long]("bucket"),
      r.getAs[scala.collection.Seq[Float]]("embedding")
        .map(java.lang.Float.floatToRawIntBits).mkString(","),
      java.lang.Double.doubleToRawLongBits(r.getAs[Double]("nrm")))
    assert(idx.collect().map(key).sorted.toSeq == stored.collect().map(key).sorted.toSeq)
  }
}
