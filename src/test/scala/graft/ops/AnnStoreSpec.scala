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

  test("store round-trip preserves the LSH index rows exactly") {
    // the frame annTopK consumes vs the raw parquet it was published from:
    // identical row multisets, embedding floats compared bit-for-bit
    val idx = Similarity.lshIndex(spark, sf, nTables = 6)
    val stored = spark.read.parquet(
      AnnStore.path("lsh-v1", sf, "6-6-2"))
    def key(r: org.apache.spark.sql.Row): (Long, Int, Int, Long, String, Long) = (
      r.getAs[Long]("vec_id"), r.getAs[Int]("table"), r.getAs[Int]("probe"),
      r.getAs[Long]("bucket"),
      r.getAs[scala.collection.Seq[Float]]("embedding")
        .map(java.lang.Float.floatToRawIntBits).mkString(","),
      java.lang.Double.doubleToRawLongBits(r.getAs[Double]("nrm")))
    assert(idx.collect().map(key).sorted.toSeq == stored.collect().map(key).sorted.toSeq)
  }
}
