package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Persistent parquet store for ANN index artifacts (LSH bucket index, IVF
  * centroids), keyed by corpus directory + build parameters.
  *
  * [[Memo]] caches these per SESSION (applicationId-keyed), so every fresh
  * driver run used to pay a full index rebuild before its first ANN query.
  * At 100 TB an index you cannot persist is an index you don't have: the
  * build is ingest-time work (like the shingle index and the streaming-dedup
  * store in [[graft.streaming.StreamingDedup.readIndexStore]]), and query
  * sessions should LOAD it. This store is the batch-side counterpart of that
  * streaming index store.
  *
  * Layout: `<root>/<sanitized corpus dir>/<kind>-<params>/` — one parquet
  * dataset per (corpus, artifact kind, parameter point). The kind string
  * carries a format version (`lsh-v1`), so a code change that alters the
  * stored schema bumps the version and old stores are simply never read
  * again — no risk of silently loading stale-format data.
  *
  * Publish is ATOMIC: build → write to a `.build-<uuid>` sibling → rename
  * into place. Two sessions racing the same cold store both build, one
  * rename wins, the loser deletes its attempt and reads the winner's —
  * which is bit-identical anyway (every builder is deterministic).
  *
  * Bit-exactness across the round-trip: parquet stores FLOAT/DOUBLE as raw
  * IEEE-754 bits and integers exactly, so a loaded index is bit-identical
  * to a built one — AnnStoreSpec pins this row-for-row, which is what makes
  * a fresh session's top-k provably equal to the building session's.
  */
object AnnStore {

  /** Number of store BUILDS this JVM has performed (loads don't count).
    * Test observable: AnnStoreSpec asserts a Memo-cleared "fresh session"
    * serves its index without bumping this — i.e. it truly loaded.
    */
  private[graft] val buildCount = new java.util.concurrent.atomic.AtomicLong(0)

  /** Resolution order: `graft.ann.dir` system property (tests), then the
    * `SPARK_GRAFT_ANN_DIR` environment (deployments), then the JVM tmpdir.
    */
  def root: String =
    sys.props.get("graft.ann.dir")
      .orElse(sys.env.get("SPARK_GRAFT_ANN_DIR"))
      .getOrElse(new java.io.File(
        sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft_ann_store").getPath)

  private def sanitize(s: String): String = s.replaceAll("[^A-Za-z0-9._-]", "_")

  def path(kind: String, corpusDir: String, params: String): String =
    s"$root/${sanitize(corpusDir)}/$kind-$params"

  /** Load the artifact at `dir`, building and publishing it first if absent.
    * BOTH paths return a parquet read of the published store — the building
    * session and every later session serve the exact same physical bytes.
    */
  def loadOrBuild(spark: SparkSession, dir: String)(build: => DataFrame): DataFrame = {
    val target = new Path(dir)
    val fs = target.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(new Path(dir, "_SUCCESS"))) {
      buildCount.incrementAndGet()
      val tmp = new Path(dir + ".build-" + java.util.UUID.randomUUID().toString.take(8))
      build.write.mode("overwrite").parquet(tmp.toString)
      fs.mkdirs(target.getParent)
      // rename fails iff another session published first; theirs is
      // bit-identical (deterministic builders), so just discard ours
      if (!fs.rename(tmp, target)) { fs.delete(tmp, true); () }
    }
    spark.read.parquet(dir)
  }
}
