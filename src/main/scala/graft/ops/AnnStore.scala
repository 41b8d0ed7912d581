package graft.ops

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Persistent parquet store for ANN index artifacts (LSH bucket index, IVF
  * centroids), keyed by corpus directory + corpus fingerprint + build
  * parameters.
  *
  * [[Memo]] caches these per SESSION (applicationId-keyed), so every fresh
  * driver run used to pay a full index rebuild before its first ANN query.
  * At 100 TB an index you cannot persist is an index you don't have: the
  * build is ingest-time work (like the shingle index and the streaming-dedup
  * store in [[graft.streaming.StreamingDedup.readIndexStore]]), and query
  * sessions should LOAD it. This store is the batch-side counterpart of that
  * streaming index store.
  *
  * Layout: `<root>/<sanitized corpus dir>-<fingerprint>/<kind>-<params>/` —
  * one parquet dataset per (corpus identity, artifact kind, parameter
  * point). Three things key the identity, each closing a distinct staleness
  * hole:
  *
  *   - the KIND string carries a format version (`lsh-v1`) plus a
  *     generation token for any in-code constants the artifact bakes in
  *     (hyperplane seed/dim/RNG, k-means recipe) — a code change that
  *     alters either bumps the token and old stores are simply never read
  *     again;
  *   - the corpus FINGERPRINT ([[corpusFingerprint]]: file names, lengths,
  *     mtimes — metadata-only, no data pages read) changes whenever the
  *     corpus at the same path is regenerated, so a stale index can never
  *     be served against new data;
  *   - the PARAMS string pins the build-parameter point.
  *
  * Publish is ATOMIC: build → write to a `.build-<uuid>` sibling →
  * [[publish]] renames into place via `FileContext` (NOT
  * `FileSystem.rename`, which would move the tmp dir INSIDE an existing
  * target and corrupt the store — see [[publish]]). Two sessions racing the
  * same cold store both build, one rename wins, the loser deletes its
  * attempt and reads the winner's — which is bit-identical anyway (every
  * builder is deterministic). Orphaned tmp dirs from CRASHED builders are
  * swept by [[cleanOrphans]] on the next successful load.
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

  private[graft] def sanitize(s: String): String = s.replaceAll("[^A-Za-z0-9._-]", "_")

  /** Identity of the corpus DATA (not just its path): an FNV-1a fold over
    * the corpus parquet's file names, byte lengths, and modification times.
    * Metadata-only — one `listStatus`, no data pages — so it stays O(files)
    * at any corpus size, and it is recomputed on every call (the cost is a
    * stat; caching it would reopen the staleness hole it closes). A
    * re-ingested corpus at the same path gets a new fingerprint and
    * therefore a fresh store subtree; the old subtree is simply never read
    * again.
    */
  def corpusFingerprint(spark: SparkSession, corpusDir: String,
      corpusTable: String = "embeddings"): String = {
    val p = new Path(s"$corpusDir/$corpusTable.parquet")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val parts =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).sortBy(_.getPath.getName.toString).toSeq
      else Seq(fs.getFileStatus(p))
    val h = parts.foldLeft(0xcbf29ce484222325L) { (acc, st) =>
      val s = st.getPath.getName + "|" + st.getLen + "|" + st.getModificationTime
      s.foldLeft(acc)((a, c) => (a ^ c.toLong) * 0x100000001b3L)
    }
    java.lang.Long.toHexString(h)
  }

  /** Store path for one (corpus identity, artifact kind, parameter point).
    * `corpusTable` names the SOURCE TABLE the artifact derives from and is
    * part of the identity twice over: it drives [[corpusFingerprint]] (so a
    * regenerated source invalidates exactly the artifacts built from it)
    * and it is folded into the subtree name (so artifacts of two tables in
    * the same corpus dir never alias). Callers MUST pass the table their
    * build actually reads — the default matches the two embedding-derived
    * ANN artifacts; a documents- or orders-derived artifact that leaves the
    * default silently keys its staleness check to the wrong table.
    */
  def path(spark: SparkSession, kind: String, corpusDir: String, params: String,
      corpusTable: String = "embeddings"): String =
    s"$root/${sanitize(corpusDir)}-${sanitize(corpusTable)}-" +
      s"${corpusFingerprint(spark, corpusDir, corpusTable)}/$kind-$params"

  /** Load the artifact at `dir`, building and publishing it first if absent.
    * BOTH paths return a parquet read of the published store — the building
    * session and every later session serve the exact same physical bytes.
    */
  def loadOrBuild(spark: SparkSession, dir: String)(build: => DataFrame): DataFrame = {
    val target = new Path(dir)
    val conf = spark.sessionState.newHadoopConf()
    val fs = target.getFileSystem(conf)
    if (!fs.exists(new Path(dir, "_SUCCESS"))) {
      buildCount.incrementAndGet()
      val tmp = new Path(dir + ".build-" + java.util.UUID.randomUUID().toString.take(8))
      build.write.mode("overwrite").parquet(tmp.toString)
      fs.mkdirs(target.getParent)
      publish(fs, conf, tmp, target)
    }
    cleanOrphans(fs, target)
    spark.read.parquet(dir)
  }

  /** Atomic publish of `tmp` as `target`; returns true iff THIS caller won.
    *
    * `FileSystem.rename` is the WRONG primitive here: when the target
    * already exists as a directory it moves `tmp` INSIDE it (and returns
    * true), nesting a second parquet dataset under the published store —
    * every later read then sees duplicate rows or fails partition
    * inference. `FileContext.rename` without `Options.Rename.OVERWRITE`
    * instead refuses an existing destination, which is exactly the
    * publish-once semantics wanted: the loser of a cold-start race deletes
    * its attempt and reads the winner's bit-identical store.
    */
  private[graft] def publish(
      fs: FileSystem, conf: Configuration, tmp: Path, target: Path): Boolean = {
    if (fs.exists(target)) { fs.delete(tmp, true); return false }
    try {
      FileContext.getFileContext(target.toUri, conf).rename(tmp, target)
      true
    } catch {
      case e: java.io.IOException =>
        fs.delete(tmp, true)
        if (fs.exists(target)) false // lost the race after the pre-check
        else throw e                 // genuine rename failure
    }
  }

  /** Best-effort sweep of abandoned `<leaf>.build-*` siblings older than
    * [[OrphanTtlMs]] — crashed builders leak them and they would otherwise
    * accumulate in the store root forever. The age guard keeps a LIVE
    * concurrent builder's tmp safe: deleting it mid-write would turn that
    * builder's graceful lost-race into a job failure. Age is judged by the
    * NEWEST mtime anywhere INSIDE the tmp dir, not the dir's own mtime
    * (ADVICE r14): a live writer keeps creating files under the tree, so
    * its newest entry stays fresh for the whole build, however long a
    * large-corpus build runs — while the top-level dir's mtime only moves
    * when a direct child is added and can go stale mid-write.
    */
  private[graft] val OrphanTtlMs: Long = 60L * 60 * 1000
  private def cleanOrphans(fs: FileSystem, target: Path): Unit =
    try {
      val parent = target.getParent
      if (parent != null && fs.exists(parent)) {
        val pfx = target.getName + ".build-"
        val cutoff = System.currentTimeMillis() - OrphanTtlMs
        fs.listStatus(parent).foreach { st =>
          if (st.getPath.getName.startsWith(pfx) && newestMtime(fs, st) < cutoff)
            fs.delete(st.getPath, true)
        }
      }
    } catch { case scala.util.control.NonFatal(_) => () }

  /** Newest modification time of `st` or any file beneath it (recursive
    * listing — the sweep only reaches here for `.build-*` candidates, so
    * the walk is over one in-flight artifact, not the store).
    */
  private def newestMtime(fs: FileSystem, st: org.apache.hadoop.fs.FileStatus): Long = {
    var newest = st.getModificationTime
    try {
      val it = fs.listFiles(st.getPath, true)
      while (it.hasNext) {
        val t = it.next().getModificationTime
        if (t > newest) newest = t
      }
    } catch { case scala.util.control.NonFatal(_) => () }
    newest
  }
}
