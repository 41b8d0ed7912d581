package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Memo}

/** Perceptual image dedup: average-hash (aHash) fingerprints over the
  * DECODED raster + banded Hamming pair mining via the shared
  * [[graft.ops.Dedup.hammingPairs64]] core (the same 4x16-bit pigeonhole
  * banding that backs SimHash text dedup).
  *
  * The hash is deliberately integer-exact and sampling-based so the whole
  * family is DuckDB-certifiable end-to-end (memory: oracle-decode-pattern):
  *   - 8x8 grid, nearest-neighbor sample at (gx*w/8, gy*h/8) — pure integer
  *     floor arithmetic on the id-derived dimensions;
  *   - gray = r+g+b per sampled pixel (no /3, monotonic-equivalent);
  *   - bit b set iff gray_b * 64 > sum(gray) — strict integer compare, no
  *     floating-point mean.
  * DuckDB recomputes every sampled pixel from the [[Images.pixelOf]] formula
  * and rebuilds the fingerprint with the identical comparisons, while Spark
  * can only produce it by actually inflating the PNG — a hash match
  * certifies a real decode + a correct banded pair plan (banding is
  * pigeonhole-COMPLETE for hamming <= 3, so the banded output must equal the
  * oracle's brute-force all-pairs join exactly).
  *
  * Near-dup corpus: groups of 4 docs share one base image (seed = doc_id/4,
  * dims from the seed); variant v = doc_id%4 whitens the sampled pixels of
  * grid cells 0..v-1 — visually-near-identical, byte-different images whose
  * pairwise Hamming distances are small within a group, the scenario
  * perceptual dedup exists for.
  *
  * Scale shape: fingerprinting is a narrow batch-shaped decode map (one
  * codec setup per partition, dead-letter lane for corrupt blobs); pair
  * mining never goes all-pairs — candidates come from per-bucket self-joins
  * with singleton pruning and hot-bucket caps inside hammingPairs64.
  */
object ImageDedup {

  /** 64-bit average hash of a decoded raster. Bit b (gy=b/8, gx=b%8) is set
    * iff the sampled gray at (gx*w/8, gy*h/8), scaled by 64, strictly
    * exceeds the sum of all 64 sampled grays.
    */
  def aHash64(img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth
    val h = img.getHeight
    val grays = new Array[Int](64)
    var total = 0L
    var b = 0
    while (b < 64) {
      val sx = ((b % 8) * w) / 8
      val sy = ((b / 8) * h) / 8
      val p = img.getRGB(sx, sy)
      val g = ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
      grays(b) = g
      total += g
      b += 1
    }
    var fp = 0L
    b = 0
    while (b < 64) {
      if (grays(b).toLong * 64L > total) fp |= (1L << b)
      b += 1
    }
    fp
  }

  /** Fingerprint lane: (doc_id, fp BIGINT nullable, decode_error). Same
    * batch-shaped decode + [[DeadLetter]] contract as [[Images.imageMetaDs]]
    * — one corrupt blob yields a NULL fp and a reason, never a task failure.
    */
  def phashDs(ds: Dataset[Images.ImageRecord]): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { r =>
          Images.decodeImage(r.png) match {
            case Right(img) => (r.doc_id, Option(aHash64(img)), Option.empty[String])
            case Left(err)  => (r.doc_id, Option.empty[Long], Option(err))
          }
        }
      }
      .toDF("doc_id", "fp", "decode_error")
  }

  /** Oracled query: the aHash of every corpus image, exported as two
    * non-negative 32-bit halves (fp_hi = bits 32..63, fp_lo = bits 0..31) so
    * the DuckDB side never has to build a 2^63 bit with signed BIGINT
    * arithmetic.
    */
  def imagePhash(spark: SparkSession, d: String): DataFrame =
    phashDs(Images.images(spark, d))
      .select(col("doc_id"),
        shiftrightunsigned(col("fp"), 32).as("fp_hi"),
        col("fp").bitwiseAND(lit(0xffffffffL)).as("fp_lo"),
        col("decode_error"))
      .orderBy("doc_id")

  /** Dedup-corpus pixel fill. [[Images.pixelOf]] is a LINEAR mix — smooth
    * gradients whose aHashes all converge on the same "lower-right
    * triangle" bit pattern, which made every image near-dup every other
    * (8k+ cross-group pairs on 500 docs, and a hot-bucket blow-up waiting
    * at scale). A quadratic mix (product of two mod-2^24-reduced linear
    * forms — each factor < 2^24, so the product stays < 2^48, overflow-safe
    * in signed-BIGINT DuckDB) decorrelates the sampled grays: base images
    * get distinct fingerprints and only the PLANTED within-group variants
    * pair up.
    */
  def dedupPixelOf(seed: Long, x: Int, y: Int): Int = {
    val f1 = ((seed * 1103515245L) + x.toLong * 65537L + y.toLong * 257L) % 16777216L
    val f2 = ((seed * 2654435761L) + x.toLong * 257L + y.toLong * 65537L) % 16777216L
    ((f1 * f2 + f1 + f2) % 16777216L).toInt
  }

  /** Whitened sampled pixels for near-dup variant v: grid cells 0..v-1
    * (all in grid row 0, distinct x because w >= 16).
    */
  def dedupPngBytes(id: Long): Array[Byte] = {
    val seed = id / 4
    val v = (id % 4).toInt
    val w = Images.widthOf(seed)
    val h = Images.heightOf(seed)
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, dedupPixelOf(seed, x, y)); x += 1 }
      y += 1
    }
    var b = 0
    while (b < v) { img.setRGB((b * w) / 8, 0, 0xffffff); b += 1 }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** The near-dup binary corpus, memoized+persisted like [[Images.images]]. */
  def dedupImages(spark: SparkSession, d: String): Dataset[Images.ImageRecord] =
    Memo(spark, s"dedupimages|$d") {
      import spark.implicits._
      graft.ops.Tables.documents(spark, d)
        .select(col("doc_id")).as[Long]
        .repartition(spark.sparkContext.defaultParallelism)
        .map(id => Images.ImageRecord(id, dedupPngBytes(id)))
        .persist()
    }

  /** Oracled query: perceptual near-dup pairs (a, b, hamming) with a < b and
    * hamming <= maxHamming over the near-dup corpus. Decodable blobs only —
    * a corrupt image can't pair (it has no fingerprint), it surfaces through
    * the [[phashDs]] dead-letter column instead.
    */
  def imageDedupPairs(
      spark: SparkSession,
      d: String,
      maxHamming: Int = 3,
      maxBucket: Int = 4096): DataFrame =
    minedPairs(spark, d, maxHamming, maxBucket).orderBy("a", "b")

  /** The mined pair set, session-memoized: [[imageDedupPairs]] and
    * [[imageDedupClusters]] are views over the same decode + banding work,
    * which should run once per session, not once per consumer. Unordered —
    * each consumer applies its own contract.
    */
  private def minedPairs(
      spark: SparkSession, d: String, maxHamming: Int, maxBucket: Int): DataFrame =
    Memo(spark, s"imagepairs|$d|$maxHamming|$maxBucket") {
      Dedup.hammingPairs64(corpusFps(spark, d), maxHamming, maxBucket).persist()
    }

  /** Oracled query: pair → CLUSTER composition for the image family —
    * connected components over the perceptual pair graph via the shared
    * [[Dedup.clusterPairs]] min-label machinery, exactly the path text
    * dedup takes (`dedup_clusters`). Pairs alone under-dedup transitive
    * variant chains: v0~v1 and v1~v2 can both hold while (v0, v2) drifts
    * past the hamming bound, and canonical selection must still keep ONE
    * representative for the whole chain. Output is (doc_id, cluster_id =
    * min doc_id of the component) for every image that appears in at least
    * one pair; the component label is the canonical survivor.
    */
  def imageDedupClusters(
      spark: SparkSession,
      d: String,
      maxHamming: Int = 3,
      maxBucket: Int = 4096): DataFrame =
    Dedup.clusterPairs(
      minedPairs(spark, d, maxHamming, maxBucket).select(col("a"), col("b")))

  /** Decodable fingerprints of the near-dup corpus, `(id, fp)`,
    * session-memoized — the shared input of the pair miner and the probe
    * family below.
    */
  private[graft] def corpusFps(spark: SparkSession, d: String): DataFrame =
    Memo(spark, s"imagefps|$d") {
      phashDs(dedupImages(spark, d))
        .filter(col("decode_error").isNull)
        .select(col("doc_id").as("id"), col("fp"))
        .persist()
    }

  /** Probe core shared by [[incrementalImageDedup]] (batch) and
    * [[graft.streaming.StreamingImages]] (per micro-batch): the best
    * perceptual match per probe image among the index images — banded
    * Hamming candidates ([[Dedup.hammingProbe64]], pigeonhole-complete at
    * the bound), then min-(hamming, cid) per probe id; unmatched decodable
    * probes export `match_id -1, hamming 64` so the verdict frame covers
    * the whole batch.
    */
  private[graft] def probeBest(newFps: DataFrame, idxFps: DataFrame,
      maxHamming: Int, maxBucket: Int): DataFrame = {
    val cand = Dedup.hammingProbe64(newFps, idxFps, maxHamming, maxBucket)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(asc("hamming"), asc("cid"))
    val best = cand.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("qid").as("id"), col("cid").as("match_id"), col("hamming"))
    newFps.select(col("id"))
      .join(best, Seq("id"), "left")
      .select(col("id").as("doc_id"),
        coalesce(col("match_id"), lit(-1L)).as("match_id"),
        coalesce(col("hamming"), lit(64L)).as("hamming"),
        (coalesce(col("match_id"), lit(-1L)) =!= -1L).cast("long").as("is_dup"))
  }

  /** Oracled query: perceptual admission under CDC — the image family's
    * incremental form, completing its ladder the way `incremental_ann` /
    * `incremental_ivf` did for vectors: a NEW batch of images (`doc_id %
    * batchMod == 0`) is fingerprinted and probed against the EXISTING
    * corpus's fingerprints (every other image) for its best perceptual
    * match within `maxHamming`. Banding keeps candidates per probe at
    * ~4 x bucket, never probe x corpus; DuckDB replays the whole thing —
    * fingerprints from the pixel formulas, brute-force best match —
    * hash-exact, certifying both the real decode and the banded probe's
    * pigeonhole completeness.
    */
  def incrementalImageDedup(spark: SparkSession, d: String,
      batchMod: Int = 10, maxHamming: Int = 3, maxBucket: Int = 4096): DataFrame = {
    val fps = corpusFps(spark, d)
    probeBest(
      fps.filter(pmod(col("id"), lit(batchMod)) === 0),
      fps.filter(pmod(col("id"), lit(batchMod)) =!= 0),
      maxHamming, maxBucket)
      .orderBy("doc_id")
  }
}
