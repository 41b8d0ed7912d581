package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Memo, Tables}

/** REAL image columns end-to-end (north star "multimodal columns"), JDK-only:
  * deterministic PNGs are synthesized with `BufferedImage` + `ImageIO`
  * (no external codec needed — PNG encode/decode ships in the JDK), stored
  * as opaque BINARY, and decoded back by [[imageMeta]] in the same
  * batch-shaped `mapPartitions` layout as [[Multimodal.decode]].
  *
  * The oracle story: every image's dimensions and top-left pixel are pure
  * integer functions of `doc_id`, so DuckDB can recompute the EXPECTED
  * values from arithmetic alone — while the Spark side can only produce
  * them by actually parsing the PNG container and inflating the IDAT
  * stream. A hash match therefore certifies a real decode round-trip, not
  * schema plumbing.
  *
  * Scale shape: synthesis and decode are narrow per-row maps (no shuffle);
  * a real corpus would read the BINARY column from parquet exactly like
  * this and fan decode across partitions, one codec instance per task.
  */
object Images {

  final case class ImageRecord(doc_id: Long, png: Array[Byte])

  /** Dimension / pixel contracts — shared by synthesis, the oracle SQL, and
    * the spec. Kept small (≤47x23) so sf0.1's 5000 PNGs encode in ~100ms.
    */
  def widthOf(id: Long): Int = 16 + (id % 32).toInt
  def heightOf(id: Long): Int = 8 + (id % 16).toInt

  /** Deterministic RGB fill: integer mix reduced mod 2^24 — the same
    * expression is recomputable in ANSI SQL (`(id*1103515245 + x*65537 +
    * y*257) % 16777216`), keeping the exported pixel oracle-checkable.
    */
  def pixelOf(id: Long, x: Int, y: Int): Int =
    (((id * 1103515245L) + x.toLong * 65537L + y.toLong * 257L) % 16777216L).toInt

  def pngBytes(id: Long): Array[Byte] = {
    val w = widthOf(id)
    val h = heightOf(id)
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, pixelOf(id, x, y)); x += 1 }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** The binary image table, session-memoized + persisted like any other
    * synthesized input (ingest-time cost, shared by decode + spec).
    */
  def images(spark: SparkSession, d: String): Dataset[ImageRecord] =
    Memo(spark, s"images|$d") {
      import spark.implicits._
      Tables.documents(spark, d)
        .select(col("doc_id")).as[Long]
        // spread the fixture across the session's cores: the documents scan
        // is a handful of input splits, and a cached dataset keeps its
        // partitioning — without this the downstream DECODE runs ~serial
        .repartition(spark.sparkContext.defaultParallelism)
        .map(id => ImageRecord(id, pngBytes(id)))
        .persist()
    }

  /** Safe per-row decode: Right(image) or Left(reason). ImageIO signals
    * failure BOTH ways — `null` when no registered reader claims the format,
    * an `IIOException` when a reader claims it but the stream is corrupt —
    * so both collapse into Left and feed the [[DeadLetter]] lane.
    */
  def decodeImage(bytes: Array[Byte]): Either[String, java.awt.image.BufferedImage] =
    DeadLetter.attempt(ImageIO.read(new ByteArrayInputStream(bytes))).flatMap {
      case null => Left("no registered ImageReader accepted the stream")
      case img  => Right(img)
    }

  /** Per-image channel statistics over EVERY decoded pixel: n_px and the
    * R/G/B channel sums as BIGINTs. Where [[imageMeta]] certifies the
    * container metadata plus one pixel, this certifies the ENTIRE raster:
    * the oracle recomputes the sums from the id-derived pixel formula, so a
    * hash match proves the full IDAT stream inflated correctly. Same
    * narrow batch-shaped decode lane, same dead-letter contract as
    * [[imageMetaDs]].
    */
  def imageChannelStatsDs(ds: Dataset[ImageRecord]): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
        ImageIO.setUseCache(false)
        it.map { r =>
          decodeImage(r.png) match {
            case Right(img) =>
              var sr = 0L; var sg = 0L; var sb = 0L
              var y = 0
              while (y < img.getHeight) {
                var x = 0
                while (x < img.getWidth) {
                  val p = img.getRGB(x, y)
                  sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
                  x += 1
                }
                y += 1
              }
              (r.doc_id, Option(img.getWidth.toLong * img.getHeight),
                Option(sr), Option(sg), Option(sb), Option.empty[String])
            case Left(err) =>
              (r.doc_id, Option.empty[Long], Option.empty[Long], Option.empty[Long],
                Option.empty[Long], Option(err))
          }
        }
      }
      .toDF("doc_id", "n_px", "sum_r", "sum_g", "sum_b", "decode_error")
      .orderBy("doc_id")
  }

  def imageChannelStats(spark: SparkSession, d: String): DataFrame =
    imageChannelStatsDs(images(spark, d))

  /** REAL resize: decode → Java2D scale → re-encode, all JDK. The
    * distributed form maps it over the binary column partition-by-partition
    * like [[imageMeta]] ([[Multimodal.resize]] remains the stub-container
    * variant exercising the same pipeline shape).
    */
  def resizePng(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val src = ImageIO.read(new ByteArrayInputStream(bytes))
    require(src != null, "undecodable PNG input to resize")
    val dst = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = dst.createGraphics()
    try {
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_NEAREST_NEIGHBOR)
      g.drawImage(src, 0, 0, w, h, null)
    } finally g.dispose()
    val bos = new ByteArrayOutputStream()
    ImageIO.write(dst, "png", bos)
    bos.toByteArray
  }

  def resized(spark: SparkSession, d: String, w: Int, h: Int): Dataset[ImageRecord] = {
    import spark.implicits._
    images(spark, d).mapPartitions(it => it.map(r => ImageRecord(r.doc_id, resizePng(r.png, w, h))))
  }

  /** Decode operator: PNG bytes → (width, height, format, top-left pixel).
    * Batch-shaped `mapPartitions`: the `ImageReader` lookup happens once
    * per partition (where a heavier codec/model handle would be opened),
    * rows stream through. Output columns are BIGINT for oracle parity; meta
    * columns are nullable and `decode_error` carries the [[DeadLetter]]
    * reason for undecodable blobs (NULL on success) — one corrupt row must
    * not abort the task.
    */
  def imageMetaDs(ds: Dataset[ImageRecord]): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
        // ImageIO's default per-read DISK-backed stream cache costs a temp
        // file per image; the flag is JVM(AppContext)-global, which is fine
        // ONLY because every caller wants false — never toggle it per-task
        ImageIO.setUseCache(false)
        it.map { r =>
          decodeImage(r.png) match {
            case Right(img) =>
              (r.doc_id, Option(img.getWidth.toLong), Option(img.getHeight.toLong),
                Option("png"), Option((img.getRGB(0, 0) & 0xffffff).toLong),
                Option.empty[String])
            case Left(err) =>
              (r.doc_id, Option.empty[Long], Option.empty[Long], Option.empty[String],
                Option.empty[Long], Option(err))
          }
        }
      }
      .toDF("doc_id", "width", "height", "format", "pixel00", "decode_error")
      .orderBy("doc_id")
  }

  def imageMeta(spark: SparkSession, d: String): DataFrame = imageMetaDs(images(spark, d))
}
