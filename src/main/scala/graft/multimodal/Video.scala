package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO
import javax.imageio.stream.{ImageInputStream, MemoryCacheImageOutputStream}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Memo, Tables}

/** REAL multi-frame "video" columns, JDK-only — the third modality next to
  * [[Images]] (PNG) and [[Audio]] (WAV): deterministic multi-page TIFF
  * containers are written with `ImageIO`'s sequence API (the TIFF
  * reader/writer ships in the JDK since 9; lossless for RGB, so pixels
  * round-trip exactly), stored as opaque BINARY, and decoded back
  * frame-by-frame. Frame counts, dimensions, and per-frame probe pixels are
  * pure integer functions of `doc_id`, so the DuckDB oracle recomputes the
  * EXPECTED values arithmetically while the Spark side can only produce
  * them by actually walking the TIFF directory structure and decoding the
  * strips — a hash match certifies real multi-frame decode, not plumbing.
  *
  * [[frameSample]] is the video-pipeline primitive this models: "decode
  * every Nth frame of every clip" is the standard pre-processing step
  * before vision-model feature extraction. Scale shape: narrow per-row
  * `mapPartitions`, one `ImageReader` per partition, frames stream out as
  * rows — no shuffle until the caller aggregates; at 100 TB this is a pure
  * scan that fans across input splits. Per-row failures land in the
  * [[DeadLetter]] lane (`decode_error` column), never abort the task.
  */
object Video {

  final case class VideoRecord(doc_id: Long, tif: Array[Byte])

  /** Contract shared by synthesis, the oracle SQL, and the specs. */
  def framesOf(id: Long): Int = 4 + (id % 6).toInt
  def widthOf(id: Long): Int = 12 + (id % 8).toInt
  def heightOf(id: Long): Int = 8 + (id % 4).toInt

  /** Deterministic per-frame RGB fill, recomputable in ANSI SQL:
    * `((id*2654435761 + f*97 + x*65537 + y*257) % 16777216)`.
    */
  def pixelOf(id: Long, f: Int, x: Int, y: Int): Int =
    ((id * 2654435761L + f.toLong * 97L + x.toLong * 65537L + y.toLong * 257L)
      % 16777216L).toInt

  def tiffBytes(id: Long): Array[Byte] = {
    val w = widthOf(id)
    val h = heightOf(id)
    val writer = ImageIO.getImageWritersByFormatName("tiff").next()
    val bos = new ByteArrayOutputStream()
    val ios = new MemoryCacheImageOutputStream(bos)
    writer.setOutput(ios)
    try {
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < framesOf(id)) {
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { img.setRGB(x, y, pixelOf(id, f, x, y)); x += 1 }
          y += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  /** The binary video table, session-memoized + persisted (same fixture
    * policy as [[Images.images]]).
    */
  def videos(spark: SparkSession, d: String): Dataset[VideoRecord] =
    Memo(spark, s"videos|$d") {
      import spark.implicits._
      Tables.documents(spark, d)
        .select(col("doc_id")).as[Long]
        .repartition(spark.sparkContext.defaultParallelism) // see Images.images
        .map(id => VideoRecord(id, tiffBytes(id)))
        .persist()
    }

  /** Open a TIFF reader over bytes; caller must dispose. */
  private def openReader(bytes: Array[Byte]): (javax.imageio.ImageReader, ImageInputStream) = {
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
    val readers = ImageIO.getImageReaders(iis)
    if (!readers.hasNext) {
      iis.close()
      throw new javax.imageio.IIOException("no registered ImageReader accepted the stream")
    }
    val r = readers.next()
    r.setInput(iis)
    (r, iis)
  }

  /** Container metadata through the real decoder: frame count (TIFF
    * directory walk), dimensions, and frame 0's top-left pixel. Nullable
    * meta + `decode_error` per the codec dead-letter contract.
    */
  def videoMetaDs(ds: Dataset[VideoRecord]): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
        ImageIO.setUseCache(false) // see Images.imageMetaDs
        it.map { r =>
          DeadLetter.attempt {
            val (rd, iis) = openReader(r.tif)
            try {
              val n = rd.getNumImages(true)
              if (n < 1) throw new javax.imageio.IIOException("zero frames")
              val img0 = rd.read(0)
              (n.toLong, img0.getWidth.toLong, img0.getHeight.toLong,
                (img0.getRGB(0, 0) & 0xffffff).toLong)
            } finally { rd.dispose(); iis.close() }
          } match {
            case Right((n, w, h, p)) =>
              (r.doc_id, Option(n), Option(w), Option(h), Option(p), Option.empty[String])
            case Left(err) =>
              (r.doc_id, Option.empty[Long], Option.empty[Long], Option.empty[Long],
                Option.empty[Long], Option(err))
          }
        }
      }
      .toDF("doc_id", "n_frames", "width", "height", "pixel00", "decode_error")
      .orderBy("doc_id")
  }

  def videoMeta(spark: SparkSession, d: String): DataFrame = videoMetaDs(videos(spark, d))

  /** Decode every `everyN`th frame of every clip (frame_idx 0, N, 2N, …)
    * and emit one row per sampled frame with its top-left probe pixel —
    * the distributed frame-sampling primitive. Failed containers emit ONE
    * dead-letter row (frame_idx -1) so every input is accounted for.
    */
  def frameSampleDs(ds: Dataset[VideoRecord], everyN: Int): DataFrame = {
    require(everyN >= 1, "everyN must be >= 1")
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
        ImageIO.setUseCache(false)
        it.flatMap { r =>
          DeadLetter.attempt {
            val (rd, iis) = openReader(r.tif)
            try {
              val n = rd.getNumImages(true)
              (0 until n by everyN).map { f =>
                val img = rd.read(f)
                (r.doc_id, f.toLong, (img.getRGB(0, 0) & 0xffffff).toLong)
              }.toVector
            } finally { rd.dispose(); iis.close() }
          } match {
            case Right(frames) =>
              frames.map { case (id, f, p) =>
                (id, f, Option(p), Option.empty[String])
              }
            case Left(err) =>
              Vector((r.doc_id, -1L, Option.empty[Long], Option(err)))
          }
        }
      }
      .toDF("doc_id", "frame_idx", "pixel00", "decode_error")
      .orderBy("doc_id", "frame_idx")
  }

  def frameSample(spark: SparkSession, d: String, everyN: Int = 2): DataFrame =
    frameSampleDs(videos(spark, d), everyN)
}
