package graft.multimodal

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (north star): image/audio/video content as
  * opaque BINARY columns with typed metadata, and decode / feature-extract /
  * resize / frame-sample operators running batch-shaped over partitions.
  *
  * The actual codec step is STUBBED — this container ships no image/audio
  * libraries — behind [[Codec.decodeStub]], a deterministic fake that parses
  * the GRFT header format below. Everything Spark-side is real and tested:
  * the schema, the binary encoding, the `mapPartitions` batch shape (one
  * decoder instance per partition, streaming iterator — exactly where a JNI
  * codec or model handle would be initialized per-task at scale), and the
  * partition-preserving narrow execution.
  *
  * Fake container format (deterministic, synthesized from `documents`):
  *   bytes 0-3   magic "GRFT"
  *   byte  4     kind: 0=image, 1=audio, 2=video
  *   bytes 5-8   width  (int32 BE)  / sampleRate for audio
  *   bytes 9-12  height (int32 BE)  / channels for audio
  *   bytes 13+   payload
  */
object Multimodal {

  final case class MediaMeta(kind: String, width: Int, height: Int)
  final case class MediaRecord(media_id: Long, content: Array[Byte], meta: MediaMeta)
  final case class DecodedMedia(
      media_id: Long, kind: String, width: Int, height: Int,
      n_payload_bytes: Long, payload_digest: String)
  final case class MediaFeatures(media_id: Long, kind: String, feature: Array[Float])
  final case class Frame(media_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  private val Magic = "GRFT".getBytes(StandardCharsets.US_ASCII)
  private val Kinds = Vector("image", "audio", "video")

  object Codec {
    def encode(kind: Int, width: Int, height: Int, payload: Array[Byte]): Array[Byte] = {
      val buf = java.nio.ByteBuffer.allocate(13 + payload.length)
      buf.put(Magic).put(kind.toByte).putInt(width).putInt(height).put(payload)
      buf.array()
    }

    /** STUB decoder — a real build would call into an image/audio codec here;
      * the contract (bytes in, typed struct out, throw on malformed) is what
      * the pipeline depends on.
      */
    def decodeStub(mediaId: Long, bytes: Array[Byte]): DecodedMedia = {
      require(bytes.length >= 13 && bytes.startsWith(Magic), s"bad magic for media $mediaId")
      val buf = java.nio.ByteBuffer.wrap(bytes)
      buf.position(4)
      val kind = Kinds(buf.get().toInt)
      val w = buf.getInt
      val h = buf.getInt
      val payload = java.util.Arrays.copyOfRange(bytes, 13, bytes.length)
      val digest = MessageDigest.getInstance("MD5").digest(payload)
        .map("%02x".format(_)).mkString
      DecodedMedia(mediaId, kind, w, h, payload.length.toLong, digest)
    }
  }

  /** Synthesize media records from `documents` text (deterministic fake
    * content; kind cycles by doc_id).
    */
  def synthesize(spark: SparkSession, d: String): Dataset[MediaRecord] = {
    import spark.implicits._
    graft.ops.Tables.documents(spark, d)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val kind = (id % 3).toInt
        val payload = text.getBytes(StandardCharsets.UTF_8)
        MediaRecord(id, Codec.encode(kind, 64 + (id % 8).toInt * 16, 48, payload),
          MediaMeta(Kinds(kind), 64 + (id % 8).toInt * 16, 48))
      }
  }

  /** Decode operator: batch-shaped `mapPartitions` — decoder state is
    * initialized once per partition (where a real codec/model handle would
    * live), rows stream through without materializing the partition.
    */
  def decode(media: Dataset[MediaRecord]): Dataset[DecodedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // per-partition init point (real impl: open codec / load model once)
      it.map(m => Codec.decodeStub(m.media_id, m.content))
    }
  }

  /** Feature extraction: 16-dim byte-histogram embedding of the payload
    * (stub for a model forward pass; deterministic).
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val d = Codec.decodeStub(m.media_id, m.content)
        val payload = java.util.Arrays.copyOfRange(m.content, 13, m.content.length)
        val hist = new Array[Float](16)
        payload.foreach(b => hist((b & 0xff) / 16) += 1f)
        val n = math.max(1, payload.length).toFloat
        MediaFeatures(m.media_id, d.kind, hist.map(_ / n))
      }
    }
  }

  /** Frame sampling: fixed 256-byte frames, every `everyN`-th kept — the
    * video path's row-explosion shape (one input row → many frame rows).
    */
  def sampleFrames(media: Dataset[MediaRecord], everyN: Int = 4): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { m =>
      val payload = java.util.Arrays.copyOfRange(m.content, 13, m.content.length)
      payload.grouped(256).zipWithIndex.collect {
        case (frame, idx) if idx % everyN == 0 => Frame(m.media_id, idx, frame)
      }
    }
  }

  /** Resize stub: re-encode with new dimensions, payload truncated/padded
    * proportionally (a real impl would rescale pixels; the plumbing —
    * binary-in/binary-out column op — is what's exercised).
    */
  def resize(media: Dataset[MediaRecord], w: Int, h: Int): Dataset[MediaRecord] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.map { m =>
      val d = Codec.decodeStub(m.media_id, m.content)
      val payload = java.util.Arrays.copyOfRange(m.content, 13, m.content.length)
      val scaled = math.max(1L,
        payload.length.toLong * w * h / math.max(1L, d.width.toLong * d.height)).toInt
      val out = java.util.Arrays.copyOf(payload, scaled)
      MediaRecord(m.media_id, Codec.encode(Kinds.indexOf(d.kind), w, h, out), MediaMeta(d.kind, w, h))
    }
  }

  /** Relational surface for the driver: decode + size/digest per media row. */
  def mediaStats(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    decode(synthesize(spark, d))
      .toDF()
      .orderBy("media_id")
  }
}
