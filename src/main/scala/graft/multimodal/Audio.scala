package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Memo, Tables}

/** REAL audio columns end-to-end, JDK-only (the audio sibling of
  * [[Images]]): deterministic 16-bit PCM WAV files are written with
  * `javax.sound.sampled` (RIFF/WAVE encode-decode ships in the JDK), stored
  * as opaque BINARY, and decoded back by [[audioMeta]] — sample rate,
  * channel count, frame count, and the first PCM sample all come from the
  * REAL decoder walking the RIFF chunks, while the oracle recomputes the
  * same values from doc_id arithmetic. A hash match certifies the decode
  * round-trip, exactly like `image_meta`.
  */
object Audio {

  final case class AudioRecord(doc_id: Long, wav: Array[Byte])

  /** Format contracts — shared by synthesis, the oracle SQL, and the spec. */
  private val Rates = Array(8000, 16000, 22050, 44100)
  def rateOf(id: Long): Int = Rates((id % 4).toInt)
  def channelsOf(id: Long): Int = 1 + (id % 2).toInt
  def framesOf(id: Long): Int = 400 + (id % 50).toInt * 16

  /** Deterministic PCM fill, recomputable in ANSI SQL for sample index i:
    * `((id*31 + i*7) % 65536) - 32768`.
    */
  def sampleOf(id: Long, i: Int): Int =
    (((id * 31L + i.toLong * 7L) % 65536L) - 32768L).toInt

  def wavBytes(id: Long): Array[Byte] = {
    val channels = channelsOf(id)
    val frames = framesOf(id)
    val n = frames * channels
    val data = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val v = sampleOf(id, i)
      data(2 * i) = (v & 0xff).toByte            // 16-bit PCM, little-endian
      data(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(rateOf(id).toFloat, 16, channels, true, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(data), fmt, frames.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** The binary audio table, session-memoized + persisted (ingest-time
    * fixture cost, shared by decode + spec — same policy as [[Images]]).
    */
  def audio(spark: SparkSession, d: String): Dataset[AudioRecord] =
    Memo(spark, s"audio|$d") {
      import spark.implicits._
      Tables.documents(spark, d)
        .select(col("doc_id")).as[Long]
        .repartition(spark.sparkContext.defaultParallelism) // see Images.images
        .map(id => AudioRecord(id, wavBytes(id)))
        .persist()
    }

  /** Per-partition RIFF reader resolution (see [[audioMeta]]'s comment on
    * AudioSystem's per-call provider scanning): returns an opener that
    * caches the first provider that accepts our WAVs.
    */
  private def partitionOpener(): Array[Byte] => AudioInputStream = {
    import scala.jdk.CollectionConverters._
    val readers = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader]).asScala.toVector
    var cached: javax.sound.sampled.spi.AudioFileReader = null
    (bytes: Array[Byte]) =>
      if (cached != null) cached.getAudioInputStream(new ByteArrayInputStream(bytes))
      else readers.iterator.flatMap { rd =>
        try {
          val s = rd.getAudioInputStream(new ByteArrayInputStream(bytes))
          cached = rd
          Iterator.single(s)
        } catch { case _: Exception => Iterator.empty }
      }.nextOption().getOrElse(AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes)))
  }

  /** Per-file PCM statistics over EVERY decoded sample: count and sum as
    * BIGINTs. Where [[audioMeta]] certifies the RIFF header plus one
    * sample, this reads the whole PCM payload through the decoder while
    * the oracle recomputes the sum from the id-derived sample formula — a
    * hash match proves every data byte decoded correctly.
    */
  def audioSampleStatsDs(ds: Dataset[AudioRecord]): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
        val open = partitionOpener()
        it.map { r =>
          DeadLetter.attempt {
            val ais = open(r.wav)
            try {
              val buf = new Array[Byte](4096)
              var n = 0L
              var sum = 0L
              var read = ais.read(buf)
              while (read > 0) {
                var i = 0
                // reads return whole frames, so `read` is always even
                while (i + 1 < read) {
                  sum += ((buf(i + 1) << 8) | (buf(i) & 0xff)).toLong
                  n += 1
                  i += 2
                }
                read = ais.read(buf)
              }
              (n, sum)
            } finally ais.close()
          } match {
            case Right((n, sum)) =>
              (r.doc_id, Option(n), Option(sum), Option.empty[String])
            case Left(err) =>
              (r.doc_id, Option.empty[Long], Option.empty[Long], Option(err))
          }
        }
      }
      .toDF("doc_id", "n_samples", "sample_sum", "decode_error")
      .orderBy("doc_id")
  }

  def audioSampleStats(spark: SparkSession, d: String): DataFrame =
    audioSampleStatsDs(audio(spark, d))

  /** Decode operator: WAV bytes → (rate, channels, frames, first sample).
    * Batch-shaped `mapPartitions`, narrow, no shuffle; BIGINT outputs for
    * oracle parity.
    */
  def audioMetaDs(ds: Dataset[AudioRecord]): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
        // per-partition codec handle, for real: AudioSystem.getAudioInputStream
        // re-scans every installed provider per CALL (the non-matching ones
        // signal by exception — measurable at one WAV per row); resolve the
        // RIFF reader once and reuse it for the whole partition
        val open = partitionOpener()
        it.map { r =>
          DeadLetter.attempt {
            val ais = open(r.wav)
            try {
              val f = ais.getFormat
              // AudioInputStream reads whole FRAMES (4 bytes when stereo) —
              // a 2-byte read returns nothing; take channel 0 of frame 0
              val first = new Array[Byte](f.getFrameSize)
              if (ais.read(first) != f.getFrameSize)
                throw new java.io.EOFException("empty PCM stream")
              val sample0 = ((first(1) << 8) | (first(0) & 0xff)).toLong
              (f.getSampleRate.toLong, f.getChannels.toLong, ais.getFrameLength, sample0)
            } finally ais.close()
          } match {
            case Right((rate, ch, frames, s0)) =>
              (r.doc_id, Option(rate), Option(ch), Option(frames), Option(s0),
                Option.empty[String])
            case Left(err) =>
              (r.doc_id, Option.empty[Long], Option.empty[Long], Option.empty[Long],
                Option.empty[Long], Option(err))
          }
        }
      }
      .toDF("doc_id", "sample_rate", "channels", "n_frames", "sample0", "decode_error")
      .orderBy("doc_id")
  }

  def audioMeta(spark: SparkSession, d: String): DataFrame = audioMetaDs(audio(spark, d))
}
