package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.multimodal.Multimodal._

class MultimodalSpec extends SparkSuite {

  private lazy val media = synthesize(spark, sf).cache()

  test("synthesized binary container round-trips through the decode stub") {
    import spark.implicits._
    val decoded = Multimodal.decode(media).collect()
    assert(decoded.length == 500)
    assert(decoded.forall(d => Set("image", "audio", "video")(d.kind)))
    // digest matches md5 of the original text bytes (payload fidelity)
    val expected = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), md5(to_binary(col("text"), lit("utf-8"))).as("h"))
      .as[(Long, String)].collect().toMap
    assert(decoded.forall(d => expected(d.media_id) == d.payload_digest))
  }

  test("malformed content fails the decode contract") {
    intercept[IllegalArgumentException](Codec.decodeStub(1L, Array[Byte](1, 2, 3)))
  }

  test("feature extraction: deterministic normalized 16-dim histogram") {
    val f1 = extractFeatures(media).collect().sortBy(_.media_id)
    val f2 = extractFeatures(media).collect().sortBy(_.media_id)
    assert(f1.length == 500 && f1.forall(_.feature.length == 16))
    assert(f1.zip(f2).forall { case (a, b) => a.feature.sameElements(b.feature) })
    assert(f1.forall(f => math.abs(f.feature.sum - 1.0f) < 1e-3 || f.feature.sum == 0f))
  }

  test("frame sampling keeps every Nth 256-byte frame") {
    import spark.implicits._
    val frames = sampleFrames(media, everyN = 2).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.frame_idx % 2 == 0))
    assert(frames.forall(_.frame_bytes.length <= 256))
  }

  test("resize re-encodes with new dimensions, decodable") {
    val resized = Multimodal.decode(resize(media, 32, 32)).collect()
    assert(resized.forall(d => d.width == 32 && d.height == 32))
  }

  test("decode is a narrow partition-preserving op (no shuffle)") {
    val df = Multimodal.decode(media).toDF()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"decode should not shuffle:\n${plan.take(400)}")
  }

  test("real WAV round-trip: synthesized bytes decode to the contract format and samples") {
    // driver-side codec law: the WAV we wrote re-reads format- and
    // sample-exact through the JDK RIFF decoder
    val id = 41L
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(Audio.wavBytes(id)))
    assert(ais.getFormat.getSampleRate.toInt == Audio.rateOf(id))
    assert(ais.getFormat.getChannels == Audio.channelsOf(id))
    assert(ais.getFrameLength == Audio.framesOf(id).toLong)
    // the distributed operator must reproduce the id-derived contract
    val rows = Audio.audioMeta(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val d = r.getLong(0)
      assert(r.getLong(1) == Audio.rateOf(d).toLong, s"rate mismatch at $d")
      assert(r.getLong(2) == Audio.channelsOf(d).toLong)
      assert(r.getLong(3) == Audio.framesOf(d).toLong)
      assert(r.getLong(4) == Audio.sampleOf(d, 0).toLong, s"sample0 mismatch at $d")
    }
  }

  test("image channel stats certify the full raster against the pixel formula") {
    val rows = Images.imageChannelStats(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.take(10).foreach { r =>
      val id = r.getLong(0)
      val (w, h) = (Images.widthOf(id), Images.heightOf(id))
      var sr = 0L; var sg = 0L; var sb = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val p = Images.pixelOf(id, x, y)
        sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
      }
      assert(r.getLong(1) == w.toLong * h && r.getLong(2) == sr &&
        r.getLong(3) == sg && r.getLong(4) == sb, s"raster mismatch at doc $id")
    }
  }

  test("audio sample stats certify the full PCM payload against the sample formula") {
    val rows = Audio.audioSampleStats(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.take(10).foreach { r =>
      val id = r.getLong(0)
      val n = Audio.framesOf(id) * Audio.channelsOf(id)
      val sum = (0 until n).map(i => Audio.sampleOf(id, i).toLong).sum
      assert(r.getLong(1) == n.toLong && r.getLong(2) == sum, s"payload mismatch at doc $id")
    }
  }

  test("real PNG resize: Java2D rescale re-encodes to the target dims, decodable") {
    val out = Images.resized(spark, sf, 24, 12).collect()
    assert(out.nonEmpty)
    out.take(20).foreach { r =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.png))
      assert(img != null && img.getWidth == 24 && img.getHeight == 12)
    }
  }

  test("codec dead-letter lane: corrupt blobs yield decode_error, good rows survive") {
    import spark.implicits._
    // one valid row, one truncated container, one pure-garbage blob — the
    // task must finish and attribute per-row failures (OP-3 semantics for
    // the codec lane; a `require` here used to abort the whole task)
    val imgDs = Seq(
      Images.ImageRecord(1L, Images.pngBytes(1L)),
      Images.ImageRecord(2L, Images.pngBytes(7L).take(20)), // cut before IDAT
      Images.ImageRecord(3L, Array[Byte](1, 2, 3, 4))       // not a PNG at all
    ).toDS()
    val im = Images.imageMetaDs(imgDs).collect().sortBy(_.getLong(0))
    assert(im.length == 3)
    assert(!im(0).isNullAt(1) && im(0).isNullAt(5))
    assert(im(0).getLong(1) == Images.widthOf(1L).toLong)
    assert(im(1).isNullAt(1) && !im(1).isNullAt(5))
    assert(im(2).isNullAt(1) && !im(2).isNullAt(5))
    val ist = Images.imageChannelStatsDs(imgDs).collect().sortBy(_.getLong(0))
    assert(!ist(0).isNullAt(1) && ist(1).isNullAt(1) && !ist(1).isNullAt(5))

    val audDs = Seq(
      Audio.AudioRecord(1L, Audio.wavBytes(1L)),
      Audio.AudioRecord(2L, Audio.wavBytes(5L).take(10)),   // truncated RIFF header
      Audio.AudioRecord(3L, "not audio".getBytes("UTF-8"))
    ).toDS()
    val am = Audio.audioMetaDs(audDs).collect().sortBy(_.getLong(0))
    assert(am.length == 3)
    assert(!am(0).isNullAt(1) && am(0).isNullAt(5))
    assert(am(0).getLong(1) == Audio.rateOf(1L).toLong)
    assert(am(1).isNullAt(1) && !am(1).isNullAt(5))
    assert(am(2).isNullAt(1) && !am(2).isNullAt(5))
    val ast = Audio.audioSampleStatsDs(audDs).collect().sortBy(_.getLong(0))
    assert(!ast(0).isNullAt(1) && ast(1).isNullAt(1) && !ast(1).isNullAt(3))
  }

  test("real multi-frame TIFF round-trip: frame counts, dims, and sampled pixels match the contract") {
    val meta = Video.videoMeta(spark, sf).collect()
    assert(meta.length == graft.ops.Tables.documents(spark, sf).count())
    meta.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) == Video.framesOf(id).toLong, s"frames mismatch at $id")
      assert(r.getLong(2) == Video.widthOf(id).toLong && r.getLong(3) == Video.heightOf(id).toLong)
      assert(r.getLong(4) == (Video.pixelOf(id, 0, 0, 0).toLong & 0xffffffL))
      assert(r.isNullAt(5))
    }
    // every 2nd frame sampled, pixel probe exact per frame
    val frames = Video.frameSample(spark, sf, everyN = 2).collect()
    val byDoc = frames.groupBy(_.getLong(0))
    byDoc.foreach { case (id, fs) =>
      val want = (0 until Video.framesOf(id) by 2).map(_.toLong)
      assert(fs.map(_.getLong(1)).sorted.toSeq == want, s"sampled frames wrong at $id")
      fs.foreach { f =>
        assert(f.getLong(2) == (Video.pixelOf(id, f.getLong(1).toInt, 0, 0).toLong & 0xffffffL))
      }
    }
  }

  test("video dead-letter lane: corrupt containers yield decode_error rows, good clips survive") {
    import spark.implicits._
    val ds = Seq(
      Video.VideoRecord(1L, Video.tiffBytes(1L)),
      Video.VideoRecord(2L, Video.tiffBytes(7L).take(16)), // truncated directory
      Video.VideoRecord(3L, Array[Byte](9, 9, 9, 9))       // not a TIFF
    ).toDS()
    val meta = Video.videoMetaDs(ds).collect().sortBy(_.getLong(0))
    assert(meta.length == 3)
    assert(!meta(0).isNullAt(1) && meta(0).isNullAt(5))
    assert(meta(1).isNullAt(1) && !meta(1).isNullAt(5))
    assert(meta(2).isNullAt(1) && !meta(2).isNullAt(5))
    val fs = Video.frameSampleDs(ds, 2).collect()
    val good = fs.filter(_.getLong(0) == 1L)
    assert(good.nonEmpty && good.forall(_.isNullAt(3)))
    // failed containers are accounted for with one frame_idx -1 row each
    Seq(2L, 3L).foreach { id =>
      val rows = fs.filter(_.getLong(0) == id)
      assert(rows.length == 1 && rows.head.getLong(1) == -1L && !rows.head.isNullAt(3))
    }
  }

  test("real PNG round-trip: synthesized bytes decode to the contract dims and pixels") {
    // driver-side codec law first: a PNG we wrote re-reads pixel-exact
    val id = 37L
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(Images.pngBytes(id)))
    assert(img.getWidth == Images.widthOf(id) && img.getHeight == Images.heightOf(id))
    assert((img.getRGB(2, 3) & 0xffffff) == Images.pixelOf(id, 2, 3))
    // the distributed operator decodes EVERY image and must reproduce the
    // id-derived contract — this is what the DuckDB oracle recomputes
    val rows = Images.imageMeta(spark, sf).collect()
    assert(rows.length == graft.ops.Tables.documents(spark, sf).count())
    rows.foreach { r =>
      val d = r.getLong(0)
      assert(r.getLong(1) == Images.widthOf(d) && r.getLong(2) == Images.heightOf(d))
      assert(r.getLong(4) == (Images.pixelOf(d, 0, 0).toLong & 0xffffffL))
    }
  }
}
