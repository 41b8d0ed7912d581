package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSuite

class ImageDedupSpec extends SparkSuite {
  import spark.implicits._

  test("aHash64 matches the id-derived pixel formula without decoding") {
    // recompute the hash from Images.pixelOf arithmetic alone (the oracle's
    // view) and require the decode path to agree — certifies the real
    // PNG round-trip feeding the fingerprint
    def expected(id: Long): Long = {
      val w = Images.widthOf(id); val h = Images.heightOf(id)
      val grays = (0 until 64).map { b =>
        val p = Images.pixelOf(id, ((b % 8) * w) / 8, ((b / 8) * h) / 8)
        ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
      }
      val total = grays.map(_.toLong).sum
      (0 until 64).foldLeft(0L) { (fp, b) =>
        if (grays(b).toLong * 64L > total) fp | (1L << b) else fp
      }
    }
    Seq(0L, 1L, 7L, 42L, 123L).foreach { id =>
      val img = Images.decodeImage(Images.pngBytes(id)).toOption.get
      assert(ImageDedup.aHash64(img) === expected(id), s"id=$id")
    }
  }

  test("banded pair mining is complete vs brute force at hamming <= 3") {
    val fps = ImageDedup.phashDs(ImageDedup.dedupImages(spark, sf))
      .filter(col("decode_error").isNull)
      .select(col("doc_id"), col("fp")).as[(Long, Long)].collect().toSeq
    val brute = (for {
      (a, fa) <- fps; (b, fb) <- fps if a < b
      ham = java.lang.Long.bitCount(fa ^ fb) if ham <= 3
    } yield (a, b, ham.toLong)).sortBy(p => (p._1, p._2))
    val banded = ImageDedup.imageDedupPairs(spark, sf)
      .as[(Long, Long, Long)].collect().toSeq
    assert(banded === brute)
    assert(brute.nonEmpty, "near-dup corpus must plant at least one pair")
  }

  test("imageDedupClusters equals union-find over the mined pairs") {
    val pairs = ImageDedup.imageDedupPairs(spark, sf)
      .select(col("a"), col("b")).as[(Long, Long)].collect().toSeq
    // independent reference: driver union-find with min-id roots
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x; while (parent.getOrElse(r, r) != r) r = parent(r); r
    }
    pairs.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    val want = parent.keys.map(n => (n, find(n))).toSeq.sorted
    val got = ImageDedup.imageDedupClusters(spark, sf)
      .as[(Long, Long)].collect().toSeq
    assert(got == want)
    // the composition is doing real work: clusters are transitive closures,
    // so every cluster label is <= all members and some cluster has >= 2 docs
    assert(want.nonEmpty && want.forall { case (n, c) => c <= n })
    assert(want.groupBy(_._2).exists(_._2.size >= 2))
  }

  test("incremental image dedup: slice discipline, probe completeness vs brute force") {
    val out = ImageDedup.incrementalImageDedup(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(0) % 10 == 0, s"doc_id must be new-batch: $r")
      val (m, h, dup) = (r.getLong(1), r.getLong(2), r.getLong(3))
      if (dup == 1L) assert(m % 10 != 0 && h <= 3, s"matched row laws: $r")
      else assert(m == -1L && h == 64L, s"unmatched row shape: $r")
    }
    // banded probe == brute-force best match (pigeonhole completeness)
    val fps = ImageDedup.corpusFps(spark, sf)
      .as[(Long, Long)].collect()
    val oldFps = fps.filter(_._1 % 10 != 0)
    // completeness holds only while no index band-bucket exceeds the
    // maxBucket cap (the oracle brute-forces uncapped): require 4x
    // headroom so a testdata change trips HERE, not as an oracle mismatch
    val worstBucket = oldFps
      .flatMap { case (_, fp) => (0 until 4).map(c => (c, (fp >>> (c * 16)) & 0xffffL)) }
      .groupBy(identity).values.map(_.size).max
    assert(worstBucket <= 4096 / 4,
      s"hot band-bucket $worstBucket nearing the probe cap — capped probe would diverge from the uncapped oracle")
    out.foreach { r =>
      val qfp = fps.find(_._1 == r.getLong(0)).get._2
      val best = oldFps
        .map { case (cid, cfp) => (java.lang.Long.bitCount(qfp ^ cfp).toLong, cid) }
        .filter(_._1 <= 3)
        .sorted.headOption
      best match {
        case Some((h, cid)) =>
          assert(r.getLong(1) == cid && r.getLong(2) == h, s"probe missed best: $r")
        case None =>
          assert(r.getLong(1) == -1L, s"phantom match: $r")
      }
    }
  }

  test("streaming image admission equals the batch operator across 2 triggers") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val idxFps = ImageDedup.corpusFps(spark, sf)
      .filter(col("id") % 10 =!= 0).cache()
    val newImgs = ImageDedup.dedupImages(spark, sf)
      .filter($"doc_id" % 10 === 0).collect()
    assert(newImgs.nonEmpty)

    val stream = MemoryStream[Images.ImageRecord]
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    val q = graft.streaming.StreamingImages.admissionStream(stream.toDS(), idxFps,
      (df, _) => buf.synchronized {
        buf ++= df.collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      }).start()
    val (b1, b2) = newImgs.splitAt(newImgs.length / 2)
    stream.addData(b1.toSeq); q.processAllAvailable()
    stream.addData(b2.toSeq); q.processAllAvailable()
    q.stop()

    val want = ImageDedup.incrementalImageDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(buf.toSet == want, s"stream ${buf.size} rows vs batch ${want.size}")
  }

  test("within-group variants pair up; corrupt blob takes the dead-letter lane") {
    // v=0 vs v=1 differ by one whitened sampled pixel: hamming is small by
    // construction (one forced bit + threshold drift), so group (0,1) of the
    // seed-0 images must appear among the mined pairs at some hamming <= 3
    val pairs = ImageDedup.imageDedupPairs(spark, sf)
      .as[(Long, Long, Long)].collect()
    assert(pairs.exists { case (a, b, _) => a / 4 == b / 4 },
      "expected at least one within-group perceptual pair")
    val corrupt = Seq(Images.ImageRecord(99L, Array[Byte](1, 2, 3))).toDS()
    val out = ImageDedup.phashDs(corrupt).collect().head
    assert(out.isNullAt(out.fieldIndex("fp")))
    assert(out.getString(out.fieldIndex("decode_error")) != null)
  }
}
