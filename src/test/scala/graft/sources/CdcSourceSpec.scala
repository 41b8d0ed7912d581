package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.SparkSuite

class CdcSourceSpec extends SparkSuite {

  private val lines = Seq(
    """{"eventID":"d-1","eventName":"INSERT","dynamodb":{"SizeBytes":50,"Keys":{"pk":{"S":"USER#1"},"sk":{"S":"A"}},"NewImage":{"pk":{"S":"USER#1"},"v":{"N":"1"}}}}""",
    """{"eventID":"d-2","eventName":"MODIFY","dynamodb":{"SizeBytes":60,"Keys":{"pk":{"S":"USER#2"}},"NewImage":{"pk":{"S":"USER#2"},"v":{"N":"2"}},"OldImage":{"pk":{"S":"USER#2"},"v":{"N":"1"}}}}""",
    """{"eventID":"d-3","eventName":"REMOVE","dynamodb":{"SizeBytes":70,"Keys":{"pk":{"S":"ORG#9"}},"OldImage":{"pk":{"S":"ORG#9"}}}}""",
    "garbage not json",
    """{"eventID":"d-5","eventName":"INSERT","dynamodb":{"SizeBytes":0,"Keys":{"pk":{"N":"7"}},"NewImage":{"pk":{"N":"7"}}}}""")

  private def writeDir(): String = {
    val dir = Files.createTempDirectory("graft-dsv2").toString
    Files.write(Paths.get(s"$dir/a.json"), lines.take(3).mkString("\n").getBytes)
    Files.write(Paths.get(s"$dir/b.json"), lines.drop(3).mkString("\n").getBytes)
    dir
  }

  private def read(dir: String) =
    spark.read.format(classOf[CdcSource].getName).load(dir)

  test("short name 'graft-cdc' resolves via DataSourceRegister") {
    val df = spark.read.format("graft-cdc").load(writeDir())
    assert(df.count() == 4)
  }

  test("DSv2 source reads the record envelope; garbage drops (OP-3)") {
    val df = read(writeDir())
    val rows = df.orderBy("eventID").collect()
    assert(rows.map(_.getAs[String]("eventID")).toSeq == Seq("d-1", "d-2", "d-3", "d-5"))
    val r1 = rows.head
    assert(r1.getAs[String]("pk") == "USER#1" && r1.getAs[Long]("sizeBytes") == 50L)
    assert(r1.getAs[String]("newImageJson").contains(""""v":{"N":"1"}"""))
    // number-typed pk surfaces as its raw JSON text
    assert(rows.last.getAs[String]("pk") == "7")
  }

  test("pk equality and prefix filters push into the source scan") {
    val dir = writeDir()
    val eq = read(dir).filter(col("pk") === "USER#2")
    assert(eq.collect().map(_.getAs[String]("eventID")).toSeq == Seq("d-2"))
    val eqScan = eq.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(eqScan.contains("PushedFilters=[EqualTo(pk,USER#2)]"), eqScan.take(400))

    val pre = read(dir).filter(col("pk").startsWith("USER#"))
    assert(pre.collect().map(_.getAs[String]("eventID")).sorted.toSeq == Seq("d-1", "d-2"))
    val preScan = pre.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(preScan.contains("PushedFilters=[StringStartsWith(pk,USER#)]"), preScan.take(400))
  }

  test("byte-range splits: tiny splitSize reads every line exactly once") {
    val dir = Files.createTempDirectory("graft-dsv2-split").toString
    val many = (0 until 200).map { i =>
      s"""{"eventID":"s-$i","eventName":"INSERT","dynamodb":{"SizeBytes":10,"Keys":{"pk":{"S":"U#${i % 7}"}},"NewImage":{"pk":{"S":"U#${i % 7}"},"v":{"N":"$i"}}}}"""
    }
    Files.write(Paths.get(s"$dir/big.json"), many.mkString("\n").getBytes)
    // ~150-byte lines with a 256-byte splitSize → dozens of splits, every
    // boundary landing mid-line
    val df = spark.read.format(classOf[CdcSource].getName)
      .option("splitSize", "256").load(dir)
    assert(df.rdd.getNumPartitions > 10, s"expected many splits, got ${df.rdd.getNumPartitions}")
    val ids = df.select("eventID").collect().map(_.getString(0))
    assert(ids.length == 200 && ids.distinct.length == 200)
    // filters still exact across split boundaries
    assert(df.filter(col("pk") === "U#3").count() ==
      (0 until 200).count(_ % 7 == 3))
  }

  test("a line starting exactly at a split boundary is read exactly once") {
    // Every line is padded to exactly 128 bytes (127 chars + '\n'), so with
    // splitSize=128 every line after the first STARTS exactly at a boundary.
    // The old `pos < end` loop read such a line in neither split (previous
    // split stopped at pos == end; next split's first-line skip discarded it)
    // — this file lost all but line 0. Hadoop semantics: previous split owns
    // it (reads while pos <= end).
    val dir = Files.createTempDirectory("graft-dsv2-align").toString
    def line(i: Int): String = {
      val base =
        s"""{"eventID":"b-$i","eventName":"INSERT","dynamodb":{"SizeBytes":1,"Keys":{"pk":{"S":"P$i"}},"NewImage":{"pad":{"S":"PAD"}}}}"""
      base.replace("PAD", "x" * (127 - base.length + 3))
    }
    val many = (0 until 64).map(line)
    assert(many.forall(_.length == 127))
    Files.write(Paths.get(s"$dir/aligned.json"), many.mkString("\n").getBytes)
    val df = spark.read.format(classOf[CdcSource].getName)
      .option("splitSize", "128").load(dir)
    assert(df.rdd.getNumPartitions >= 63, s"got ${df.rdd.getNumPartitions} splits")
    val ids = df.select("eventID").collect().map(_.getString(0))
    assert(ids.length == 64, s"lost lines at split boundaries: ${ids.length}/64")
    assert(ids.distinct.length == 64, "duplicated lines across splits")
  }

  test("fatal errors propagate through the row parser; NonFatal drops the record") {
    assert(CdcSource.droppingNonFatal[Int] { throw new RuntimeException("bad row") }.isEmpty)
    intercept[OutOfMemoryError] {
      CdcSource.droppingNonFatal[Int] { throw new OutOfMemoryError("simulated fatal") }
    }
  }

  test("column pruning reaches the scan: projection reads only what it needs") {
    val dir = writeDir()
    val df = read(dir).select("eventID", "pk")
    val rows = df.orderBy("eventID").collect()
    assert(rows.length == 4 && rows.head.length == 2)
    val scan = df.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(scan.contains("ReadSchema=[eventID, pk]") ||
      scan.contains("ReadSchema=[pk, eventID]"), scan.take(400))
  }

  test("escaped pk value: pushed equality still finds the row (residual authority)") {
    val dir = Files.createTempDirectory("graft-dsv2-esc").toString
    val esc =
      """{"eventID":"e-1","eventName":"INSERT","dynamodb":{"SizeBytes":10,"Keys":{"pk":{"S":"A\"B"}},"NewImage":{"pk":{"S":"A\"B"}}}}"""
    Files.write(Paths.get(s"$dir/a.json"), esc.getBytes)
    // the needle A"B is not escape-free, so the substring shortcut is
    // disabled and the row must still be found via parse + exact filter
    val rows = read(dir).filter(col("pk") === "A\"B").collect()
    assert(rows.length == 1 && rows.head.getAs[String]("eventID") == "e-1")
  }

  test("missing pk under a pk filter drops; untagged pk drops like processLine") {
    val dir = Files.createTempDirectory("graft-dsv2-nopk").toString
    val noPk =
      """{"eventID":"n-1","eventName":"INSERT","dynamodb":{"SizeBytes":10,"Keys":{"sk":{"S":"USER#2"}},"NewImage":{"x":{"N":"1"}}}}"""
    val untagged =
      """{"eventID":"n-2","eventName":"INSERT","dynamodb":{"SizeBytes":10,"Keys":{"pk":"USER#2"},"NewImage":{"x":{"N":"1"}}}}"""
    Files.write(Paths.get(s"$dir/a.json"), Seq(noPk, untagged).mkString("\n").getBytes)
    // n-1's NewImage does not contain the needle, n-2's Keys are malformed
    // (untagged value) — neither may satisfy pk = 'USER#2'
    assert(read(dir).filter(col("pk") === "USER#2").collect().isEmpty)
    // unfiltered: the missing-pk record surfaces with pk NULL, the
    // malformed-Keys record drops entirely (processLine parity)
    val all = read(dir).collect()
    assert(all.map(_.getAs[String]("eventID")).toSeq == Seq("n-1"))
    assert(all.head.getAs[String]("pk") == null)
  }

  test("a poison byte in one file does not kill the scan (OP-3 at the source)") {
    val dir = Files.createTempDirectory("graft-dsv2-poison").toString
    val good =
      """{"eventID":"p-1","eventName":"INSERT","dynamodb":{"SizeBytes":10,"Keys":{"pk":{"S":"U"}},"NewImage":{"pk":{"S":"U"}}}}"""
    val bytes = ("garbageÿ".getBytes("ISO-8859-1") :+ 0xFF.toByte) ++
      ("\n" + good).getBytes("UTF-8")
    Files.write(Paths.get(s"$dir/a.json"), bytes)
    val rows = read(dir).collect()
    assert(rows.map(_.getAs[String]("eventID")).toSeq == Seq("p-1"))
  }

  private def explainOf(q: StreamingQuery): String = {
    val buf = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(buf)) { q.explain() }
    buf.toString
  }

  test("pkFilters option: patterns OR together; Catalyst conjuncts AND on top") {
    val dir = writeDir()
    // reference rule-array semantics: ["USER#1","ORG#*"] = eq OR prefix
    val either = spark.read.format(classOf[CdcSource].getName)
      .option("pkFilters", """["USER#1","ORG#*"]""").load(dir)
    assert(either.collect().map(_.getAs[String]("eventID")).sorted.toSeq == Seq("d-1", "d-3"))
    // a Catalyst-pushed conjunct narrows the pattern set, never widens it
    val both = spark.read.format(classOf[CdcSource].getName)
      .option("pkFilters", """["USER#1","ORG#*"]""").load(dir)
      .filter(col("pk").startsWith("USER#"))
    assert(both.collect().map(_.getAs[String]("eventID")).toSeq == Seq("d-1"))
  }

  test("micro-batch read: pk filter pushes into the streaming scan") {
    val dir = Files.createTempDirectory("graft-dsv2-mb").toString
    Files.write(Paths.get(s"$dir/a.json"), lines.take(3).mkString("\n").getBytes)
    val out = Files.createTempDirectory("graft-dsv2-mb-out").toString
    val ckpt = Files.createTempDirectory("graft-dsv2-mb-ckpt").toString
    // Catalyst doesn't push filters into streaming scans, so source-level
    // pruning arrives via the pkFilters OPTION; the .filter stays as the
    // exact residual, like the pipeline does.
    val q = spark.readStream.format(classOf[CdcSource].getName)
      .option("pkFilters", """["USER#*"]""").load(dir)
      .filter(col("pk").startsWith("USER#"))
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val ids = spark.read.parquet(out).select("eventID").collect().map(_.getString(0)).sorted
    assert(ids.toSeq == Seq("d-1", "d-2"))
    val plan = explainOf(q)
    assert(plan.contains("StringStartsWith(pk,USER#)"), plan.take(600))
  }

  test("micro-batch read: only files newer than the committed offset are processed") {
    val dir = Files.createTempDirectory("graft-dsv2-tail").toString
    Files.write(Paths.get(s"$dir/a.json"), lines.take(3).mkString("\n").getBytes)
    val out = Files.createTempDirectory("graft-dsv2-tail-out").toString
    val ckpt = Files.createTempDirectory("graft-dsv2-tail-ckpt").toString
    def runOnce(): Unit = {
      val q = spark.readStream.format(classOf[CdcSource].getName).load(dir)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    runOnce()
    assert(spark.read.parquet(out).count() == 3)
    // a new file arrives; the committed offset keeps a.json from reprocessing
    Files.write(Paths.get(s"$dir/b.json"), lines.drop(3).mkString("\n").getBytes)
    runOnce()
    val ids = spark.read.parquet(out).select("eventID").collect().map(_.getString(0)).sorted
    assert(ids.toSeq == Seq("d-1", "d-2", "d-3", "d-5"), ids.mkString(","))
    // nothing new → third run appends nothing (exactly-once over the offset log)
    runOnce()
    assert(spark.read.parquet(out).count() == 4)
  }

  test("maxFilesPerTrigger drains a backlog as bounded micro-batches") {
    val dir = Files.createTempDirectory("graft-dsv2-admission").toString
    // 3-file backlog; cap = 1 file per micro-batch
    Files.write(Paths.get(s"$dir/a.json"), lines.take(2).mkString("\n").getBytes)
    Files.write(Paths.get(s"$dir/b.json"), lines.slice(2, 3).mkString("\n").getBytes)
    Files.write(Paths.get(s"$dir/c.json"), lines.drop(4).mkString("\n").getBytes)
    val out = Files.createTempDirectory("graft-dsv2-admission-out").toString
    val ckpt = Files.createTempDirectory("graft-dsv2-admission-ckpt").toString
    val q = spark.readStream.format(classOf[CdcSource].getName)
      .option("maxFilesPerTrigger", "1").load(dir)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // every record arrived exactly once...
    val ids = spark.read.parquet(out).select("eventID").collect().map(_.getString(0)).sorted
    assert(ids.toSeq == Seq("d-1", "d-2", "d-3", "d-5"), ids.mkString(","))
    // ...across one micro-batch per file (offsets log batches 0,1,2)
    val batches = new java.io.File(s"$ckpt/offsets").listFiles()
      .map(_.getName).filterNot(_.startsWith(".")).sorted
    assert(batches.length == 3, s"expected 3 bounded batches, got ${batches.mkString(",")}")
  }

  test("CdcOffset roundtrips through its JSON encoding") {
    val o = CdcOffset(Map("/x/a b.json" -> 12L, "/x/b.json" -> 0L))
    assert(CdcOffset.fromJson(o.json()) == o)
    assert(CdcOffset.fromJson("") == CdcOffset(Map.empty))
  }

  test("source rows feed the CDC pipeline stages unchanged") {
    import spark.implicits._
    val df = read(writeDir()).filter(col("eventName") === "MODIFY")
    val recs = df.select(col("eventID"), col("eventName"), col("sizeBytes"),
      col("keysJson"), col("newImageJson"), col("oldImageJson"))
      .as[(String, String, Long, String, String, String)]
      .map { case (id, op, size, k, n, o) =>
        graft.cdc.CdcRecord(Some(id), Some(op),
          Some(graft.cdc.CdcStreamPart(Some(size), Option(k), Option(n), Option(o))))
      }
    val out = graft.cdc.CdcPipeline.events(recs,
      graft.cdc.CdcConfig(eventSource = "dsv2", blobDir = "/tmp/unused")).collect()
    assert(out.length == 1 && out.head.operation == "MODIFY")
    assert(out.head.attributesChanged == Seq("v"))
  }
}
