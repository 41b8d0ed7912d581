package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

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
