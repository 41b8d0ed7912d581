package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSuite
import graft.cdc.CdcConfig

class KafkaShapedSpec extends SparkSuite {

  private val insert =
    """{"eventID":"k-1","eventName":"INSERT","dynamodb":{"SizeBytes":100,"Keys":{"pk":{"S":"U#1"},"sk":{"S":"A"}},"NewImage":{"pk":{"S":"U#1"},"sk":{"S":"A"},"x":{"N":"1"}}}}"""

  /** (key, value, topic, partition, offset, timestamp) — the Kafka schema. */
  private def frame(values: Seq[String]) = {
    import spark.implicits._
    values.zipWithIndex.map { case (v, i) =>
      ("U#1".getBytes(StandardCharsets.UTF_8), v.getBytes(StandardCharsets.UTF_8),
        "cdc", 0, i.toLong, new java.sql.Timestamp(1000L + i))
    }.toDF("key", "value", "topic", "partition", "offset", "timestamp")
  }

  test("batch kafka-shaped frame flows through the fused CDC pipeline") {
    val cfg = CdcConfig(eventSource = "kafka-spec", blobDir = "/tmp/unused")
    val out = KafkaShaped.processed(frame(Seq(insert, "garbage", """{"eventID":""}""")), cfg)
      .collect()
    assert(out.length == 1) // garbage + invalid dropped, OP-3/OP-4
    assert(out.head.event.eventID == "k-1" && out.head.event.operation == "INSERT")
    assert(out.head.event.pk.contains("U#1"))
  }

  test("streaming kafka-shaped frame produces the same records") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Array[Byte], String, Int, Long)]
    val kafkaLike = mem.toDF().toDF("value", "topic", "partition", "offset")
      .withColumn("key", lit(null).cast("binary"))
      .withColumn("timestamp", current_timestamp())
    val recs = KafkaShaped.records(kafkaLike)
    val q = recs.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("kafka_out").start()
    mem.addData((insert.getBytes(StandardCharsets.UTF_8), "cdc", 0, 0L))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("kafka_out").collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[String]("eventID") == "k-1")
  }
}
