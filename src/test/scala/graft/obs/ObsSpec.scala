package graft.obs

import graft.SparkSuite

class ObsSpec extends SparkSuite {

  test("ScopedMetrics attributes shuffle to its scope; narrow scopes show zero") {
    import spark.implicits._
    val df = (1 to 100000).toDF("x").withColumn("g", org.apache.spark.sql.functions.col("x") % 1000)
    val (n, snap) = ScopedMetrics.measure(spark) {
      df.groupBy("g").count().count()
    }
    assert(n == 1000L)
    assert(snap.tasks > 0)
    assert(snap.shuffleWriteBytes > 0, s"groupBy scope must show shuffle: $snap")
    assert(snap.executorCpuNs > 0)
    // a genuinely narrow job (no exchange) must attribute ZERO shuffle —
    // the discriminating half of the contract
    val (rows, narrow) = ScopedMetrics.measure(spark) {
      spark.range(1000).filter("id % 2 = 0").collect()
    }
    assert(rows.length == 500)
    assert(narrow.tasks > 0)
    assert(narrow.shuffleWriteBytes == 0, s"narrow scope leaked shuffle: $narrow")
  }
}
