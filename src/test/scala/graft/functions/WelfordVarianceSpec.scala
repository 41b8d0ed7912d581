package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

class WelfordVarianceSpec extends SparkSuite {

  test("matches var_samp per group across many partitions (mergeable state)") {
    import spark.implicits._
    spark.udf.register("graft_var", udaf(WelfordVariance))
    val rnd = new scala.util.Random(3)
    val df = (0 until 20000)
      .map(i => (s"g${i % 7}", rnd.nextDouble() * 1e6 + 1e9)) // large offset: cancellation trap
      .toDF("g", "x")
      .repartition(32) // force many partial buffers to merge
    val rows = df.groupBy("g")
      .agg(expr("graft_var(x)").as("ours"), var_samp(col("x")).as("builtin"))
      .collect()
    assert(rows.length == 7)
    rows.foreach { r =>
      val (ours, builtin) = (r.getDouble(1), r.getDouble(2))
      assert(math.abs(ours - builtin) / builtin < 1e-9, s"${r.getString(0)}: $ours vs $builtin")
    }
  }

  test("below 2 observations yields NaN, like var_samp's null semantics") {
    import spark.implicits._
    spark.udf.register("graft_var", udaf(WelfordVariance))
    val one = Seq(("a", 5.0)).toDF("g", "x")
      .groupBy("g").agg(expr("graft_var(x)")).collect().head.getDouble(1)
    assert(one.isNaN)
  }
}
