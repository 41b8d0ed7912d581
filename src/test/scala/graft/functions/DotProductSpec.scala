package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

class DotProductSpec extends SparkSuite {
  import VectorFunctions._

  test("dot_product matches the SQL aggregate fold bit-for-bit") {
    import spark.implicits._
    val df = spark.read.parquet(s"$sf/embeddings.parquet").limit(100)
      .select(col("vec_id"), col("embedding").as("a"),
        reverse(col("embedding")).as("b"))
    val both = df.select(
      dot_product(col("a"), col("b")).as("native"),
      expr("aggregate(zip_with(a, b, (x, y) -> cast(x as double) * cast(y as double)), " +
        "cast(0 as double), (acc, v) -> acc + v)").as("fold"))
      .as[(Double, Double)].collect()
    assert(both.nonEmpty && both.forall { case (n, f) => n == f })
  }

  test("mixed float/double arrays and shorter-side truncation") {
    import spark.implicits._
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(2.0, 10.0))).toDF("a", "b")
    assert(df.select(dot_product(col("a"), col("b"))).as[Double].head() == 22.0)
  }

  test("interpreted eval agrees with codegen result") {
    import spark.implicits._
    val df = Seq((Seq(0.5f, -1.5f), Seq(4.0f, 2.0f))).toDF("a", "b")
    val viaCodegen = df.select(dot_product(col("a"), col("b"))).as[Double].head()
    assert(viaCodegen == 0.5 * 4.0 + -1.5 * 2.0)
    val ad = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array(0.5f, -1.5f))
    val bd = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array(4.0f, 2.0f))
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types._
    val e = DotProduct(
      Literal(ad, ArrayType(FloatType, false)),
      Literal(bd, ArrayType(FloatType, false)))
    assert(e.eval(null) == viaCodegen)
  }

  test("cosine_sim of a vector with itself is ~1") {
    import spark.implicits._
    val v = spark.read.parquet(s"$sf/embeddings.parquet").limit(5)
    val sims = v.select(cosine_sim(col("embedding"), col("embedding"))).as[Double].collect()
    assert(sims.forall(s => math.abs(s - 1.0) < 1e-9))
  }
}
