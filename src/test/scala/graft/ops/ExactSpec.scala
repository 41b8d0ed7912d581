package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Property-style checks (fixed-seed generators, one vectorized Spark job
  * per law) for the two primitives every oracle row depends on: exact
  * scaled-integer money arithmetic and the narrow shingle hasher.
  */
class ExactSpec extends SparkSuite {

  test("c2 recovers exact cents from any 2-decimal double up to 1e13") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // cents in ±1e15 → values ±1e13 with exactly 2 decimals
    val cents = Seq.fill(2000)(rnd.nextLong() % 1000000000000000L) :+ 0L :+
      999999999999999L :+ -999999999999999L
    val df = cents.map(c => (c, c / 100.0)).toDF("cents", "v")
    val bad = df.select(col("cents"), Exact.c2(col("v")).as("got"))
      .filter(col("cents") =!= col("got"))
    assert(bad.isEmpty, s"mismatches: ${bad.take(5).mkString(",")}")
  }

  test("e4 recovers exact e4 units for rates in [0, 1)") {
    import spark.implicits._
    val units = (0 until 10000).map(_.toLong)
    val df = units.map(u => (u, u / 10000.0)).toDF("u", "v")
    val bad = df.select(col("u"), Exact.e4(col("v")).as("got"))
      .filter(col("u") =!= col("got"))
    assert(bad.isEmpty)
  }

  test("sumLong survives sums past Long.MaxValue intermediate scale") {
    import spark.implicits._
    // 3 values of 9e18 cents: a raw long sum would wrap; DECIMAL(38,0) holds
    val df = Seq.fill(3)(9000000000000000000L).toDF("v")
    val got = df.agg(sum(col("v").cast(org.apache.spark.sql.types.DecimalType(38, 0)))
      .cast("string")).head.getString(0)
    assert(got == "27000000000000000000")
  }

  test("shingleHashes matches the SQL expression path on randomized texts") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val words = Vector("the", "α", "data", "x1", "", "loop", "Σum", "9")
    def text(): String = {
      val n = rnd.nextInt(12)
      (0 until n).map(_ => words(rnd.nextInt(words.length)))
        .mkString(" " * (1 + rnd.nextInt(2))) + (if (rnd.nextBoolean()) "  " else "")
    }
    val docs = (0L until 300L).map(i => (i, text())).toDF("doc_id", "text")
    val sql = docs.select(col("doc_id"), split(trim(col("text")), " ").as("w"))
      .filter(size(col("w")) >= 5)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(w) - 5), i -> xxhash64(" +
          "concat_ws(' ', w[i], w[i + 1], w[i + 2], w[i + 3], w[i + 4])))")).as("shingle"))
      .distinct().as[(Long, Long)].collect().toSet
    val narrow = Dedup.shingles(docs).as[(Long, Long)].collect().toSet
    assert(narrow == sql)
  }
}
