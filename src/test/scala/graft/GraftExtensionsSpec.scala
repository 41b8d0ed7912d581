package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {
  // Extensions are applied at session construction, and getOrCreate would
  // silently reuse another suite's session — so detach the default session
  // (shared SparkContext is reused), build an extended one, and restore.
  lazy val spark: SparkSession = {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "2")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    prevDefault.foreach(SparkSession.setDefaultSession)
    prevActive.foreach(SparkSession.setActiveSession)
    s
  }

  test("graft_dot_product and graft_cosine_sim callable from SQL") {
    import spark.implicits._
    Seq((Seq(1.0f, 2.0f), Seq(3.0f, 4.0f))).toDF("a", "b").createOrReplaceTempView("vecs")
    val r = spark.sql(
      "SELECT graft_dot_product(a, b) AS d, graft_cosine_sim(a, a) AS c FROM vecs")
      .as[(Double, Double)].head()
    assert(r._1 == 11.0)
    assert(math.abs(r._2 - 1.0) < 1e-12)
    // wrong arity is rejected at analysis
    intercept[Exception](spark.sql("SELECT graft_dot_product(a) FROM vecs").collect())
  }

  test("graft_text_scan callable from SQL; struct fields extract") {
    import spark.implicits._
    Seq("the quick 'll a the").toDF("text").createOrReplaceTempView("docs")
    val r = spark.sql(
      "SELECT graft_text_scan(text).n_tokens AS t, graft_text_scan(text).n_stop AS s FROM docs")
      .as[(Long, Long)].head()
    assert(r == ((5L, 3L)), r.toString)
  }
}
