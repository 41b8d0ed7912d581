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

  test("optimizer rule fuses size(regexp_extract_all) into TextScan field reads") {
    import spark.implicits._
    // parquet-backed so ConvertToLocalRelation can't pre-evaluate
    val dir = java.nio.file.Files.createTempDirectory("graft-fuse-rule").toString
    Seq("the quick brown fox!", "a b c 42 'll", "ñ unicode, punct…")
      .toDF("text").write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir).createOrReplaceTempView("fuse_docs")
    val df = spark.sql(
      """SELECT size(regexp_extract_all(text, '[A-Za-z0-9]+', 0)) AS t,
        |       size(regexp_extract_all(text, '[^A-Za-z0-9\\s]', 0)) AS p,
        |       size(regexp_extract_all(text, '\\bthe\\b', 0)) AS keep_regex
        |FROM fuse_docs""".stripMargin)
    val opt = df.queryExecution.optimizedPlan.toString
    // ASCII-class patterns rewrite; the \b pattern must NOT (Java/RE2 differ)
    assert(opt.contains("textscan") || opt.contains("TextScan"), opt.take(600))
    assert(opt.contains("regexp_extract_all"), opt.take(600))
    // results identical to the un-fused evaluation
    val rows = df.orderBy("t").collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
    // "ñ unicode, punct…"=(2 tokens, ñ+comma+ellipsis, 0), "the quick brown
    // fox!"=(4,1,1), "a b c 42 'll"=(5,1,0)
    assert(rows.toSeq == Seq((2, 3, 0), (4, 1, 1), (5, 1, 0)), rows.mkString(","))
  }

  test("graft_text_scan callable from SQL; struct fields extract") {
    import spark.implicits._
    Seq("the quick 'll a the").toDF("text").createOrReplaceTempView("docs")
    val r = spark.sql(
      "SELECT graft_text_scan(text).n_tokens AS t, graft_text_scan(text).n_stop AS s FROM docs")
      .as[(Long, Long)].head()
    assert(r == ((5L, 3L)), r.toString)
  }

  test("graft_zvalue callable from SQL; matches the Scala API for 2 and 3 keys") {
    import spark.implicits._
    val df = Seq((3L, 5L, 7L), (100L, 200L, 300L), (0L, 0L, 0L)).toDF("u", "v", "w")
    df.createOrReplaceTempView("zv_in")
    val sql2 = spark.sql("SELECT graft_zvalue(u, v) FROM zv_in").as[Long].collect().toSeq
    val api2 = df.select(graft.ops.Layout.zValue(org.apache.spark.sql.functions.col("u"),
      org.apache.spark.sql.functions.col("v"))).as[Long].collect().toSeq
    assert(sql2 == api2)
    val sql3 = spark.sql("SELECT graft_zvalue(u, v, w) FROM zv_in").as[Long].collect().toSeq
    val api3 = df.select(graft.ops.Layout.zValueK(Seq("u", "v", "w").map(
      org.apache.spark.sql.functions.col))).as[Long].collect().toSeq
    assert(sql3 == api3)
    // SQL-side layout control composes: DISTRIBUTE BY the z key parses and runs
    val n = spark.sql(
      "SELECT u FROM zv_in DISTRIBUTE BY graft_zvalue(u, v, w) SORT BY graft_zvalue(u, v, w)")
      .count()
    assert(n == 3L)
  }
}
