package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Co-located joins via bucketed tables — the 100 TB answer to repeated
  * fact-fact joins on the same key (e.g. lineitem⋈orders on the order key):
  * both sides are written pre-hashed into the same bucket count, so every
  * subsequent join or aggregation on that key runs shuffle-free.
  *
  * Bucketing goes through the session catalog (`saveAsTable` — Spark's
  * bucketing metadata lives in the table definition, not the files).
  */
object Bucketing {

  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCol: String,
      nBuckets: Int,
      sortCol: Option[String] = None): Unit = {
    // drop stale metadata AND location: a leftover warehouse dir without
    // catalog metadata (e.g. from a previous JVM) fails CTAS otherwise.
    // Hadoop FileSystem, not java.io.File — the warehouse can be HDFS/object
    // storage on a real cluster, where a local-file delete silently no-ops.
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val warehouse = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table)
    val fs = warehouse.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(warehouse)) { fs.delete(warehouse, true); () }
    val w = df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(nBuckets, bucketCol)
    sortCol.fold(w)(c => w.sortBy(c)).saveAsTable(table)
  }

  /** Bucket lineitem + orders on the order key and join without a shuffle.
    * Returns the joined frame; OpsSpec asserts the plan has no Exchange on
    * the join path.
    */
  def bucketedOrderJoin(spark: SparkSession, d: String, nBuckets: Int = 8): DataFrame = {
    writeBucketed(Tables.lineitem(spark, d).select("l_orderkey", "l_extendedprice"),
      "graft_li_b", "l_orderkey", nBuckets)
    writeBucketed(Tables.orders(spark, d).select("o_orderkey", "o_custkey"),
      "graft_ord_b", "o_orderkey", nBuckets)
    spark.table("graft_li_b")
      .join(spark.table("graft_ord_b"),
        org.apache.spark.sql.functions.col("l_orderkey") ===
          org.apache.spark.sql.functions.col("o_orderkey"))
  }
}
