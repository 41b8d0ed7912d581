package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Range (interval) join: all right-side rows whose timestamp falls in a
  * bounded window after a left-side row, keyed by an equality column.
  *
  * Spark has no native range-join operator; the naive formulation
  * `l JOIN r ON l.key = r.key AND r.ts BETWEEN l.ts AND l.ts + W` executes
  * as an equi-join on `key` followed by a per-key filter — fine until one
  * key is hot, at which point a single task owns the full |l_k| × |r_k|
  * product. The scale-correct shape BINS time at the window width: the right
  * side lands in bucket floor(ts/W), the left side probes buckets {b, b+1}
  * (a window of width W starting anywhere overlaps exactly those two), so
  * the shuffle key is (key, bucket) and a hot key spreads over its time
  * range instead of one task. The exact `BETWEEN` predicate then prunes the
  * candidates. This is the standard bin-bucketing strategy for interval
  * joins (cf. the published range-join optimizations in engines like
  * Databricks Runtime; expressed here with plain exploded buckets).
  */
object RangeJoin {

  /** Pairs (l, r) with `l.key = r.key` and `r.ts` in `(l.ts, l.ts + windowMs]`.
    * Strict lower bound keeps a row from pairing with itself when l = r.
    * Column requirements: both frames carry `key` and `ts` (ms) plus an `id`.
    */
  def windowPairs(left: DataFrame, right: DataFrame, windowMs: Long): DataFrame = {
    val lb = left
      .withColumn("b0", floorDiv(col("ts"), windowMs))
      .withColumn("bucket", explode(array(col("b0"), col("b0") + 1)))
      .select(col("key"), col("bucket"), col("id").as("l_id"), col("ts").as("l_ts"))
    val rb = right
      .withColumn("bucket", floorDiv(col("ts"), windowMs))
      .select(col("key"), col("bucket"), col("id").as("r_id"), col("ts").as("r_ts"))
    lb.join(rb, Seq("key", "bucket"))
      .filter(col("r_ts") > col("l_ts") && col("r_ts") <= col("l_ts") + windowMs)
      .select(col("key"), col("l_id"), col("r_id"), col("l_ts"), col("r_ts"))
  }

  /** Floor division for possibly-negative epoch timestamps (pmod trick —
    * same floor the DuckDB `//` operator applies). The division runs in
    * DECIMAL, not `/` (double): epoch-nanos inputs exceed 2^53, where double
    * division silently rounds and would route rows to a neighboring bucket —
    * pairs lost to mis-bucketing are unrecoverable downstream. The numerator
    * is an exact multiple of `m`, so the decimal quotient is exact.
    */
  private def floorDiv(c: org.apache.spark.sql.Column, m: Long): org.apache.spark.sql.Column =
    ((c - pmod(c, lit(m))).cast(org.apache.spark.sql.types.DecimalType(38, 0)) / lit(m))
      .cast("long")

  /** Driver query: orders placed by the same customer within 7 days AFTER an
    * order — repeat-purchase mining over the orders table. Both sides are the
    * same frame; the binned equi-join never materializes a per-customer cross
    * product.
    */
  def repeatOrders(spark: SparkSession, d: String): DataFrame = {
    val weekMs = 7L * 86400000L
    val o = Tables.orders(spark, d).select(
      col("o_custkey").as("key"),
      col("o_orderkey").as("id"),
      (unix_timestamp(col("o_orderdate")) * 1000L).as("ts"))
    windowPairs(o, o, weekMs)
      .select(col("key").as("o_custkey"), col("l_id").as("first_order"),
        col("r_id").as("repeat_order"),
        ((col("r_ts") - col("l_ts")) / 1000L).cast("long").as("gap_s"))
      .orderBy("o_custkey", "first_order", "repeat_order")
  }
}
