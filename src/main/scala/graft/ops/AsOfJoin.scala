package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-match) join — an operator Spark lacks natively,
  * composed from built-ins per the preference order (SURVEY.md §4.3 (a)):
  * tag both sides, union, sort per key by (time, side), and carry the last
  * right-side id forward with a running `last(..., ignoreNulls)` window.
  *
  * Scale: ONE shuffle on the join key, work linear in |left| + |right| —
  * no range-condition pair explosion, no per-row subquery. This is the
  * pattern a time-series join at 100 TB wants: both sides co-partitioned by
  * key, a single merge pass within each partition.
  *
  * Tie semantics: a right row at exactly the left row's time matches
  * (`left.t >= right.t`), like DuckDB/kdb ASOF.
  */
object AsOfJoin {

  /** For each left row, the id of the right row with the greatest
    * `rightTime <= leftTime` for the same key (null if none).
    *
    * @param left   (key, time, leftId)
    * @param right  (key, time, rightId)
    */
  def asOf(
      left: DataFrame, right: DataFrame,
      key: String, time: String, leftId: String, rightId: String): DataFrame = {
    val l = left.select(col(key), col(time).as("t"), col(leftId).as("l_id"),
      lit(null).cast("long").as("r_id"), lit(0).as("is_r"))
    val r = right.select(col(key), col(time).as("t"), lit(null).cast("long").as("l_id"),
      col(rightId).as("r_id"), lit(1).as("is_r"))
    // at equal t the right row sorts first, so it is visible to the left row
    val w = Window.partitionBy(col(key)).orderBy(col("t").asc, col("is_r").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    l.unionByName(r)
      .withColumn("matched", last(col("r_id"), ignoreNulls = true).over(w))
      .filter(col("is_r") === 0)
      .select(col(key), col("l_id").as(leftId), col("matched").as(rightId))
  }

  /** Driver query: each purchase event joined to the user's most recent
    * prior (or simultaneous) signup event.
    */
  def purchaseToSignup(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(spark, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts"), col("event_id").as("signup_event_id"))
    asOf(purchases, signups, "user_id", "ts", "event_id", "signup_event_id")
      .orderBy("event_id")
  }
}
