package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-group value-at-rank selection WITHOUT a whole-group sort task —
  * the two-pass distributed-selection core (TeraSort-style rank split)
  * shared by [[Analytics.revenuePercentiles]] and
  * [[TextOps.lengthPercentileFilter]]:
  *
  *  1. BOUNDARIES — uniform-width value cuts from one min/max pass, applied
  *     per row with the codegen'd O(1) `width_bucket` (a sketch could place
  *     smarter cuts, but per-row cut lookup must stay O(1) and codegen'd —
  *     a 63-literal-array HOF fold measured slower than the sort it
  *     replaced). The cuts only steer data DISTRIBUTION; exactness never
  *     depends on them (a skewed distribution just means uneven buckets).
  *     Equal values share a bucket, so a value's multiset is never split.
  *  2. HISTOGRAM — per (group, bucket) counts: a map-side-combined groupBy
  *     whose result is bounded by |groups|·nBuckets rows (a documented
  *     bounded collect, same contract as the BPE vocab), from which the
  *     driver locates, for each exact integer rank position, the ONE bucket
  *     holding it and the residual rank inside that bucket.
  *  3. SELECT — rank ONLY inside the candidate buckets (each ≈ n/nBuckets
  *     rows): the row_number window partitions by (group, bucket), so no
  *     task ever owns a whole group; matched rows pivot back to one column
  *     per requested percentile.
  *
  * Discrete value-at-rank semantics (value AT rank k in the multiset — tie
  * order irrelevant), bit-exact and DuckDB-reproducible. Skew caveat: a
  * single value with overwhelming multiplicity makes its bucket large
  * (selection degrades toward a big sort only for that bucket); raising
  * nBuckets narrows every other bucket regardless.
  */
object DistributedSelect {

  /** @param df     input frame; consumed by THREE actions — callers with an
    *               expensive lineage should pass a persisted frame.
    *               CONTRACT: `group` and `value` must be NON-NULL — a null
    *               group never matches the final equi-join (the group would
    *               silently vanish) and a null value breaks the bucket
    *               histogram; the histogram pass fails loudly on either.
    * @param group  string-typed grouping column name
    * @param value  BIGINT-typed value column name (a plain column, not an
    *               expression — it is spliced into `width_bucket`)
    * @param pcts   (outputName, num, den) per percentile: the exact rank is
    *               ceil(num·n/den) = (num·n + den − 1) div den
    * @return (group, n_rows, <one BIGINT column per pcts entry>), one row
    *         per group, unordered — callers add their ORDER BY
    */
  def exactGroupPercentiles(df: DataFrame, group: String, value: String,
      pcts: Seq[(String, Long, Long)], nBuckets: Int = 256): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val mm = df.agg(min(col(value)).as("lo"), max(col(value)).as("hi")).head()
    require(!mm.isNullAt(0), "exactGroupPercentiles: empty input")
    val (lo, hi) = (mm.getLong(0), mm.getLong(1))
    val bucketed =
      // degenerate: one distinct value — but keep null values null (not
      // bucket 0) so the loud-failure non-null contract below holds in
      // this branch too; width_bucket nulls them for free in the main one
      if (lo == hi) df.withColumn("bucket",
        when(col(value).isNull, lit(null)).otherwise(lit(0L)))
      else df.withColumn("bucket",
        expr(s"width_bucket($value, ${lo}D, ${hi + 1}D, $nBuckets)"))
    val hist = bucketed.groupBy(col(group), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .collect().map { r =>
        // loud failure per the non-null contract (a null group would
        // otherwise be dropped by the equi-join, a null value mis-bucketed)
        require(!r.isNullAt(0) && !r.isNullAt(1),
          s"exactGroupPercentiles: null $group or $value in input")
        (r.getString(0), r.getLong(1), r.getLong(2))
      }
    val targets = hist.groupBy(_._1).toSeq.flatMap { case (g, rows) =>
      val n = rows.map(_._3).sum
      val sorted = rows.sortBy(_._2)
      def locate(k: Long): (Long, Long) = {
        var cum = 0L
        var res: (Long, Long) = null
        val it = sorted.iterator
        while (res == null && it.hasNext) {
          val (_, b, c) = it.next()
          if (k <= cum + c) res = (b, k - cum) else cum += c
        }
        require(res != null, s"rank $k beyond histogram for group $g")
        res
      }
      pcts.map { case (name, num, den) =>
        val k = (num * n + den - 1) / den
        val (b, r) = locate(k)
        (g, b, r, name, n)
      }
    }
    val targetsDf = targets.toDF("t_g", "t_bucket", "resid", "pct", "n_rows")
    val w = Window.partitionBy(col(group), col("bucket")).orderBy(col(value))
    val aggs = max(col("n_rows")).as("n_rows") +: pcts.map { case (name, _, _) =>
      max(when(col("pct") === name, col(value))).as(name)
    }
    bucketed
      .join(broadcast(targetsDf.select(col("t_g"), col("t_bucket")).distinct()),
        col(group) === col("t_g") && col("bucket") === col("t_bucket"), "left_semi")
      .withColumn("rn", row_number().over(w).cast("long"))
      .join(broadcast(targetsDf),
        col(group) === col("t_g") && col("bucket") === col("t_bucket") &&
          col("rn") === col("resid"))
      .groupBy(col(group))
      .agg(aggs.head, aggs.tail: _*)
  }
}
