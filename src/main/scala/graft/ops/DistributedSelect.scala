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
      pcts: Seq[(String, Long, Long)], nBuckets: Int = 256): DataFrame =
    exactGroupPercentilesMulti(df, group, Seq(value -> pcts), nBuckets)

  /** [[exactGroupPercentiles]] over SEVERAL value columns of the same frame
    * in ONE driver round-trip pair AND one lazy select branch: one min/max
    * head for every metric, one stacked histogram collect
    * (|groups|·|metrics|·nBuckets rows — same bounded-collect contract),
    * then ONE candidate-bucket rank select over the stacked (metric, value,
    * bucket) triples — the window partitions by (group, metric, bucket),
    * disjoint across metrics, so ranks equal the per-metric form's. RFM's
    * three quintile splits (`Analytics.rfmSegments`) are the motivating
    * caller: 3 metrics × 2 eager actions collapsed to 2 actions total and
    * 3 select branches to 1, values bit-identical to three independent
    * calls (each metric's boundaries, histogram, and residual ranks are
    * computed exactly as the single-metric form does).
    *
    * `metrics` maps each BIGINT value column to its pct specs; output
    * percentile names must be globally unique across metrics. Output:
    * (group, n_rows, <pct columns in metrics order>).
    */
  def exactGroupPercentilesMulti(df: DataFrame, group: String,
      metrics: Seq[(String, Seq[(String, Long, Long)])],
      nBuckets: Int = 256): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(metrics.nonEmpty, "exactGroupPercentilesMulti: no metrics")
    val mmAggs = metrics.flatMap { case (v, _) =>
      Seq(min(col(v)).as(s"lo_$v"), max(col(v)).as(s"hi_$v")) }
    val mm = df.agg(mmAggs.head, mmAggs.tail: _*).head()
    // loud per-metric contract (ADVICE r19): an empty frame nulls EVERY
    // min/max, but an all-null SECOND metric column nulls only its own —
    // checking index 0 alone would surface that as an NPE at getLong below
    metrics.foreach { case (v, _) =>
      require(!mm.isNullAt(mm.fieldIndex(s"lo_$v")) &&
        !mm.isNullAt(mm.fieldIndex(s"hi_$v")),
        s"exactGroupPercentiles: empty or all-null input for metric $v")
    }
    val bucketed = metrics.foldLeft(df) { case (acc, (v, _)) =>
      val lo = mm.getLong(mm.fieldIndex(s"lo_$v"))
      val hi = mm.getLong(mm.fieldIndex(s"hi_$v"))
      // degenerate: one distinct value — but keep null values null (not
      // bucket 0) so the loud-failure non-null contract below holds in
      // this branch too; width_bucket nulls them for free in the main one
      if (lo == hi) acc.withColumn(s"bucket_$v",
        when(col(v).isNull, lit(null)).otherwise(lit(0L)))
      else acc.withColumn(s"bucket_$v",
        expr(s"width_bucket($v, ${lo}D, ${hi + 1}D, $nBuckets)"))
    }
    // ONE histogram action for all metrics: each row contributes one
    // (metric, bucket) pair per metric; the groupBy map-side-combines down
    // to |groups|·|metrics|·nBuckets rows before the collect
    val hist = bucketed
      .select(col(group), explode(array(metrics.map { case (v, _) =>
        struct(lit(v).as("m"), col(s"bucket_$v").as("b")) }: _*)).as("mb"))
      .groupBy(col(group), col("mb.m").as("m"), col("mb.b").as("b"))
      .agg(count(lit(1)).as("cnt"))
      .collect().map { r =>
        // loud failure per the non-null contract (a null group would
        // otherwise be dropped by the equi-join, a null value mis-bucketed)
        require(!r.isNullAt(0) && !r.isNullAt(2),
          s"exactGroupPercentiles: null $group or value in input")
        (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))
      }
    val targets = metrics.flatMap { case (v, pcts) =>
      val rowsOfMetric = hist.filter(_._2 == v).map { case (g, _, b, c) => (g, b, c) }
      rowsOfMetric.groupBy(_._1).toSeq.flatMap { case (g, rows) =>
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
          (g, v, b, r, name, n)
        }
      }
    }
    // ONE select branch for every metric (not one per metric — the 3-branch
    // form was stage-count-dominated at warm bench scale): stack each row's
    // (metric, value, bucket) triples, keep candidate (group, metric,
    // bucket) cells, rank inside them with a single window — partitions are
    // disjoint across metrics, so ranks equal the per-metric form's — and
    // pivot every percentile of every metric out of one agg
    val targetsDf = targets.toDF("t_g", "t_m", "t_bucket", "resid", "pct", "n_rows")
    val stacked = bucketed
      .select(col(group), explode(array(metrics.map { case (v, _) =>
        struct(lit(v).as("m"), col(v).as("v"), col(s"bucket_$v").as("bucket")) }: _*)).as("x"))
      .select(col(group), col("x.m").as("m"), col("x.v").as("v"),
        col("x.bucket").as("bucket"))
    val w = Window.partitionBy(col(group), col("m"), col("bucket")).orderBy(col("v"))
    val aggs = max(col("n_rows")).as("n_rows") +: metrics.flatMap { case (_, pcts) =>
      pcts.map { case (name, _, _) =>
        max(when(col("pct") === name, col("v"))).as(name)
      }
    }
    stacked
      .join(broadcast(targetsDf.select(col("t_g"), col("t_m"), col("t_bucket")).distinct()),
        col(group) === col("t_g") && col("m") === col("t_m") &&
          col("bucket") === col("t_bucket"), "left_semi")
      .withColumn("rn", row_number().over(w).cast("long"))
      .join(broadcast(targetsDf),
        col(group) === col("t_g") && col("m") === col("t_m") &&
          col("bucket") === col("t_bucket") && col("rn") === col("resid"))
      .groupBy(col(group))
      .agg(aggs.head, aggs.tail: _*)
  }
}
