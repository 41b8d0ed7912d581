package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Heavy hitters over the corpus token stream — the frequency-analysis pair
  * every training-data pipeline runs (boilerplate detection, stop-list
  * construction, vocabulary pruning):
  *
  *  - [[frequentTokens]] — EXACT: tokens with count·k > total. One
  *    map-side-combined groupBy; fully SQL-expressible, DuckDB-oracled.
  *  - [[frequentTokensApprox]] — Misra–Gries (Misra & Gries 1982; the
  *    "MG summary" of Agarwal et al., and the mergeable-summaries model of
  *    Agarwal/Cormode et al. PODS'12): each partition keeps at most
  *    `sketchK` counters in one narrow pass; summaries merge by SUMMING
  *    per-word estimates (a groupBy over ≤ sketchK·partitions rows), which
  *    preserves the MG deficit bound: per partition the undercount is ≤
  *    n_p/(sketchK+1), so globally exact − est ≤ n/(sketchK+1). That bound
  *    is the 100 TB contract: memory is O(sketchK) per task regardless of
  *    vocabulary size, where the exact form's shuffle grows with DISTINCT
  *    tokens. Candidates are reported with the bound folded in (est·k >
  *    n − k·n/(sketchK+1)), so every true heavy hitter is guaranteed
  *    present (no false negatives — the MG containment law; FrequentSpec
  *    pins it and the deficit bound per word). Rows-only gate (the sketch
  *    is engine-specific); exact counts ride along as evidence columns.
  */
object Frequent {

  /** Heavy-hitter threshold denominator (tokens above 1/DefaultK of all
    * positions). ONE constant, TWO readers: the Scala defaults below and
    * the `frequent_tokens` DuckDB oracle in SparkEntry interpolate it —
    * never hardcode 200 on one side only (r10 verdict: desync risk).
    */
  val DefaultK: Int = 200

  /** One row per token occurrence. The token class is the engine-wide
    * `[A-Za-z0-9]+` (same as `text_stats` n_tokens), applied with Spark's
    * codegen'd `regexp_extract_all` so the DuckDB side is the identical
    * expression.
    */
  private def words(spark: SparkSession, d: String): DataFrame =
    Tables.documents(spark, d)
      .select(explode(expr("regexp_extract_all(text, '[A-Za-z0-9]+', 0)")).as("w"))

  /** Exact per-token counts, session-memoized: the exact query, the approx
    * twin's evidence join, and the spec all read it.
    */
  private[ops] def tokenCounts(spark: SparkSession, d: String): DataFrame =
    Memo(spark, s"token_counts|$d") {
      words(spark, d).groupBy(col("w")).agg(count(lit(1)).as("cnt")).persist()
    }

  /** Exact heavy hitters: tokens occurring in more than 1/k of all token
    * positions. Total derives from the grouped counts (no second corpus
    * scan); the one-row total rides a broadcast cross join so the threshold
    * comparison stays in the plan (no driver scalar).
    */
  def frequentTokens(spark: SparkSession, d: String, k: Int = Frequent.DefaultK): DataFrame = {
    val counts = tokenCounts(spark, d)
    val tot = counts.agg(sum(col("cnt")).cast("long").as("n_total"))
    counts.crossJoin(broadcast(tot))
      .filter(col("cnt") * lit(k.toLong) > col("n_total"))
      .select(col("w"), col("cnt"), col("n_total"))
      .orderBy("w")
  }

  /** Per-partition Misra–Gries summaries, merged by summed estimates.
    * Output: every candidate whose estimate could still clear the 1/k bar
    * given the deficit bound, with exact-count evidence columns:
    * (w, est_cnt, exact_cnt, deficit, bound, n_total, is_exact_hh).
    */
  def frequentTokensApprox(spark: SparkSession, d: String, k: Int = Frequent.DefaultK,
      sketchK: Int = 1024): DataFrame =
    frequentApproxWords(words(spark, d), tokenCounts(spark, d), k, sketchK)

  /** The MG core over an arbitrary one-column words frame (exposed so the
    * spec can stress the decrement path with a synthetic vocabulary wider
    * than the sketch — the gate corpus's 31 distinct tokens never evict).
    */
  private[graft] def frequentApproxWords(wordsDf: DataFrame, exact: DataFrame,
      k: Int, sketchK: Int): DataFrame = {
    // the containment guarantee needs the summary at least as fine as the
    // heaviness threshold: a 1/k-heavy word can be fully evicted when
    // n/(sketchK+1) >= n/k
    require(sketchK + 1 >= k, s"sketchK=$sketchK too small for k=$k heavy hitters")
    val spark = wordsDf.sparkSession
    import spark.implicits._
    val summaries = wordsDf.select(col("w")).as[String].mapPartitions { it =>
      // BOXED values on purpose: with a primitive-Long type parameter,
      // `m.get(w)` on a miss unboxes null to 0 and `!= null` is always
      // true — the absent-key branch (and with it the whole MG eviction
      // discipline) silently never runs
      val m = new java.util.HashMap[String, java.lang.Long](sketchK * 2)
      it.foreach { w =>
        val cur = m.get(w)
        if (cur != null) m.put(w, java.lang.Long.valueOf(cur.longValue() + 1L))
        else if (m.size < sketchK) m.put(w, java.lang.Long.valueOf(1L))
        else {
          // the MG decrement round: every counter down one, zeros evicted —
          // this is where the ≤ n_p/(sketchK+1) deficit accrues
          val itr = m.entrySet().iterator()
          while (itr.hasNext) {
            val e = itr.next()
            if (e.getValue.longValue() == 1L) itr.remove()
            else e.setValue(java.lang.Long.valueOf(e.getValue.longValue() - 1L))
          }
        }
      }
      import scala.jdk.CollectionConverters._
      m.asScala.iterator.map { case (w, c) => (w, c.longValue()) }
    }.toDF("w", "est")
    val merged = summaries.groupBy(col("w")).agg(sum(col("est")).as("est_cnt"))
    val tot = exact.agg(sum(col("cnt")).cast("long").as("n_total"))
    merged.crossJoin(broadcast(tot))
      .withColumn("bound", expr(s"n_total div ${sketchK + 1}"))
      // containment rule: est ≥ exact − bound, so est·k > n − k·bound
      // catches every token with exact·k > n
      .filter(col("est_cnt") * lit(k.toLong) >
        col("n_total") - lit(k.toLong) * col("bound"))
      .join(exact.withColumnRenamed("cnt", "exact_cnt"), Seq("w"), "left")
      .select(col("w"), col("est_cnt"),
        coalesce(col("exact_cnt"), lit(0L)).as("exact_cnt"),
        (coalesce(col("exact_cnt"), lit(0L)) - col("est_cnt")).as("deficit"),
        col("bound"), col("n_total"),
        (coalesce(col("exact_cnt"), lit(0L)) * lit(k.toLong) > col("n_total"))
          .cast("long").as("is_exact_hh"))
      .orderBy("w")
  }
}
