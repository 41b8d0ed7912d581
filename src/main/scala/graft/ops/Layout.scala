package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Data-layout control — the other half of predicate pushdown. A pushed
  * filter only pays off if the files' zone maps (parquet row-group min/max
  * statistics) can actually exclude data, and that requires the write side
  * to CLUSTER rows by the filter key. At 100 TB the difference between a
  * clustered and an arrival-ordered table is reading one file vs all of
  * them for the same query.
  */
object Layout {

  /** Range-cluster + sort on write: every output file owns a DISJOINT key
    * range (repartitionByRange), rows inside each file are sorted
    * (sortWithinPartitions), so each row group's min/max tightly bounds its
    * contents and a point/range scan skips everything else.
    *
    * Range partitioning, not hash: hash would spread every key range over
    * all files (zone maps each span the full domain → nothing prunes).
    */
  def writeClustered(df: DataFrame, keyCol: String, path: String, nFiles: Int): Unit =
    df.repartitionByRange(nFiles, col(keyCol))
      .sortWithinPartitions(keyCol)
      .write.mode("overwrite").parquet(path)

  /** Morton (Z-order) value of two 32-bit keys: bits interleave, so rows
    * close in EITHER dimension stay close in z-value order. Clustering files
    * by z-value gives every file a bounded min/max box on BOTH columns —
    * single-key range clustering prunes only its first key; z-order lets a
    * predicate on either dimension skip row groups. The spread is the
    * classic 5-step mask-shift (all codegen'd bit ops — no UDF).
    */
  def zValue(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    def spread(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      var x = c.cast("long").bitwiseAND(org.apache.spark.sql.functions.lit(0xFFFFFFFFL))
      def step(shiftBits: Int, mask: Long) = {
        x = x.bitwiseOR(org.apache.spark.sql.functions.shiftleft(x, shiftBits))
          .bitwiseAND(org.apache.spark.sql.functions.lit(mask))
      }
      step(16, 0x0000FFFF0000FFFFL)
      step(8, 0x00FF00FF00FF00FFL)
      step(4, 0x0F0F0F0F0F0F0F0FL)
      step(2, 0x3333333333333333L)
      step(1, 0x5555555555555555L)
      x
    }
    spread(a).bitwiseOR(org.apache.spark.sql.functions.shiftleft(spread(b), 1))
  }

  /** Z-order cluster + sort on write: like [[writeClustered]] but every
    * output file owns a compact 2-D BOX of (k1, k2) instead of a 1-D range
    * of k1 — zone maps then prune scans filtered on either key.
    */
  def writeZOrdered(df: DataFrame, k1: String, k2: String, path: String, nFiles: Int): Unit =
    df.withColumn("__z", zValue(col(k1), col(k2)))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  /** Per-file (min, max) statistics of `keyCol` straight from the parquet
    * footers — the zone maps the reader's row-group skipping consults.
    * Diagnostic/assertion surface for layout quality; throws when a file has
    * NO integer statistics for `keyCol` (typo'd/nested column, stats-free
    * writer) instead of returning plausible-looking sentinels.
    */
  def keyRanges(spark: SparkSession, path: String, keyCol: String): Seq[(String, Long, Long)] = {
    val conf = spark.sessionState.newHadoopConf()
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(conf)
    fs.listStatus(dir).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .sortBy(_.getPath.getName)
      .map { st =>
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(st.getPath, conf))
        try {
          val blocks = reader.getFooter.getBlocks
          var mn = Long.MaxValue
          var mx = Long.MinValue
          blocks.forEach { b =>
            b.getColumns.forEach { c =>
              if (c.getPath.toDotString == keyCol && c.getStatistics != null) {
                c.getStatistics.genericGetMin match {
                  case l: java.lang.Long => mn = math.min(mn, l)
                  case i: java.lang.Integer => mn = math.min(mn, i.longValue)
                  case _ => ()
                }
                c.getStatistics.genericGetMax match {
                  case l: java.lang.Long => mx = math.max(mx, l)
                  case i: java.lang.Integer => mx = math.max(mx, i.longValue)
                  case _ => ()
                }
              }
            }
          }
          require(mn != Long.MaxValue || mx != Long.MinValue,
            s"no integer statistics for column '$keyCol' in ${st.getPath.getName}")
          (st.getPath.getName, mn, mx)
        } finally reader.close()
      }
  }
}
