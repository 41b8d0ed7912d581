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
