package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, lit, shiftleft}

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

  /** Morton (Z-order) SORT KEY of two keys in [0, 2^32): bits interleave,
    * so rows close in EITHER dimension stay close in z order. Clustering
    * files by z gives every file a bounded min/max box on BOTH columns —
    * single-key range clustering prunes only its first key; z-order lets a
    * predicate on either dimension skip row groups. The spread is the
    * classic 5-step mask-shift (all codegen'd bit ops — no UDF).
    *
    * The returned value is for ORDERING only: the raw interleave of two
    * full 32-bit keys occupies all 64 bits, so bit 63 (from k2's top bit)
    * would land in the SIGN and split the curve at the signed boundary —
    * the XOR with Long.MinValue restores unsigned order in the signed
    * domain. Keys outside [0, 2^32) alias after the low-32 mask.
    */
  /** The mask-shift ladders, shared with the SQL-function registration in
    * [[graft.GraftExtensions]] (which builds the same tree from catalyst
    * nodes) — one source of truth for the bit constants; the extensions
    * spec pins SQL == Scala API output.
    */
  private[graft] val Spread2Init = 0xFFFFFFFFL
  private[graft] val Spread2Steps: Seq[(Int, Long)] = Seq(
    16 -> 0x0000FFFF0000FFFFL, 8 -> 0x00FF00FF00FF00FFL, 4 -> 0x0F0F0F0F0F0F0F0FL,
    2 -> 0x3333333333333333L, 1 -> 0x5555555555555555L)
  private[graft] val Spread3Init = 0x1FFFFFL
  private[graft] val Spread3Steps: Seq[(Int, Long)] = Seq(
    32 -> 0x1F00000000FFFFL, 16 -> 0x1F0000FF0000FFL, 8 -> 0x100F00F00F00F00FL,
    4 -> 0x10C30C30C30C30C3L, 2 -> 0x1249249249249249L)

  def zValue(a: Column, b: Column): Column = {
    def spread(c: Column): Column =
      Spread2Steps.foldLeft(c.cast("long").bitwiseAND(lit(Spread2Init))) {
        case (x, (sh, mask)) => x.bitwiseOR(shiftleft(x, sh)).bitwiseAND(lit(mask))
      }
    spread(a).bitwiseOR(shiftleft(spread(b), 1)).bitwiseXOR(lit(Long.MinValue))
  }

  /** 3-D Morton spread: 21 low bits of `c`, each followed by two zero bits
    * (stride 3) — the classic mask-shift ladder for three-way interleave,
    * same all-codegen'd shape as the 2-D [[zValue]] spread.
    */
  private def spread3(c: Column): Column =
    Spread3Steps.foldLeft(c.cast("long").bitwiseAND(lit(Spread3Init))) {
      case (x, (sh, mask)) => x.bitwiseOR(shiftleft(x, sh)).bitwiseAND(lit(mask))
    }

  /** k-column Morton (Z-order) sort key, 64/k bits per key:
    * k=2 → [[zValue]] (32 bits each), k=3 → 21-bit three-way interleave,
    * k=4 → 16 bits each via two-level 2-D interleave (bit i of key j lands
    * at position 4i + permutation(j) — any fixed bit permutation preserves
    * the locality property, so the composed form is a true 4-D z curve).
    * Same unsigned-order XOR as [[zValue]]: k=3 tops out at bit 62 where
    * the flip is a harmless constant; for k=2/4 it keeps bit 63 out of the
    * sign. Keys alias outside [0, 2^(64/k)).
    *
    * Not k>4: 64/k ≤ 12 bits per key aliases real id domains too coarsely
    * to prune anything — at that width, range-cluster on the two hottest
    * keys instead.
    */
  def zValueK(keys: Seq[Column]): Column = keys.length match {
    case 2 => zValue(keys(0), keys(1))
    case 3 =>
      spread3(keys(0))
        .bitwiseOR(shiftleft(spread3(keys(1)), 1))
        .bitwiseOR(shiftleft(spread3(keys(2)), 2))
        .bitwiseXOR(lit(Long.MinValue))
    case 4 =>
      // interleave (a,c) and (b,d) 2-D-wise on 16-bit halves, then
      // interleave the two 32-bit results — stride composes to 4
      def half(c: Column): Column = c.cast("long").bitwiseAND(lit(0xFFFFL))
      zValue(
        zValue(half(keys(0)), half(keys(2))).bitwiseXOR(lit(Long.MinValue)),
        zValue(half(keys(1)), half(keys(3))).bitwiseXOR(lit(Long.MinValue)))
    case n => throw new IllegalArgumentException(
      s"zValueK supports 2-4 keys, got $n (beyond 4, 64/k-bit aliasing stops pruning)")
  }

  /** Z-order cluster + sort on write: like [[writeClustered]] but every
    * output file owns a compact k-D BOX of the keys instead of a 1-D range
    * of the first — zone maps then prune scans filtered on ANY of them.
    */
  def writeZOrdered(df: DataFrame, k1: String, k2: String, path: String, nFiles: Int): Unit =
    writeZOrderedK(df, Seq(k1, k2), path, nFiles)

  def writeZOrderedK(df: DataFrame, keys: Seq[String], path: String, nFiles: Int): Unit = {
    require(!df.columns.contains("__z"),
      "input already has a __z column — rename it before z-ordering")
    df.withColumn("__z", zValueK(keys.map(col)))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Target-size compaction for analytic tables — the counterpart of the
    * bus sink's `compactBus`, but layout-preserving: file count is sized
    * from the SOURCE's actual bytes (total / targetBytes, the Delta/Iceberg
    * OPTIMIZE recipe), and the rewrite re-clusters on `keyCol` so zone-map
    * pruning survives the compaction instead of being shuffled away.
    * Returns the file count written. At 100 TB this runs per partition of a
    * date-partitioned table, not over the whole table at once.
    */
  def compactTo(spark: SparkSession, inPath: String, keyCol: String,
      outPath: String, targetBytes: Long): Int = {
    require(targetBytes > 0, "targetBytes must be positive")
    val conf = spark.sessionState.newHadoopConf()
    val dir = new org.apache.hadoop.fs.Path(inPath)
    val fs = dir.getFileSystem(conf)
    // recursive: the input may be a partitioned table root (dt=.../part-*),
    // which spark.read.parquet reads but a flat listStatus would miss
    val it = fs.listFiles(dir, true)
    var totalBytes = 0L
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile && st.getPath.getName.endsWith(".parquet")) totalBytes += st.getLen
    }
    require(totalBytes > 0, s"no parquet data under $inPath")
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    writeClustered(spark.read.parquet(inPath), keyCol, outPath, nFiles)
    nFiles
  }

  /** Driver-visible z-order evidence (rows-only query `zorder_layout`):
    * writes events (user_id, day_idx, hour-of-day) 3-D z-ordered once per
    * session (Memo'd temp dir), then reads the parquet footers back and
    * emits each file's (min, max, span) box on ALL THREE dimensions. The
    * span columns are the self-checking invariant: a working z-order bounds
    * every file on every key, where 1-D clustering leaves the later spans
    * at the full domain (the OpsSpec pins the contrast; this exports it to
    * the driver artifact). Footer reading is driver-side but bounded by
    * nFiles.
    */
  def zOrderEvidence(spark: SparkSession, d: String, nFiles: Int = 8): DataFrame = {
    val dir = Memo(spark, s"zorder_dir3|$d|$nFiles") {
      // scratch layout, not a deliverable — removed on JVM exit
      val tmp = Scratch.dir("graft_zorder")
      val ev = Tables.events(spark, d)
        .withColumn("ms", Sessions.msFloor(spark, d))
        .select(col("user_id").as("u"), Sessions.dayIdx(spark, d).as("v"),
          // floor (not truncating) division at BOTH steps — the CLAUDE.md
          // negative-timestamp invariant; ms div 3600000 alone truncates
          // toward zero for pre-1970 rows
          expr("pmod((ms - pmod(ms, 3600000)) div 3600000, 24)").as("w"))
      writeZOrderedK(ev, Seq("u", "v", "w"), tmp.toString, nFiles)
      tmp.toString
    }
    val uRanges = keyRanges(spark, dir, "u")
    val vRanges = keyRanges(spark, dir, "v")
    val wRanges = keyRanges(spark, dir, "w")
    val rows = uRanges.zip(vRanges).zip(wRanges).zipWithIndex.map {
      case ((((_, umn, umx), (_, vmn, vmx)), (_, wmn, wmx)), i) =>
        (i.toLong, umn, umx, umx - umn, vmn, vmx, vmx - vmn, wmn, wmx, wmx - wmn)
    }
    import spark.implicits._
    rows.toDF("file_idx", "u_min", "u_max", "u_span", "v_min", "v_max", "v_span",
        "w_min", "w_max", "w_span")
      .orderBy("file_idx")
  }

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
