package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Loaders for the driver's read-only parquet tables (TESTDATA.md). */
object Tables {
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, d: String): DataFrame = apply(spark, d, "lineitem")
  def orders(spark: SparkSession, d: String): DataFrame = apply(spark, d, "orders")
  def customer(spark: SparkSession, d: String): DataFrame = apply(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame = apply(spark, d, "supplier")
  def nation(spark: SparkSession, d: String): DataFrame = apply(spark, d, "nation")
  def region(spark: SparkSession, d: String): DataFrame = apply(spark, d, "region")
  def part(spark: SparkSession, d: String): DataFrame = apply(spark, d, "part")
  /** `events.ts` is a parquet TIMESTAMP whose unit has CHANGED across
    * testdata generations (NANOS through round 13, MICROS from round 14) —
    * so the unit is read from the file footer, never assumed. The read
    * itself supplies an explicit schema with `ts: LONG`: the scan-time
    * updater hands over the RAW int64 whenever the requested Spark type is
    * LongType, regardless of the timestamp annotation, no conf needed
    * (verified empirically; a per-read `nanosAsLong` option is inert because
    * the scan's hadoopConf overwrites that key from the session conf). No
    * session conf is mutated, so concurrent readers are untouched (spec'd in
    * OpsSpec) — and skipping footer-sampling inference is the right posture
    * at scale anyway.
    * All time arithmetic on events uses epoch milliseconds via unit-aware
    * floor division `(ts - pmod(ts, T)) div T` with T = [[tsTicksPerMs]]
    * (see [[Sessions.msFloor]]), which agrees exactly with DuckDB's
    * `epoch_ms(ts)` — DuckDB decodes the annotation natively, so the oracle
    * SQL is unit-independent by construction.
    */
  private val eventsSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // raw int64 ticks; unit via tsTicksPerMs
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  def events(spark: SparkSession, d: String): DataFrame =
    spark.read
      .schema(eventsSchema)
      .parquet(s"$d/events.parquet")

  /** Ticks of `events.ts` per millisecond (NANOS → 1e6, MICROS → 1e3,
    * MILLIS → 1), read from the parquet FOOTER's logical-type annotation
    * and cached for the JVM per path under the LATEST child-file
    * fingerprint only (regenerations replace, never accumulate) — the SAME
    * identity [[AnnStore.corpusFingerprint]] computes — so a driver that
    * REGENERATES testdata mid-JVM with a different unit (the exact r14
    * precedent this accessor defends against) gets a fresh footer read,
    * never a stale divisor, even when a part file is rewritten in place
    * under its old name; the steady-state cost is one metadata listing
    * per call. Footer-only — no data pages are touched. A raw INT64
    * column (no timestamp annotation) falls back to the original nanos
    * contract.
    */
  def tsTicksPerMs(spark: SparkSession, d: String): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val root = new org.apache.hadoop.fs.Path(s"$d/events.parquet")
    val fs = root.getFileSystem(conf)
    // the cache key is the table's CHILD-file fingerprint
    // ([[AnnStore.corpusFingerprint]] — names, lengths, mtimes), not the
    // directory root's stat: a generator that rewrites a part file IN
    // PLACE under the same name (open+truncate — the one mutation a
    // directory mtime does not witness on a local FS) must still bust the
    // cache, because that is exactly the r14 NANOS→MICROS precedent this
    // accessor defends against. One listStatus per call — metadata only.
    val rootSt = fs.getFileStatus(root)
    val fp = AnnStore.corpusFingerprint(spark, d, "events")
    // keyed by ROOT path, holding only the LATEST (fingerprint, ticks) pair
    // per table — a long-lived driver that regenerates testdata many times
    // replaces its entry instead of accumulating one per generation, so the
    // cache is bounded by the number of distinct event tables ever read
    val cached = tsUnitCache.compute(root.toString, { (_, prev) =>
      if (prev != null && prev._1 == fp) prev
      else {
        import org.apache.parquet.schema.LogicalTypeAnnotation
        val file =
          if (rootSt.isDirectory)
            fs.listStatus(root).map(_.getPath)
              .filter(p => !p.getName.startsWith("_")).minBy(_.getName.toString)
          else root
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(file, conf))
        val ticks: Long =
          try {
            reader.getFooter.getFileMetaData.getSchema.getType(Seq("ts"): _*)
              .asPrimitiveType().getLogicalTypeAnnotation match {
              case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
                t.getUnit match {
                  case LogicalTypeAnnotation.TimeUnit.NANOS  => 1000000L
                  case LogicalTypeAnnotation.TimeUnit.MICROS => 1000L
                  case LogicalTypeAnnotation.TimeUnit.MILLIS => 1L
                }
              case _ => 1000000L
            }
          } finally reader.close()
        (fp, ticks)
      }
    })
    cached._2
  }
  private val tsUnitCache =
    new java.util.concurrent.ConcurrentHashMap[String, (String, Long)]()
  def documents(spark: SparkSession, d: String): DataFrame = apply(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = apply(spark, d, "embeddings")
}
