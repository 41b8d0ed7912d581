package graft.cdc

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** User-facing assembly — the engine analogue of the reference's deploy-time
  * construct layer (SURVEY.md §3.1: "synth" = building the lazy plan).
  *
  * Reference → engine mapping (`/root/reference/lib/constructs/dynamo.ts`,
  * `cdk-dynamodb-cdc-stack.ts`):
  *
  *  - `DynamoProps.eventSource`            → [[CdcSpec.eventSource]] (env `EVENT_SOURCE`, `dynamo.ts:90`)
  *  - `changeDataCapture.pkFilters`        → [[CdcSpec.pkFilters]] (compiled like `dynamo.ts:157-191`)
  *  - `changeDataCapture.functionPath`     → [[CdcSpec.transform]] — the whole
  *    per-record program is pluggable, like swapping the handler bundle
  *    (`dynamo.ts:119-128`); `None` = the stock [[RecordProcessor]] pipeline
  *  - `gsiIndexNames`                      → [[CdcApp.gsiView]] re-keyed views (`dynamo.ts:75-83`)
  *  - stack `cdcLogs: true` observer       → [[CdcSpec.observerDir]] — a
  *    rule-matched subscription (`source` + `detailType` equality) draining
  *    bus rows to a log directory (`cdk-dynamodb-cdc-stack.ts:25-39`)
  *  - S3 CDC bucket                        → `paths.blobDir`
  *  - EventBridge default bus              → `paths.busDir`
  */
final case class CdcSpec(
    eventSource: String,
    pkFilters: Seq[String] = Nil,
    gsiIndexNames: Seq[String] = Nil,
    sizeThreshold: Long = 64 * 1024,
    strictCompat: Boolean = false,
    observerDir: Option[String] = None,
    transform: Option[Dataset[CdcRecord] => Dataset[RecordProcessor.Processed]] = None)

final case class CdcPaths(inputDir: String, busDir: String, blobDir: String, checkpointDir: String)

class CdcApp(spark: SparkSession, spec: CdcSpec, paths: CdcPaths) {
  // Filter compilation happens at assembly time, like the construct compiling
  // FilterCriteria at synth — an invalid pattern fails here, not mid-stream.
  PkFilter.compile(spec.pkFilters)

  val config: CdcConfig = CdcConfig(
    sizeThreshold = spec.sizeThreshold,
    eventSource = spec.eventSource,
    blobDir = paths.blobDir,
    pkFilters = spec.pkFilters,
    strictCompat = spec.strictCompat)

  /** Start the CDC pipeline (and the observer, when configured). The main
    * query runs with `Trigger.AvailableNow` and is drained BEFORE the
    * observer starts, so one `start()` delivers bus rows to the observer log
    * in the same run; both hops are checkpointed and exactly-once.
    */
  def start(): Seq[StreamingQuery] = {
    import spark.implicits._
    val main: StreamingQuery = spec.transform match {
      case None =>
        CdcPipeline.stream(spark, paths.inputDir, paths.busDir, paths.checkpointDir, config).start()
      case Some(fn) =>
        // custom handler (functionPath analogue): user supplies records →
        // Processed, so custom outputs keep the stock claim-check sink.
        // Reads the same DSv2 source as the stock pipeline: the custom
        // handler inherits source-level pk pruning, the exact pk-text
        // residual, and byte-range splits (streamRecords does all three).
        val recs = CdcPipeline.streamRecords(spark, paths.inputDir, config)
        val blobDir = config.blobDir
        val cfg = config
        fn(recs)
          .mapPartitions { it =>
            it.map { p =>
              p.blob.foreach(b => CdcPipeline.writeBlob(blobDir, b))
              RecordProcessor.toBusEvent(p.event, cfg)
            }
          }
          .writeStream
          .outputMode("append")
          .option("checkpointLocation", paths.checkpointDir)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .format("parquet")
          .option("path", paths.busDir)
          .start()
    }
    main.awaitTermination() // drain before the observer snapshots busDir
    val observer = spec.observerDir.map { dir =>
      CdcPipeline.subscribe(
        spark.readStream.schema(busSchema).parquet(paths.busDir), spec.eventSource)
        .writeStream
        .outputMode("append")
        .option("checkpointLocation", s"$dir-ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .format("json") // CloudWatch-log analogue: line-JSON, human-greppable
        .option("path", dir)
        .start()
    }
    Seq(main) ++ observer
  }

  private def busSchema = org.apache.spark.sql.Encoders.product[BusEvent].schema

  /** GSI maintenance (OP-17): the alternate access path as a re-partitioned,
    * within-partition-sorted view on `${g}pk`/`${g}sk` — DynamoDB's
    * ProjectionType.ALL means all columns ride along.
    *
    * Range-partitioned on (pk, sk), not hash-partitioned on pk alone: GSI
    * partition keys are routinely low-cardinality (that is often why the GSI
    * exists), and `repartition(pk)` would collapse a 1000-executor cluster to
    * #distinct(pk) tasks. Range partitioning keeps every executor busy while
    * still co-locating each pk's sk-run contiguously (a pk spanning a
    * partition boundary stays globally sorted across the two).
    */
  def gsiView(items: DataFrame, gsiName: String): DataFrame = {
    require(spec.gsiIndexNames.contains(gsiName), s"undeclared GSI: $gsiName")
    items
      .repartitionByRange(col(s"${gsiName}pk"), col(s"${gsiName}sk"))
      .sortWithinPartitions(col(s"${gsiName}pk"), col(s"${gsiName}sk"))
  }

  /** All configured GSI views at once — the engine analogue of the
    * reference's `for (const gsi of gsiIndexNames)` loop (`dynamo.ts:75-83`):
    * every declared index name yields its own independently re-keyed view of
    * the same items. Views are lazy plans; materializing one does not pay for
    * the others.
    */
  def gsiViews(items: DataFrame): Map[String, DataFrame] =
    spec.gsiIndexNames.map(g => g -> gsiView(items, g)).toMap
}
