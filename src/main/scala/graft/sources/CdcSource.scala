package graft.sources

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, ReadLimit, ReadMaxFiles, SupportsTriggerAvailableNow, Offset => StreamingOffset}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, StringStartsWith}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.attr.{AttrCodec, AttrVal}
import graft.cdc.RecordProcessor

/** DataSource V2 connector for stream-record JSON-line directories:
  * `spark.read.format("graft-cdc").load(dir)` — the engine's OP-1 source as
  * a first-class Spark table with pk filter pushdown (the DSv2 analogue of
  * DynamoDB's event-source-mapping filter running before the handler,
  * `/root/reference/lib/constructs/dynamo.ts:160-168`).
  *
  * Pushdown contract — designed so correctness NEVER rests on the source:
  * `pushFilters` returns every filter as residual, so Spark re-applies the
  * exact predicate above the scan regardless of what the source skipped
  * (filters a source accepts outright are trusted and never re-checked —
  * too sharp a knife for a line-skipping optimization). Inside the scan, pk
  * equality/prefix predicates drive two SAFE reductions: a pre-parse
  * substring skip, applied only when the needle contains no
  * JSON-escapable characters (so a matching line must contain it verbatim),
  * and an exact post-parse pk check (emitting a subset of matches is fine —
  * the residual filter above is the authority on what stays).
  *
  * Schema: the raw record envelope (parsed by the same
  * [[RecordProcessor.parseRecord]] the pipeline uses — one decoder, not
  * two), image subtrees as JSON strings. pk semantics match the fused
  * pipeline: S-typed pk surfaces raw, other tags as their JSON text, and a
  * record whose Keys fail to unmarshall drops (OP-3).
  */
class CdcSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-cdc"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = CdcSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new CdcTable(Option(properties.get("path"))
      .getOrElse(throw new IllegalArgumentException("graft-cdc requires a path")))
  override def supportsExternalMetadata(): Boolean = false
}

object CdcSource {
  val schema: StructType = StructType(Seq(
    StructField("eventID", StringType),
    StructField("eventName", StringType),
    StructField("sizeBytes", LongType),
    StructField("pk", StringType),
    StructField("keysJson", StringType),
    StructField("newImageJson", StringType),
    StructField("oldImageJson", StringType),
    // present-but-EMPTY `dynamodb` ({}) flattens to the same NULL columns as
    // an absent one, but the reference treats them differently (truthy {}
    // passes the validity guard, dynamo-stream-handler.ts:92-97) — the
    // marker keeps the envelope lossless so consumers can reconstruct
    StructField("hasDynamodb", BooleanType)))

  /** Per-record error isolation (OP-3) at the row-parse layer: NonFatal
    * parse failures drop the record; fatal errors (OOM, InterruptedException)
    * MUST propagate — swallowing them would mask task kills as silently
    * dropped rows.
    */
  private[sources] def droppingNonFatal[T](f: => Option[T]): Option[T] =
    try f catch { case scala.util.control.NonFatal(_) => None }

  /** pk text exactly as the fused pipeline computes it
    * (RecordProcessor.processLine semantics); throws on malformed Keys.
    */
  private[sources] def pkText(keysJson: String): Option[String] =
    AttrCodec.unmarshallItem(keysJson).get("pk").map {
      case AttrVal.SVal(s) => s
      case other => AttrVal.printJson(other)
    }
}

/** Hadoop Configuration is not serializable; standard write/readFields
  * wrapper so executors receive the session's spark.hadoop.* settings
  * (S3A credentials, defaultFS) instead of empty defaults.
  */
private[sources] class SerializableHadoopConf(
    @transient private var conf: org.apache.hadoop.conf.Configuration) extends Serializable {
  def value: org.apache.hadoop.conf.Configuration = conf
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    conf.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    conf = new org.apache.hadoop.conf.Configuration(false)
    conf.readFields(in)
  }
}

private[sources] class CdcTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"graft-cdc:$path"
  override def schema(): StructType = CdcSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new CdcScanBuilder(path, options.getLong("splitSize", 128L * 1024 * 1024),
      CdcTable.optionFilters(options),
      options.getInt("maxFilesPerTrigger", Int.MaxValue))
}

private[sources] object CdcTable {
  /** `pkFilters` read option — a JSON array of reference-style pk patterns
    * (`"a"` eq, `"a*"` prefix, more stars rejected, [[graft.cdc.PkFilter]]).
    * This is how STREAMING reads get source-level pk pruning: Catalyst's
    * filter pushdown does not run on streaming DSv2 relations, so the
    * predicate arrives as reader config instead — which mirrors the
    * reference, where the event-source-mapping filter is deploy-time config
    * (`dynamo.ts:157-191`), not a query optimization. Safe by the same
    * argument as pushed filters: the scan only PRUNES; the pipeline keeps the
    * exact predicate above the scan.
    */
  def optionFilters(options: CaseInsensitiveStringMap): Array[Filter] =
    Option(options.get("pkFilters")).map { s =>
      graft.attr.JsonParser.parse(s) match {
        case graft.attr.Json.JArr(items) =>
          items.map {
            case graft.attr.Json.JStr(pat) =>
              graft.cdc.PkFilter.compileOne(pat) match {
                case graft.cdc.PkFilter.Eq(v) => EqualTo("pk", v): Filter
                case graft.cdc.PkFilter.Prefix(p) => StringStartsWith("pk", p): Filter
              }
            case other =>
              throw new IllegalArgumentException(s"pkFilters entries must be strings: $other")
          }.toArray
        case other => throw new IllegalArgumentException(s"pkFilters must be a JSON array: $other")
      }
    }.getOrElse(Array.empty)
}

/** Two filter channels with DIFFERENT combination semantics, kept separate
  * end-to-end so the scan never over-prunes:
  *  - `conj`: filters Catalyst pushed via `pushFilters` — conjuncts of one
  *    predicate, a row must satisfy ALL of them;
  *  - `disj`: reference-style patterns from the `pkFilters` option — OR'd
  *    rules (`dynamo.ts:175-185`), a row must satisfy ANY of them.
  */
private[sources] class CdcScanBuilder(path: String, splitSize: Long,
    disj: Array[Filter] = Array.empty, maxFilesPerTrigger: Int = Int.MaxValue)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var conj: Array[Filter] = Array.empty
  private var required: StructType = CdcSource.schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    conj = filters.filter {
      case EqualTo("pk", _: String) => true
      case StringStartsWith("pk", _) => true
      case _ => false
    }
    filters // ALL residual: Spark re-applies exactly; the scan only prunes
  }
  override def pushedFilters(): Array[Filter] = (conj ++ disj).distinct
  // column pruning: a projection of (eventID, pk) ships 2 small strings per
  // row instead of the whole envelope with its image JSON bodies
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan =
    new CdcScan(path, conj, disj, required, splitSize, maxFilesPerTrigger)
}

private[sources] class CdcScan(path: String, conj: Array[Filter], disj: Array[Filter],
    required: StructType, splitSize: Long,
    maxFilesPerTrigger: Int = Int.MaxValue) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-cdc path=$path PushedFilters=[${(conj ++ disj).distinct.mkString(", ")}] " +
      s"ReadSchema=[${required.fieldNames.mkString(", ")}]"

  private val hadoopConf = new SerializableHadoopConf(
    SparkSession.active.sessionState.newHadoopConf())

  override def planInputPartitions(): Array[InputPartition] =
    CdcScan.splitFiles(CdcScan.listFiles(path, hadoopConf), splitSize)

  override def createReaderFactory(): PartitionReaderFactory =
    new CdcReaderFactory(conj, disj, required.fieldNames, hadoopConf)

  /** Streaming read over the same directory: new files are the stream (the
    * engine analogue of new stream-shard batches arriving). Same reader, same
    * source-level pk pruning, same byte-range splits as the batch path — the
    * point of MICRO_BATCH_READ is that the streaming pipeline loses none of
    * the pruning the reference applies before its handler is invoked
    * (`/root/reference/lib/constructs/dynamo.ts:157-191`).
    */
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new CdcMicroBatchStream(path, conj, disj, required, splitSize, hadoopConf,
      maxFilesPerTrigger)
}

private[sources] object CdcScan {
  /** List (path, length) under `path` via Hadoop FS with the SESSION conf:
    * the same code path serves file://, hdfs://, and object stores with the
    * user's credentials/endpoints.
    */
  def listFiles(path: String, hadoopConf: SerializableHadoopConf): Seq[(String, Long)] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(hadoopConf.value)
    val st = fs.getFileStatus(p)
    val files =
      if (st.isFile) Seq(st)
      else fs.listStatus(p).toSeq.filter(_.isFile).sortBy(_.getPath.getName)
    files.map(f => (f.getPath.toString, f.getLen))
  }

  /** BYTE-RANGE SPLIT at `splitSize` (Hadoop line-reader boundary semantics:
    * a split owns the lines that start inside (start, end]) — one 100 GB
    * archive file must not become one task.
    */
  def splitFiles(files: Seq[(String, Long)], splitSize: Long): Array[InputPartition] =
    files.flatMap { case (f, len) =>
      if (len == 0) Seq(CdcFilePartition(f, 0L, 0L))
      else (0L until len by splitSize).map { start =>
        CdcFilePartition(f, start, math.min(splitSize, len - start))
      }
    }.map(identity[InputPartition]).toArray
}

/** Streaming offset = the set of files fully processed, as a single-line
  * JSON object `{path: length, ...}` sorted by path. Single-line is a HARD
  * requirement: Spark's OffsetSeqLog is line-oriented — one line per source —
  * so a newline inside an offset splits it into phantom sources on restart.
  * Files are immutable once written (the append pattern of stream archives;
  * in-place growth is not tracked).
  */
private[sources] case class CdcOffset(files: Map[String, Long]) extends StreamingOffset {
  override def json(): String =
    graft.attr.Json.JObj(
      files.toVector.sortBy(_._1).map { case (p, l) =>
        (p, graft.attr.Json.JNum(BigDecimal(l)))
      }).print
}

private[sources] object CdcOffset {
  def fromJson(s: String): CdcOffset =
    if (s.isEmpty) CdcOffset(Map.empty)
    else graft.attr.JsonParser.parse(s) match {
      case o: graft.attr.Json.JObj =>
        CdcOffset(o.fields.map {
          case (p, graft.attr.Json.JNum(n)) => (p, n.toLong)
          case (p, other) => throw new IllegalArgumentException(
            s"malformed CdcOffset entry $p -> $other")
        }.toMap)
      case other => throw new IllegalArgumentException(s"malformed CdcOffset: $other")
    }
}

/** Micro-batch planning: each trigger processes the files that appeared since
  * the last committed offset, split by byte range exactly like the batch
  * scan. Implements [[SupportsTriggerAvailableNow]] so `Trigger.AvailableNow`
  * pins the end offset once at query start (drain-and-stop semantics without
  * the wrapper's extra listing per batch).
  */
private[sources] class CdcMicroBatchStream(path: String, conj: Array[Filter],
    disj: Array[Filter], required: StructType, splitSize: Long,
    hadoopConf: SerializableHadoopConf, maxFilesPerTrigger: Int = Int.MaxValue)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  private var fixedEnd: Option[CdcOffset] = None

  private def snapshot(): CdcOffset = CdcOffset(CdcScan.listFiles(path, hadoopConf).toMap)

  override def prepareForTriggerAvailableNow(): Unit = fixedEnd = Some(snapshot())
  override def initialOffset(): StreamingOffset = CdcOffset(Map.empty)
  override def latestOffset(): StreamingOffset = fixedEnd.getOrElse(snapshot())
  override def deserializeOffset(json: String): StreamingOffset = CdcOffset.fromJson(json)

  /** Admission control: `maxFilesPerTrigger` bounds each micro-batch — at
    * scale a week-long backlog must drain as many bounded batches (bounded
    * task count, bounded sink commit, steady checkpoint cadence), not one
    * giant catch-up batch. Under Trigger.AvailableNow the cap still applies
    * per batch; Spark keeps scheduling batches until the pinned end offset
    * is reached.
    */
  override def getDefaultReadLimit: ReadLimit =
    if (maxFilesPerTrigger == Int.MaxValue) ReadLimit.allAvailable()
    else ReadLimit.maxFiles(maxFilesPerTrigger)

  override def latestOffset(start: StreamingOffset, limit: ReadLimit): StreamingOffset = {
    val available = fixedEnd.getOrElse(snapshot()).files
    val done = start.asInstanceOf[CdcOffset].files
    limit match {
      case mf: ReadMaxFiles =>
        val fresh = available.toSeq
          .filter { case (p, _) => !done.contains(p) }
          .sortBy(_._1)
          .take(mf.maxFiles())
        CdcOffset(done ++ fresh)
      case _ => CdcOffset(available)
    }
  }

  override def planInputPartitions(start: StreamingOffset, end: StreamingOffset): Array[InputPartition] = {
    val done = start.asInstanceOf[CdcOffset].files
    val now = end.asInstanceOf[CdcOffset].files
    val fresh = now.toSeq.filter { case (p, _) => !done.contains(p) }.sortBy(_._1)
    CdcScan.splitFiles(fresh, splitSize)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new CdcReaderFactory(conj, disj, required.fieldNames, hadoopConf)

  override def commit(end: StreamingOffset): Unit = ()
  override def stop(): Unit = ()
}

private[sources] case class CdcFilePartition(file: String, start: Long, length: Long)
    extends InputPartition

private[sources] class CdcReaderFactory(
    conj: Array[Filter], disj: Array[Filter], requiredCols: Array[String],
    hadoopConf: SerializableHadoopConf)
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val part = partition.asInstanceOf[CdcFilePartition]
    val file = part.file
    // Pre-parse needles, ONLY for values JSON never escapes in our format
    // (quote/backslash/control chars would differ between the pk text and
    // its in-line representation, and any char may legally be \u-escaped by
    // exotic writers — such needles disable the shortcut, never correctness)
    def needleOf(f: Filter): Option[String] = f match {
      case EqualTo("pk", v: String) if escapeFree(v) => Some(v)
      case StringStartsWith("pk", p) if escapeFree(p) => Some(p)
      case _ => None
    }
    val conjNeedles = conj.flatMap(needleOf(_))
    val disjNeedles = disj.flatMap(needleOf(_))
    // the substring shortcut may only fire when EVERY filter yielded a needle
    val skipSafe = conjNeedles.length == conj.length &&
      disjNeedles.length == disj.length && (conj.nonEmpty || disj.nonEmpty)
    // a matching line must contain ALL conjunct needles and (when patterns
    // are configured) AT LEAST ONE pattern needle
    def lineMayMatch(line: String): Boolean =
      conjNeedles.forall(line.contains) &&
        (disjNeedles.isEmpty || disjNeedles.exists(line.contains))
    def matchOne(pk: String, f: Filter): Boolean = f match {
      case EqualTo("pk", v: String) => pk == v
      case StringStartsWith("pk", p) => pk.startsWith(p)
      case _ => true
    }
    val filtering = conj.nonEmpty || disj.nonEmpty
    def pkMatches(pk: String): Boolean =
      conj.forall(matchOne(pk, _)) && (disj.isEmpty || disj.exists(matchOne(pk, _)))

    new PartitionReader[InternalRow] {
      private val hPath = new org.apache.hadoop.fs.Path(file)
      private val in = hPath.getFileSystem(hadoopConf.value).open(hPath)
      // Hadoop LineReader: exact BYTE accounting for split boundaries
      // (char-based readers can't track file offsets through buffering).
      // Split contract (same as Hadoop's LineRecordReader): a split owns
      // every line that STARTS inside [start, start+length); a reader with
      // start > 0 discards the first (partial) line, and the last owned
      // line is read to completion past the boundary.
      private val lr = {
        if (part.start > 0) in.seek(part.start)
        new org.apache.hadoop.util.LineReader(in)
      }
      private val end = part.start + part.length
      private var pos = part.start
      private val text = new org.apache.hadoop.io.Text()
      if (part.start > 0) pos += lr.readLine(text) // skip the partial line
      private var row: InternalRow = _

      override def next(): Boolean = {
        // `pos <= end`, not `<`: a line starting EXACTLY at `end` belongs to
        // this split (Hadoop LineRecordReader reads while position <= end);
        // the next split's unconditional first-line skip discards it. With
        // strict `<` neither split would read it — silent data loss on any
        // file where a line start aligns with a splitSize multiple.
        while (pos <= end) {
          val n = lr.readLine(text)
          if (n == 0) return false // EOF
          pos += n
          // new String(bytes, UTF_8) REPLACEs malformed bytes — a poison
          // byte must not throw from the line iterator (OP-3 at the source)
          val line = new String(text.getBytes, 0, text.getLength,
            java.nio.charset.StandardCharsets.UTF_8)
          if (!skipSafe || lineMayMatch(line)) {
            parse(line) match {
              case Some(r) => row = r; return true
              case None => () // malformed or pk-pruned — residual is authority
            }
          }
        }
        false
      }
      override def get(): InternalRow = row
      override def close(): Unit = lr.close()

      private def parse(l: String): Option[InternalRow] =
        CdcSource.droppingNonFatal {
          RecordProcessor.parseRecord(l).flatMap { rec =>
            val ddb = rec.dynamodb
            val keysJson = ddb.flatMap(_.Keys)
            // throws on malformed Keys → record drops, like processLine
            val pk = keysJson.flatMap(CdcSource.pkText)
            if (filtering && !pk.exists(pkMatches)) None
            else {
              def s(v: Option[String]): UTF8String =
                v.map(UTF8String.fromString).orNull
              // emit only the pruned columns, in Spark's requested order
              Some(new GenericInternalRow(requiredCols.map[Any] {
                case "eventID" => s(rec.eventID)
                case "eventName" => s(rec.eventName)
                case "sizeBytes" => ddb.flatMap(_.SizeBytes).map(java.lang.Long.valueOf).orNull
                case "pk" => s(pk)
                case "keysJson" => s(keysJson)
                case "newImageJson" => s(ddb.flatMap(_.NewImage))
                case "oldImageJson" => s(ddb.flatMap(_.OldImage))
                case "hasDynamodb" => java.lang.Boolean.valueOf(ddb.isDefined)
              }))
            }
          }
        }
    }
  }

  private def escapeFree(v: String): Boolean =
    v.forall(c => c >= 0x20 && c < 0x7f && c != '"' && c != '\\')
}
