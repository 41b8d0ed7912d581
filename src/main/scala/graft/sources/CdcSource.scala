package graft.sources

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
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
    StructField("oldImageJson", StringType)))

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
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new CdcScanBuilder(path, options.getLong("splitSize", 128L * 1024 * 1024))
}

private[sources] class CdcScanBuilder(path: String, splitSize: Long)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = CdcSource.schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter {
      case EqualTo("pk", _: String) => true
      case StringStartsWith("pk", _) => true
      case _ => false
    }
    filters // ALL residual: Spark re-applies exactly; the scan only prunes
  }
  override def pushedFilters(): Array[Filter] = pushed
  // column pruning: a projection of (eventID, pk) ships 2 small strings per
  // row instead of the whole envelope with its image JSON bodies
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = new CdcScan(path, pushed, required, splitSize)
}

private[sources] class CdcScan(path: String, filters: Array[Filter],
    required: StructType, splitSize: Long) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-cdc path=$path PushedFilters=[${filters.mkString(", ")}] " +
      s"ReadSchema=[${required.fieldNames.mkString(", ")}]"

  private val hadoopConf = new SerializableHadoopConf(
    SparkSession.active.sessionState.newHadoopConf())

  override def planInputPartitions(): Array[InputPartition] = {
    // Hadoop FS with the SESSION conf: the same code path serves file://,
    // hdfs://, and object stores with the user's credentials/endpoints.
    // Files are BYTE-RANGE SPLIT at `splitSize` (Hadoop line-reader
    // boundary semantics: a split owns the lines that START inside it) —
    // one 100 GB archive file must not become one task.
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(hadoopConf.value)
    val st = fs.getFileStatus(p)
    val files =
      if (st.isFile) Array(st)
      else fs.listStatus(p).filter(_.isFile).sortBy(_.getPath.getName)
    files.flatMap { f =>
      val len = f.getLen
      if (len == 0) Seq(CdcFilePartition(f.getPath.toString, 0L, 0L))
      else (0L until len by splitSize).map { start =>
        CdcFilePartition(f.getPath.toString, start, math.min(splitSize, len - start))
      }
    }.map(identity[InputPartition])
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new CdcReaderFactory(filters, required.fieldNames, hadoopConf)
}

private[sources] case class CdcFilePartition(file: String, start: Long, length: Long)
    extends InputPartition

private[sources] class CdcReaderFactory(
    filters: Array[Filter], requiredCols: Array[String],
    hadoopConf: SerializableHadoopConf)
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val part = partition.asInstanceOf[CdcFilePartition]
    val file = part.file
    // Pre-parse needles, ONLY for values JSON never escapes in our format
    // (quote/backslash/control chars would differ between the pk text and
    // its in-line representation, and any char may legally be \u-escaped by
    // exotic writers — such needles disable the shortcut, never correctness)
    val needles: Array[String] = filters.collect {
      case EqualTo("pk", v: String) if escapeFree(v) => v
      case StringStartsWith("pk", p) if escapeFree(p) => p
    }
    val skipSafe = needles.length == filters.length && filters.nonEmpty
    def pkMatches(pk: String): Boolean = filters.forall {
      case EqualTo("pk", v: String) => pk == v
      case StringStartsWith("pk", p) => pk.startsWith(p)
      case _ => true
    }

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
        while (pos < end) {
          val n = lr.readLine(text)
          if (n == 0) return false // EOF
          pos += n
          // new String(bytes, UTF_8) REPLACEs malformed bytes — a poison
          // byte must not throw from the line iterator (OP-3 at the source)
          val line = new String(text.getBytes, 0, text.getLength,
            java.nio.charset.StandardCharsets.UTF_8)
          if (!skipSafe || needles.exists(line.contains)) {
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
        try {
          RecordProcessor.parseRecord(l).flatMap { rec =>
            val ddb = rec.dynamodb
            val keysJson = ddb.flatMap(_.Keys)
            // throws on malformed Keys → record drops, like processLine
            val pk = keysJson.flatMap(CdcSource.pkText)
            if (filters.nonEmpty && !pk.exists(pkMatches)) None
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
              }))
            }
          }
        } catch { case _: Throwable => None }
    }
  }

  private def escapeFree(v: String): Boolean =
    v.forall(c => c >= 0x20 && c < 0x7f && c != '"' && c != '\\')
}
