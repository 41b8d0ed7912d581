package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types._

/** Bounded top-k rank buffer: up to `k` DISTINCT (sim, cid) pairs held
  * best-first under the ordering (sim DESC, cid ASC) with Spark's nan-safe
  * double semantics (NaN compares greater than any double and equal to
  * itself; -0.0 equals 0.0 — the exact comparator SortExec generates for a
  * DESC double key). Insertion dedups exact (sim, cid) repeats, which is
  * how `dense_rank` over cell-duplicated ANN candidates (bit-identical sim
  * per pair occurrence) equals `row_number` over deduplicated pairs.
  */
final class TopKBuf(val k: Int) {
  var n: Int = 0
  val sims: Array[Double] = new Array[Double](k)
  val cids: Array[Long] = new Array[Long](k)

  /** < 0 iff (s1, c1) ranks strictly before (s2, c2). */
  private def cmp(s1: Double, c1: Long, s2: Double, c2: Long): Int = {
    val bySim = TopKBuf.nanSafeCompare(s2, s1) // descending sim, NaN first
    if (bySim != 0) bySim else java.lang.Long.compare(c1, c2)
  }

  def insert(s: Double, c: Long): Unit = {
    var i = 0
    while (i < n && cmp(s, c, sims(i), cids(i)) > 0) i += 1
    if (i >= k) return // worse than the current kth
    if (i < n && cmp(s, c, sims(i), cids(i)) == 0) return // duplicate pair
    var j = math.min(n, k - 1)
    while (j > i) { sims(j) = sims(j - 1); cids(j) = cids(j - 1); j -= 1 }
    sims(i) = s; cids(i) = c
    if (n < k) n += 1
  }

  def mergeFrom(o: TopKBuf): Unit = {
    var i = 0
    while (i < o.n) { insert(o.sims(i), o.cids(i)); i += 1 }
  }
}

object TopKBuf {
  /** Spark's nan-safe double comparator (`SQLOrderingUtil` semantics):
    * primitive < / > first (so -0.0 == 0.0), then NaN > non-NaN,
    * NaN == NaN.
    */
  def nanSafeCompare(a: Double, b: Double): Int = {
    if (a < b) -1
    else if (a > b) 1
    else {
      val an = java.lang.Double.isNaN(a)
      val bn = java.lang.Double.isNaN(b)
      if (an && bn) 0 else if (an) 1 else if (bn) -1 else 0
    }
  }
}

/** Bounded top-k-per-group aggregate — the §4.3-option-(2) replacement for
  * the `dense_rank() OVER (PARTITION BY qid ORDER BY sim DESC, cid) <= k`
  * window every ANN probe ends in (r20 VERDICT item 4: at 38.6M candidate
  * rows the window's map-side sort was the static probe's largest stage).
  * As a hash aggregate the candidate stream is folded into one k-slot
  * buffer per qid with NO sort anywhere: map-side partial aggregation
  * bounds the exchange at |qids| x k entries per mapper (vs WindowGroupLimit,
  * which still locally SORTS every candidate row before its rank prune).
  *
  * Output: `array<struct<rank BIGINT, cid BIGINT, sim DOUBLE>>`, ranks
  * 1..min(k, distinct pairs), ordered best-first — exploding it reproduces
  * the window + `filter(rank <= k)` + `distinct()` rows EXACTLY (see
  * [[TopKBuf]] for the tie/NaN/duplicate semantics). Null sims/cids are
  * skipped (unreachable in the ANN paths: a candidate row always carries a
  * computed cosine; the window form would likewise never rank a null above
  * a real candidate under DESC NULLS LAST unless a group were all-null).
  */
case class TopKRank(simExpr: Expression, cidExpr: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuf] with BinaryLike[Expression] {

  require(k >= 1, s"TopKRank needs k >= 1, got $k")

  override def left: Expression = simExpr
  override def right: Expression = cidExpr

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): TopKRank =
    copy(simExpr = newLeft, cidExpr = newRight)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKRank =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKRank =
    copy(inputAggBufferOffset = newOffset)

  override def createAggregationBuffer(): TopKBuf = new TopKBuf(k)

  override def update(buffer: TopKBuf, input: InternalRow): TopKBuf = {
    val s = simExpr.eval(input)
    val c = cidExpr.eval(input)
    if (s != null && c != null)
      buffer.insert(s.asInstanceOf[Double], c.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: TopKBuf, other: TopKBuf): TopKBuf = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: TopKBuf): Any = {
    val out = new Array[Any](buffer.n)
    var i = 0
    while (i < buffer.n) {
      out(i) = InternalRow((i + 1).toLong, buffer.cids(i), buffer.sims(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buffer: TopKBuf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buffer.n * 16)
    bb.putInt(buffer.n)
    var i = 0
    while (i < buffer.n) {
      bb.putDouble(buffer.sims(i)); bb.putLong(buffer.cids(i)); i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuf(k)
    var i = 0
    // entries arrive best-first and pre-deduplicated; insert preserves order
    while (i < n) { buf.insert(bb.getDouble, bb.getLong); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("rank", LongType, nullable = false),
    StructField("cid", LongType, nullable = false),
    StructField("sim", DoubleType, nullable = false))), containsNull = false)

  override def nullable: Boolean = false

  override def prettyName: String = "graft_topk_rank"
}

object TopKAgg {

  /** The in-memory hash-map entry bound before ObjectHashAggregateExec
    * falls back to SORT-based aggregation (Spark default 128 — sized for
    * heavyweight buffers like percentile digests, far too small for a
    * [[TopKBuf]] of ~16k+32 bytes). One task's map holds one entry per
    * DISTINCT group key it sees, bounded by candidate-rows-per-split /
    * candidates-per-qid (~7k distinct qids for a 128 MB split at ~755
    * candidates/vector) — 1M entries x ~150 B is a comfortably bounded
    * worst case, and far past anything a real split produces. Env override
    * for experiments; falling back is CORRECT either way, just slower (the
    * sort this aggregate exists to avoid).
    */
  private val FallbackThreshold: String =
    sys.env.getOrElse("SPARK_GRAFT_TOPK_HASH_GROUPS", (1 << 20).toString)

  /** `topk_rank(sim, cid, k)` as a Column aggregate. Callers `groupBy(qid)`
    * and explode the result; see [[TopKRank]]. Also raises the session's
    * object-hash-aggregate fallback threshold (guarded: only if still at
    * the 128 default) so the aggregate actually runs hash-based.
    */
  def topkRank(spark: org.apache.spark.sql.SparkSession, sim: Column,
      cid: Column, k: Int): Column = {
    val key = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    if (spark.conf.getOption(key).forall(_ == "128"))
      spark.conf.set(key, FallbackThreshold)
    Bridge.column(
      TopKRank(Bridge.expression(sim), Bridge.expression(cid), k)
        .toAggregateExpression())
  }
}
