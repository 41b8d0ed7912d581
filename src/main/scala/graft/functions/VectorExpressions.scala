package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types._

/** Native Catalyst dot product over two numeric arrays — the hot inner loop
  * of every similarity operator (SURVEY.md §4.3: custom `Expression` over a
  * UDF when benchmarks demand it).
  *
  * Semantics are IDENTICAL to
  * `aggregate(zip_with(a, b, (x,y) -> double(x)*double(y)), 0d, +)`:
  * element-ordered double accumulation (so DuckDB-oracle parity is
  * preserved bit-for-bit), null elements contribute 0, length = min(len).
  * Unlike the lambda pipeline it is whole-stage-codegen'd: one fused loop,
  * no per-element lambda dispatch, no intermediate array allocation.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  /** Analysis-time validation: wrong-typed input fails resolution with a
    * clear message instead of erroring mid-execution.
    */
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dot_product expects array<float|double> inputs, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
  }

  private def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => t
    case other => throw new IllegalArgumentException(
      s"dot_product expects array<float|double>, got ${other.simpleString(10)}")
  }

  // resolved once, not per row
  @transient private lazy val leftIsFloat = elemType(left) == FloatType
  @transient private lazy val rightIsFloat = elemType(right) == FloatType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    val la = leftIsFloat
    val lb = rightIsFloat
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (a.isNullAt(i)) 0.0 else if (la) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (b.isNullAt(i)) 0.0 else if (lb) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getA = if (elemType(left) == FloatType) "getFloat" else "getDouble"
    val getB = if (elemType(right) == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double xv = $a.isNullAt($i) ? 0.0 : (double) $a.$getA($i);
         |  double yv = $b.isNullAt($i) ? 0.0 : (double) $b.$getB($i);
         |  $acc += xv * yv;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

/** Multi-table random-hyperplane LSH signatures as ONE codegen'd expression:
  * for an embedding array, returns `nTables * (1 + probes)` bucket ids laid
  * out `[table * (1+probes) + j]` — entry j=0 is table t's HOME bucket (bit
  * i = sign of the dot product with hyperplane (t, i)); entries j=1..probes
  * are the home bucket with the j-th LOWEST-MARGIN bit flipped (margin =
  * |dot|, the distance to that hyperplane). Flipping the least-confident
  * bits is multi-probe LSH (Lv et al., VLDB'07): a query's nearest
  * boundary-crossing neighbors land in exactly those adjacent buckets, so
  * each probe buys far more recall per candidate than an extra independent
  * table would.
  *
  * Semantics are IDENTICAL to the typed-Dataset reference path
  * ([[graft.ops.Similarity.lshSignaturesTyped]], kept as the parity-spec
  * surface): element j contributes `(double) emb[j] * plane[j]` over
  * `min(len(emb), dim)` elements, null elements contribute 0, `acc >= 0`
  * sets the bit, and margin ties break to the lower bit index — so bucket
  * ids (and therefore ANN recall) are bit-for-bit reproducible. Unlike the
  * typed path it never deserializes the array into an `Array[Float]` and
  * never leaves whole-stage codegen: the loop reads the columnar
  * `ArrayData` in place and emits one `long[]`, which `posexplode` then
  * unrolls to (table, probe, bucket) rows.
  *
  * The planes ride along as ONE boxed reference (`ctx.addReferenceObj`),
  * not as literals — expressing them as nTables x bits 64-double array
  * literals made Catalyst fold and Janino compile a ~5k-node projection
  * (seconds of fixed overhead; the round-3 lesson recorded in lshIndex).
  */
case class HyperplaneBuckets(child: Expression, planes: Array[Array[Array[Double]]],
    probes: Int = 0)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hyperplane_buckets expects array<float|double> input, got ${other.simpleString}")
    }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  // shape is uniform by construction (Similarity generates rectangular
  // plane tables); validated here so a malformed caller fails at plan time
  private val nTables: Int = planes.length
  private val bits: Int = if (nTables == 0) 0 else planes(0).length
  private val dim: Int = if (bits == 0) 0 else planes(0)(0).length
  require(planes.forall(t => t.length == bits && t.forall(_.length == dim)),
    "hyperplane_buckets: plane tables must be rectangular (same bits and dim)")
  require(bits <= 63, s"hyperplane_buckets: $bits bits exceed one long bucket")
  require(probes >= 0 && probes <= bits,
    s"hyperplane_buckets: $probes probes need at least that many bits (have $bits)")

  private val perTable: Int = 1 + probes

  // Content equality over the plane tensor: the case-class default compares
  // Array by reference, so two structurally identical instances would never
  // be semantically equal — defeating Catalyst canonicalization / CSE and
  // letting duplicate plan nodes each serialize their own copy of the
  // planes. deepEquals/deepHashCode restore value semantics (round-7
  // advice). The deep hash is computed ONCE: Catalyst hashes/compares
  // expressions repeatedly during analysis (ExpressionSet, CSE), and
  // walking thousands of boxed doubles per call would tax the very
  // mechanism this enables — the cached hash also fast-paths equals.
  private lazy val planesHash: Int =
    java.util.Arrays.deepHashCode(planes.asInstanceOf[Array[AnyRef]])

  override def equals(other: Any): Boolean = other match {
    case h: HyperplaneBuckets =>
      child == h.child && probes == h.probes && planesHash == h.planesHash &&
        java.util.Arrays.deepEquals(
          planes.asInstanceOf[Array[AnyRef]], h.planes.asInstanceOf[Array[AnyRef]])
    case _ => false
  }

  override def hashCode(): Int = {
    var h = child.hashCode()
    h = 31 * h + probes
    31 * h + planesHash
  }

  /** Planes flattened [t][i][j] -> t*bits*dim + i*dim + j: one contiguous
    * primitive array for the codegen loop (no nested-array dereferences).
    */
  private lazy val flatPlanes: Array[Double] = {
    val out = new Array[Double](nTables * bits * dim)
    var t = 0
    while (t < nTables) {
      var i = 0
      while (i < bits) {
        System.arraycopy(planes(t)(i), 0, out, (t * bits + i) * dim, dim)
        i += 1
      }
      t += 1
    }
    out
  }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val nElem = a.numElements()
    val fl = isFloat
    val flat = flatPlanes
    val out = new Array[Long](nTables * perTable)
    val margins = new Array[Double](bits)
    var t = 0
    while (t < nTables) {
      var home = 0L
      var i = 0
      while (i < bits) {
        val off = (t * bits + i) * dim
        var acc = 0.0
        var j = 0
        val n = math.min(nElem, dim)
        while (j < n) {
          val x = if (a.isNullAt(j)) 0.0 else if (fl) a.getFloat(j).toDouble else a.getDouble(j)
          acc += x * flat(off + j)
          j += 1
        }
        if (acc >= 0) home |= (1L << i)
        margins(i) = if (acc < 0) -acc else acc
        i += 1
      }
      out(t * perTable) = home
      // probe buckets: flip the `probes` lowest-margin bits, one per entry;
      // strict < keeps the LOWEST index on ties (the codegen path and the
      // typed reference do the same, so signatures are reproducible)
      var used = 0L
      var q = 1
      while (q <= probes) {
        var best = -1
        var bm = Double.MaxValue
        var b = 0
        while (b < bits) {
          if (((used >> b) & 1L) == 0L && margins(b) < bm) { bm = margins(b); best = b }
          b += 1
        }
        used |= (1L << best)
        out(t * perTable + q) = home ^ (1L << best)
        q += 1
      }
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("hyperplanes", flatPlanes, "double[]")
    val getElem = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, a => {
      val buckets = ctx.freshName("buckets")
      val margins = ctx.freshName("margins")
      val nElem = ctx.freshName("nElem")
      val t = ctx.freshName("t")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val off = ctx.freshName("off")
      val acc = ctx.freshName("acc")
      val home = ctx.freshName("home")
      val x = ctx.freshName("x")
      val used = ctx.freshName("used")
      val q = ctx.freshName("q")
      val b = ctx.freshName("b")
      val best = ctx.freshName("best")
      val bm = ctx.freshName("bm")
      s"""
         |long[] $buckets = new long[${nTables * perTable}];
         |double[] $margins = new double[$bits];
         |int $nElem = $a.numElements();
         |int $n = java.lang.Math.min($nElem, $dim);
         |int $off = 0;
         |for (int $t = 0; $t < $nTables; $t++) {
         |  long $home = 0L;
         |  for (int $i = 0; $i < $bits; $i++) {
         |    double $acc = 0.0;
         |    for (int $j = 0; $j < $n; $j++) {
         |      double $x = $a.isNullAt($j) ? 0.0 : (double) $a.$getElem($j);
         |      $acc += $x * $flatRef[$off + $j];
         |    }
         |    if ($acc >= 0) $home |= (1L << $i);
         |    $margins[$i] = $acc < 0 ? -$acc : $acc;
         |    $off += $dim;
         |  }
         |  $buckets[$t * $perTable] = $home;
         |  long $used = 0L;
         |  for (int $q = 1; $q <= $probes; $q++) {
         |    int $best = -1;
         |    double $bm = Double.MAX_VALUE;
         |    for (int $b = 0; $b < $bits; $b++) {
         |      if ((($used >> $b) & 1L) == 0L && $margins[$b] < $bm) { $bm = $margins[$b]; $best = $b; }
         |    }
         |    $used |= (1L << $best);
         |    $buckets[$t * $perTable + $q] = $home ^ (1L << $best);
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($buckets);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBuckets =
    copy(child = newChild)
}

object VectorFunctions {
  private def column(e: Expression): Column = Bridge.column(e)
  private def expression(c: Column): Expression = Bridge.expression(c)

  /** Element-ordered dot product (codegen'd). */
  def dot_product(a: Column, b: Column): Column =
    column(DotProduct(expression(a), expression(b)))

  /** L2 norm. */
  def l2_norm(a: Column): Column =
    org.apache.spark.sql.functions.sqrt(dot_product(a, a))

  /** Cosine similarity: dot / (|a| * |b|). */
  def cosine_sim(a: Column, b: Column): Column =
    dot_product(a, b) / (l2_norm(a) * l2_norm(b))

  /** Per-vector LSH bucket ids, `1 + probes` longs per hash table laid out
    * `[table * (1+probes) + j]`: the home bucket, then `probes` multi-probe
    * variants with the lowest-margin bits flipped (codegen'd).
    */
  def hyperplane_buckets(emb: Column, planes: Array[Array[Array[Double]]],
      probes: Int = 0): Column =
    column(HyperplaneBuckets(expression(emb), planes, probes))
}
