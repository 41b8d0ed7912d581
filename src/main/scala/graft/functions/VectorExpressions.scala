package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
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
}
