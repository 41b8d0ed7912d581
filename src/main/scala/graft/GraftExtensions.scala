package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DotProduct, TextScan}

/** SparkSessionExtensions entry point: registers the engine's native
  * functions for SQL users. Install with
  * `spark.sql.extensions=graft.GraftExtensions` or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`.
  *
  * SQL surface:
  * {{{
  *   SELECT graft_dot_product(a.embedding, b.embedding) FROM ...
  *   SELECT graft_cosine_sim(a.embedding, b.embedding) FROM ...
  *   SELECT graft_text_scan(text).n_tokens FROM docs
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot_product"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_dot_product(a, b) takes 2 arguments")
        DotProduct(children(0), children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_cosine_sim"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_cosine_sim"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_cosine_sim(a, b) takes 2 arguments")
        val Seq(a, b) = children
        import org.apache.spark.sql.catalyst.expressions.{Divide, Multiply, Sqrt}
        Divide(DotProduct(a, b),
          Multiply(Sqrt(DotProduct(a, a)), Sqrt(DotProduct(b, b))))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_text_scan"),
      new ExpressionInfo(classOf[TextScan].getName, "graft_text_scan"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_text_scan(text) takes 1 argument")
        TextScan(children.head)
      }))
    // z-order sort keys for SQL-side CLUSTER BY / ORDER BY layout control:
    // SELECT * FROM t DISTRIBUTE BY graft_zvalue(u, v) SORT BY graft_zvalue(u, v).
    // Built from catalyst nodes (a Column-DSL tree stays unresolved inside a
    // function builder); the mask ladders are shared with Layout, and the
    // extensions spec pins SQL output == Scala API output.
    ext.injectFunction((
      FunctionIdentifier("graft_zvalue"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "graft_zvalue"),
      (children: Seq[Expression]) => {
        require(children.length == 2 || children.length == 3,
          "graft_zvalue(k1, k2[, k3]) takes 2 or 3 keys")
        GraftExtensions.zValueExpr(children)
      }))
    // regex-count queries silently upgrade to the one-pass scanner
    // (semantics-preserving subset only — see the rule's scaladoc)
    ext.injectOptimizerRule(_ => graft.plans.FuseTextScanRule)
  }
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.expressions.{BitwiseAnd, BitwiseOr, BitwiseXor, Cast, Literal, ShiftLeft}
  import org.apache.spark.sql.types.LongType

  import graft.ops.Layout

  /** Catalyst form of [[graft.ops.Layout.zValueK]] for the SQL function —
    * identical bit ladders (constants shared via Layout), resolved
    * expression tree so the analyzer and codegen see plain bit ops.
    */
  private[graft] def zValueExpr(keys: Seq[Expression]): Expression = {
    def l(v: Long): Expression = Literal(v, LongType)
    def spread(init: Long, steps: Seq[(Int, Long)], c: Expression): Expression =
      steps.foldLeft[Expression](BitwiseAnd(Cast(c, LongType), l(init))) {
        case (x, (sh, mask)) =>
          BitwiseAnd(BitwiseOr(x, ShiftLeft(x, Literal(sh))), l(mask))
      }
    val z = keys match {
      case Seq(a, b) =>
        BitwiseOr(spread(Layout.Spread2Init, Layout.Spread2Steps, a),
          ShiftLeft(spread(Layout.Spread2Init, Layout.Spread2Steps, b), Literal(1)))
      case Seq(a, b, c) =>
        BitwiseOr(
          BitwiseOr(spread(Layout.Spread3Init, Layout.Spread3Steps, a),
            ShiftLeft(spread(Layout.Spread3Init, Layout.Spread3Steps, b), Literal(1))),
          ShiftLeft(spread(Layout.Spread3Init, Layout.Spread3Steps, c), Literal(2)))
      case other => throw new IllegalArgumentException(
        s"graft_zvalue takes 2 or 3 keys, got ${other.length}")
    }
    BitwiseXor(z, l(Long.MinValue))
  }
}
