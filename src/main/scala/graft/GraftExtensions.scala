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
    // regex-count queries silently upgrade to the one-pass scanner
    // (semantics-preserving subset only — see the rule's scaladoc)
    ext.injectOptimizerRule(_ => graft.plans.FuseTextScanRule)
  }
}
