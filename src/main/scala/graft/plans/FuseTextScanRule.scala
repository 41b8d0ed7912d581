package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Cast, GetStructField, Literal, RegExpExtractAll, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.TextScan

/** Optimizer rule (injected via [[graft.GraftExtensions]]): rewrites
  * `size(regexp_extract_all(text, <known pattern>, 0))` into a field read of
  * the one-pass [[TextScan]] expression — SQL users who write the regex
  * formulation get the fused scanner without changing their queries, and
  * multiple counters over the same column collapse into ONE scan via
  * Spark's common-subexpression elimination.
  *
  * Semantics-preserving by construction, which is why only THREE patterns
  * rewrite: the pure-ASCII-class patterns (tokens, BPE-ish, punctuation)
  * mean the same thing in Java regex (what `regexp_extract_all` runs) and
  * RE2 (what the scanner implements). The `\b`-based stop-word/language
  * patterns are NOT rewritten — Java's `\b` is Unicode-aware and diverges
  * from the scanner's ASCII boundary next to non-ASCII letters, and an
  * optimizer rule may never change results. Likewise the rewrite is skipped
  * under `legacySizeOfNull` (size(NULL) = -1 there; the scan yields NULL).
  */
object FuseTextScanRule extends Rule[LogicalPlan] {

  // pattern string -> TextScan schema field ordinal (patterns defined ONCE
  // on the TextScan companion, shared with the parity specs)
  private val fieldOf: Map[String, Int] = Map(
    TextScan.TokensPattern -> 0,
    TextScan.BpePattern -> 2,
    TextScan.PunctPattern -> 4)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case s @ Size(RegExpExtractAll(child, Literal(p: UTF8String, StringType),
        Literal(0, IntegerType)), legacy)
        if !legacy && fieldOf.contains(p.toString) && child.resolved &&
          child.dataType == StringType =>
      val ord = fieldOf(p.toString)
      val field = TextScan.schema.fields(ord)
      // size() returns INT; the scan counts LONG — cast keeps the original
      // type (counts are bounded by string length, far below 2^31)
      Cast(GetStructField(TextScan(child), ord, Some(field.name)), s.dataType)
  }
}
