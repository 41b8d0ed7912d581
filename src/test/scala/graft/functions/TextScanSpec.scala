package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSuite

/** Pins the one-pass [[TextScanner]] to the EXACT regex formulations the
  * DuckDB oracle still runs — field by field, over adversarial strings and
  * the real documents table.
  */
class TextScanSpec extends SparkSuite {

  // one shared definition of the oracle-regex semantics (RE2 ASCII \b) —
  // also used by the TextScanFuzzSpec property
  private def regexReference(s: String): Seq[Long] = TextScanReference.fields(s)

  private def scannerOf(s: String): Seq[Long] = {
    val row = TextScanner.scan(UTF8String.fromString(s))
    (0 until 9).map(row.getLong)
  }

  private val nasty = Seq(
    "",
    "a",
    " ",
    "the",
    "theory a_b the.",
    "don't 'll 've x're won'ts",
    "  double  spaces   between",
    "tabs\tand\nnewlines\f\r mixed",
    "'s's's",
    "la la los les et und der die das el y of the a",
    "münchen café ñoño",
    "123 abc42x _underscore_ the_a a_ _a a",
    "!!?'s",
    "' end'",
    "a'a the'the",
    "trailing space ",
    " leading",
    "...---''' mixed!punct?runs",
    "42 7x 'd'm't all contractions 'veaf 'll",
    "of course the a of y el la le et und",
    "astral 😀 emoji 😀😁 runs and 🎉!",
    "lone high \uD800 and low \uDC00 surrogates",
    // divergent case: RE2 \b sees a boundary between ñ and t (ñ is not ASCII
    // \w), Java \b does not — the scanner must follow RE2 (the oracle)
    "ñthe la ña ofñ elx ña ñof der ñder")

  test("scanner equals the regex reference on adversarial strings, per field") {
    val names = TextScan.schema.fieldNames
    nasty.foreach { s =>
      val got = scannerOf(s)
      val want = regexReference(s)
      got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
        assert(g == w, s"field ${names(i)} on '$s': scanner=$g regex=$w")
      }
    }
  }

  test("scanner equals the regex reference on every sf0.001 document") {
    import spark.implicits._
    val texts = graft.ops.Tables.documents(spark, sf)
      .select(col("text")).as[String].collect()
    assert(texts.nonEmpty)
    texts.foreach { s =>
      assert(scannerOf(s) == regexReference(s), s"mismatch on doc: ${s.take(80)}")
    }
  }

  test("text_scan rides whole-stage codegen and matches the eval path") {
    // a parquet-backed frame, not a local Seq — ConvertToLocalRelation would
    // eval the expression at optimize time and leave no codegen span to check
    val df = graft.ops.Tables.documents(spark, sf)
      .filter(col("doc_id") < 5)
      .select(col("text"), TextFunctions.text_scan(col("text")).as("ts"))
    // the projection carrying TextScan must sit INSIDE a WholeStageCodegen
    // span (an orderBy+limit would hoist it into TakeOrderedAndProject,
    // which is interpreted — that is exactly the shape to avoid)
    val inCodegen = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }.exists(_.collect {
      case p: org.apache.spark.sql.execution.ProjectExec => p
    }.exists(_.projectList.exists(_.exists(_.isInstanceOf[TextScan]))))
    assert(inCodegen, df.queryExecution.executedPlan.toString.take(600))
    df.collect().foreach { r =>
      val want = regexReference(r.getString(0))
      val ts = r.getStruct(1)
      (0 until 9).foreach(i =>
        assert(ts.getLong(i) == want(i), s"codegen path field $i on '${r.getString(0).take(60)}'"))
    }
  }

  test("null text yields a null struct (and the queries tolerate it)") {
    import spark.implicits._
    val df = Seq(Some("the a"), None).toDF("text")
      .select(TextFunctions.text_scan(col("text")).as("ts"))
    val rows = df.collect()
    assert(!rows(0).isNullAt(0) && rows(1).isNullAt(0))
  }
}
