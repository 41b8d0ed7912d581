package graft

/** Early-warning gate for DRIVER TESTDATA SCHEMA CHANGES.
  *
  * Round 14 precedent: the driver regenerated all SFs with `events.ts`
  * switched from TIMESTAMP(NANOS) to TIMESTAMP(MICROS), and the first
  * symptom was a far-downstream vacuous-result assert (TemporalSpec) that
  * took an hour to trace — both engines happily agreed on the wrong empty
  * windows. This spec fails FIRST and names the exact table and column the
  * next time the testdata changes shape, so the session starts at the
  * cause, not a symptom.
  *
  * Tolerant exactly where the readers are tolerant — `events.ts` may be any
  * timestamp unit or raw int64 ([[graft.ops.Tables.tsTicksPerMs]] adapts at
  * the footer level) — and strict everywhere else.
  */
class SchemaGuardSpec extends SparkSuite {

  private def schemaString(table: String): String =
    spark.read.parquet(s"$sf/$table.parquet").schema.fields
      .map(f => s"${f.name}:${f.dataType.simpleString}").mkString(",")

  private val expected = Map(
    "region" -> "r_regionkey:int,r_name:string",
    "nation" -> "n_nationkey:int,n_name:string,n_regionkey:int",
    "customer" -> ("c_custkey:bigint,c_name:string,c_nationkey:int," +
      "c_acctbal:double,c_mktsegment:string"),
    "supplier" -> "s_suppkey:bigint,s_name:string,s_nationkey:int,s_acctbal:double",
    "part" -> ("p_partkey:bigint,p_name:string,p_brand:string,p_type:string," +
      "p_size:int,p_retailprice:double"),
    "orders" -> ("o_orderkey:bigint,o_custkey:bigint,o_orderstatus:string," +
      "o_totalprice:double,o_orderdate:timestamp_ntz,o_orderpriority:string"),
    "lineitem" -> ("l_orderkey:bigint,l_partkey:bigint,l_suppkey:bigint," +
      "l_linenumber:int,l_quantity:double,l_extendedprice:double," +
      "l_discount:double,l_tax:double,l_returnflag:string,l_linestatus:string," +
      "l_shipdate:timestamp_ntz"),
    "documents" -> "doc_id:bigint,text:string,lang:string,source:string,n_chars:bigint",
    "embeddings" -> "vec_id:bigint,embedding:array<float>,label:int")

  test("testdata schemas match the readers' expectations (driver regeneration guard)") {
    expected.foreach { case (table, want) =>
      val got = schemaString(table)
      assert(got == want,
        s"\nDRIVER TESTDATA SCHEMA CHANGED for '$table':\n  got:  $got\n  want: $want\n" +
          "The driver regenerated the parquet with a new shape (round-14 " +
          "precedent: events.ts NANOS->MICROS). Audit the readers in " +
          "ops/Tables.scala and every oracle touching the changed column " +
          "BEFORE chasing any downstream failure — they may be symptoms of this.")
    }
  }

  test("events schema: fixed names, flexible ts unit (footer-detected)") {
    val ev = spark.read.parquet(s"$sf/events.parquet").schema
    assert(ev.fields.map(_.name).toSeq ==
      Seq("event_id", "ts", "user_id", "event_type", "value", "props"),
      s"events columns changed: ${ev.fields.map(_.name).mkString(",")}")
    val tsType = ev("ts").dataType.simpleString
    assert(Set("timestamp", "timestamp_ntz", "bigint").contains(tsType),
      s"events.ts has unexpected type $tsType — extend Tables.tsTicksPerMs " +
        "and its unit tests before anything else")
    val others = ev.fields.filter(_.name != "ts")
      .map(f => s"${f.name}:${f.dataType.simpleString}").mkString(",")
    assert(others ==
      "event_id:bigint,user_id:bigint,event_type:string,value:double,props:string",
      s"events non-ts columns changed: $others")
  }
}
