package graft

import graft.sources.Tables

/** Harness-schema tripwire: asserts the Spark-visible column types of every
  * driver-generated testdata table at sf0.001.
  *
  * Why this exists: in round 8 the harness silently changed `events.ts` from
  * parquet TIMESTAMP(NANOS) (ns-as-long under the legacy conf) to
  * `timestamp[us]` NTZ, and 16 registered queries died at analysis time with
  * nothing pointing at the cause. This spec turns any future physical-schema
  * drift into one readable assertion. If it fires:
  *   1. event-time handling is schema-adaptive ([[graft.sources.Events]]) —
  *      extend its match if a new `ts` encoding appears;
  *   2. update the expected map below to the new reality;
  *   3. re-run the full verify recipe at sf0.001 AND sf0.01 (CLAUDE.md) —
  *      other queries may depend on the changed column.
  */
class TestdataSchemaSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private val expected: Map[String, String] = Map(
    "region"   -> "r_regionkey:int, r_name:string",
    "nation"   -> "n_nationkey:int, n_name:string, n_regionkey:int",
    "customer" -> "c_custkey:bigint, c_name:string, c_nationkey:int, c_acctbal:double, c_mktsegment:string",
    "supplier" -> "s_suppkey:bigint, s_name:string, s_nationkey:int, s_acctbal:double",
    "part"     -> "p_partkey:bigint, p_name:string, p_brand:string, p_type:string, p_size:int, p_retailprice:double",
    "orders"   -> "o_orderkey:bigint, o_custkey:bigint, o_orderstatus:string, o_totalprice:double, o_orderdate:timestamp_ntz, o_orderpriority:string",
    "lineitem" -> ("l_orderkey:bigint, l_partkey:bigint, l_suppkey:bigint, l_linenumber:int, l_quantity:double, " +
      "l_extendedprice:double, l_discount:double, l_tax:double, l_returnflag:string, l_linestatus:string, l_shipdate:timestamp_ntz"),
    "events"   -> "event_id:bigint, ts:timestamp_ntz, user_id:bigint, event_type:string, value:double, props:string",
    "documents" -> "doc_id:bigint, text:string, lang:string, source:string, n_chars:bigint",
    "embeddings" -> "vec_id:bigint, embedding:array<float>, label:int")

  test("physical schema of every harness table matches the recorded reality") {
    val drift = Tables.names.flatMap { n =>
      val got = Tables(spark, sfDir, n).schema.fields
        .map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", ")
      expected.get(n) match {
        case Some(want) if got == want => None
        case Some(want) => Some(s"$n\n  expected: $want\n  got:      $got")
        case None => Some(s"$n\n  not in the expected map — record its schema here\n  got: $got")
      }
    }
    assert(drift.isEmpty,
      "\nHARNESS TESTDATA SCHEMA DRIFT — the driver regenerated parquet with new " +
        "types.\nEvent-time is schema-adaptive (graft.sources.Events); see this " +
        "spec's scaladoc for the recovery checklist.\n" + drift.mkString("\n"))
  }

  test("every table name in the expected map is loaded by Tables.names") {
    assert(expected.keySet == Tables.names.toSet)
  }
}
