package graft

import org.apache.spark.sql.types._

import graft.sources.Tables

/** SCHEMA-DRIFT CANARY: the driver regenerates /root/testdata between
  * rounds and has already changed a physical encoding once
  * (events.ts: TIMESTAMP(NANOS) → TIMESTAMP(MICROS), which silently broke
  * every event query for a round). This spec opens every table through the
  * engine's own readers and asserts the RESOLVED schema the operators
  * depend on — so the next drift fails here, at test time, with a named
  * column, instead of at bench time with 18 opaque query errors.
  */
class SchemaCanarySpec extends SparkTestBase {

  private val expected: Map[String, Set[String]] = Map(
    "region"   -> Set("r_regionkey", "r_name"),
    "nation"   -> Set("n_nationkey", "n_name", "n_regionkey"),
    "customer" -> Set("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"),
    "supplier" -> Set("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
    "part"     -> Set("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"),
    "orders"   -> Set("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"),
    "lineitem" -> Set("l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice",
      "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate"),
    "events"   -> Set("event_id", "ts", "user_id", "event_type", "value", "props"),
    "documents" -> Set("doc_id", "text", "lang", "source", "n_chars"),
    "embeddings" -> Set("vec_id", "embedding", "label")
  )

  for ((name, cols) <- expected.toSeq.sortBy(_._1)) {
    test(s"canary: $name resolves every depended-on column and has rows") {
      val df = name match {
        case "events" => Tables.events(spark, sf)
        case other    => Tables.table(spark, sf, other)
      }
      val have = df.schema.fieldNames.toSet
      val missing = cols -- have
      assert(missing.isEmpty,
        s"$name.parquet no longer provides $missing (has: ${have.toSeq.sorted})")
      assert(df.limit(1).count() == 1, s"$name.parquet is empty")
    }
  }

  test("canary: key columns keep the dtypes the engine's driver code depends on") {
    // several operators pull these with getLong/getDouble on collected
    // rows — a silent int64→int32 (or double→decimal) regeneration would
    // throw at run time deep inside a query; fail it HERE by name instead
    val expectedTypes: Seq[(String, String, DataType)] = Seq(
      ("documents", "doc_id", LongType),
      ("documents", "n_chars", LongType),
      ("events", "event_id", LongType),
      ("events", "user_id", LongType),
      ("events", "value", DoubleType),
      ("embeddings", "vec_id", LongType),
      ("lineitem", "l_orderkey", LongType),
      ("lineitem", "l_quantity", DoubleType),
      ("orders", "o_totalprice", DoubleType))
    val bad = expectedTypes.flatMap { case (t, c, want) =>
      val got = Tables.table(spark, sf, t).schema(c).dataType
      if (got == want) None else Some(s"$t.$c: $got (engine expects $want)")
    }
    assert(bad.isEmpty, s"key dtypes drifted: ${bad.mkString("; ")}")
  }

  test("canary: events.ts normalizes to TimestampType whatever the file encodes") {
    val df = Tables.events(spark, sf)
    assert(df.schema("ts").dataType == TimestampType,
      s"Tables.events must yield TimestampType ts, got ${df.schema("ts").dataType}")
    // sane epoch range (post-1970, pre-2100): catches a silently wrong
    // unit conversion (the µs-read-as-ns bug collapsed all of history
    // into 1970) even when the dtype itself is right
    val ms = df.selectExpr("min(unix_millis(ts))", "max(unix_millis(ts))").head()
    assert(ms.getLong(0) > 0L, s"events.ts min epoch-ms ${ms.getLong(0)} — unit drift?")
    assert(ms.getLong(1) < 4102444800000L,
      s"events.ts max epoch-ms ${ms.getLong(1)} — unit drift?")
  }

  test("canary: embeddings.embedding is an array of floats") {
    val dt = Tables.embeddings(spark, sf).schema("embedding").dataType
    dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => ()
      case other => fail(s"embeddings.embedding drifted to $other")
    }
  }
}
