package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** The per-table schema contract (`Tables.contract` / `Tables.conform`):
  * round 6 lost an entire round to ONE table's silent physical-type drift
  * (`events.ts` ns→µs), so every table now declares its expected logical
  * types and `Tables.load` either adapts value-preservingly or fails with
  * one loud error naming table/column/types.
  *
  * Drifted fixtures are built in-memory at the DECODED shape (a ns-typed
  * parquet column decodes as BIGINT under `nanosAsLong` — the Long cases
  * here are exactly what the reader hands conform), plus one real parquet
  * round-trip for the decimal→double case.
  */
class TablesContractSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private val sfDir = "/root/testdata/sf0.001"

  test("contract covers all 10 tables and load is a no-op on undrifted testdata") {
    assert(Tables.contract.keySet == Tables.names.toSet)
    Tables.names.foreach { n =>
      val got = Tables.load(spark, sfDir, n).schema
        .map(f => f.name -> f.dataType).toMap
      Tables.contract(n).foreach { case (col, expected) =>
        assert(got(col) == expected,
          s"$n.$col decoded as ${got(col)}, contract says $expected")
      }
    }
  }

  test("integral widening drift (int custkey) adapts to LongType with values intact") {
    val drifted = spark.createDataFrame(
      java.util.List.of(Row(7, "c7", 3, 10.5, "SEG")),
      StructType(Seq(
        StructField("c_custkey", IntegerType), StructField("c_name", StringType),
        StructField("c_nationkey", IntegerType), StructField("c_acctbal", DoubleType),
        StructField("c_mktsegment", StringType))))
    val out = Tables.conform("customer", drifted)
    assert(out.schema("c_custkey").dataType == LongType)
    assert(out.head().getLong(0) == 7L)
  }

  test("integral narrowing drift (long nationkey) adapts to IntegerType") {
    val drifted = spark.createDataFrame(
      java.util.List.of(Row(7L, "c7", 3L, 10.5, "SEG")),
      StructType(Seq(
        StructField("c_custkey", LongType), StructField("c_name", StringType),
        StructField("c_nationkey", LongType), StructField("c_acctbal", DoubleType),
        StructField("c_mktsegment", StringType))))
    val out = Tables.conform("customer", drifted)
    assert(out.schema("c_nationkey").dataType == IntegerType)
    assert(out.head().getInt(2) == 3)
  }

  test("decimal→double drift adapts via a real parquet round-trip through load") {
    val dir = java.nio.file.Files.createTempDirectory("contract").toString
    val dec = spark.createDataFrame(
      java.util.List.of(Row(1L, "c1", 0, new java.math.BigDecimal("12.34"), "SEG")),
      StructType(Seq(
        StructField("c_custkey", LongType), StructField("c_name", StringType),
        StructField("c_nationkey", IntegerType),
        StructField("c_acctbal", DecimalType(12, 2)),
        StructField("c_mktsegment", StringType))))
    dec.write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val out = Tables.load(spark, dir, "customer")
    assert(out.schema("c_acctbal").dataType == DoubleType)
    assert(out.head().getDouble(3) == 12.34)
  }

  test("ns-long ts drift (the round-6 incident shape) adapts to TIMESTAMP at µs floor") {
    val ns = 1700000000123456789L
    val drifted = spark.createDataFrame(
      java.util.List.of(Row(1L, ns, 5L, "click", 1.0, "{}")),
      StructType(Seq(
        StructField("event_id", LongType), StructField("ts", LongType),
        StructField("user_id", LongType), StructField("event_type", StringType),
        StructField("value", DoubleType), StructField("props", StringType))))
    val out = Tables.conform("events", drifted)
    assert(out.schema("ts").dataType == TimestampType)
    val micros = out.select(unix_micros(col("ts"))).head().getLong(0)
    assert(micros == ns / 1000)
  }

  test("TZ-timestamp drift on an NTZ-contract column casts wall-clock-preserving") {
    val drifted = spark.sql(
      "SELECT 1L AS o_orderkey, 2L AS o_custkey, 'O' AS o_orderstatus, " +
      "10.0 AS o_totalprice, timestamp'2024-03-01 12:00:00' AS o_orderdate, " +
      "'1-URGENT' AS o_orderpriority")
    val out = Tables.conform("orders", drifted)
    assert(out.schema("o_orderdate").dataType == TimestampNTZType)
    assert(out.select(date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss"))
      .head().getString(0) == "2024-03-01 12:00:00")
  }

  test("ns-long drift on an NTZ-contract column (l_shipdate) adapts too") {
    val ns = 1690000000000000000L
    val one = spark.range(1).select(
      col("id").as("l_orderkey"), col("id").as("l_partkey"),
      col("id").as("l_suppkey"), lit(1).as("l_linenumber"),
      lit(1.0).as("l_quantity"), lit(1.0).as("l_extendedprice"),
      lit(0.0).as("l_discount"), lit(0.0).as("l_tax"),
      lit("N").as("l_returnflag"), lit("O").as("l_linestatus"),
      lit(ns).as("l_shipdate"))
    val out = Tables.conform("lineitem", one)
    assert(out.schema("l_shipdate").dataType == TimestampNTZType)
    assert(out.select(unix_micros(col("l_shipdate").cast(TimestampType)))
      .head().getLong(0) == ns / 1000)
  }

  test("embedding element drift (array<double>) adapts to array<float>") {
    val drifted = spark.createDataFrame(
      java.util.List.of(Row(1L, java.util.List.of(0.5, 0.25), 0)),
      StructType(Seq(
        StructField("vec_id", LongType),
        StructField("embedding", ArrayType(DoubleType)),
        StructField("label", IntegerType))))
    val out = Tables.conform("embeddings", drifted)
    assert(out.schema("embedding").dataType == ArrayType(FloatType, containsNull = true))
    assert(out.select(element_at(col("embedding"), 1)).head().getFloat(0) == 0.5f)
  }

  test("non-adaptable drift fails loudly naming table, column, and both types") {
    val drifted = spark.range(1).select(
      col("id").as("doc_id"), col("id").as("text"), // BIGINT where STRING expected
      lit("en").as("lang"), lit("web").as("source"), lit(10L).as("n_chars"))
    val e = intercept[Tables.SchemaDriftException](Tables.conform("documents", drifted))
    assert(e.getMessage.contains("table=documents"))
    assert(e.getMessage.contains("column=text"))
    assert(e.getMessage.contains("expected=STRING"))
    assert(e.getMessage.contains("actual=BIGINT"))
  }

  test("missing contract column fails loudly as MISSING") {
    val drifted = spark.range(1).select(col("id").as("r_regionkey"))
    val e = intercept[Tables.SchemaDriftException](Tables.conform("region", drifted))
    assert(e.getMessage.contains("table=region"))
    assert(e.getMessage.contains("column=r_name"))
    assert(e.getMessage.contains("actual=MISSING"))
  }

  test("extra non-contract columns pass through untouched") {
    val extra = spark.range(1).select(
      col("id").cast(IntegerType).as("r_regionkey"),
      lit("EUROPE").as("r_name"), lit(42L).as("r_comment_extra"))
    val out = Tables.conform("region", extra)
    assert(out.columns.toSeq == Seq("r_regionkey", "r_name", "r_comment_extra"))
    assert(out.head().getLong(2) == 42L)
  }
}
