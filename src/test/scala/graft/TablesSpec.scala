package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Guards every test-table loader against physical-encoding drift in
  * the driver-generated parquet (the round-8 outage class: `events.ts`
  * silently changed from TIMESTAMP(NANOS) to TIMESTAMP(MICROS, NTZ)
  * and five gate queries went red with an opaque analysis error).
  *
  * Each loader is asserted to yield the LOGICAL schema the query suite
  * relies on, with failure messages naming the table, column, and
  * observed type — so a future regeneration fails ONE loader test with
  * an actionable message, not five opaque gate rows.
  */
class TablesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  // Integral key columns may ship as int32 or int64 across testdata
  // generations; queries only require them to be integral + joinable.
  private val Integral: Set[DataType] = Set(IntegerType, LongType)
  // Date-ish columns work as either instant or wall-clock timestamps in
  // the analytics queries (both hash-match the DuckDB oracle under a
  // UTC session), so accept both.
  private val AnyTimestamp: Set[DataType] = Set(TimestampType, TimestampNTZType)

  private def assertSchema(
      table: String,
      df: org.apache.spark.sql.DataFrame,
      expect: Seq[(String, Set[DataType])]): Unit = {
    val observed = df.schema.map(f => f.name -> f.dataType).toMap
    expect.foreach { case (col, oneOf) =>
      val got = observed.getOrElse(col, fail(
        s"$sf/$table.parquet: column `$col` missing; observed schema: " +
          df.schema.treeString))
      assert(oneOf.contains(got),
        s"$sf/$table.parquet: column `$col` has type $got, queries need one of " +
          oneOf.mkString("{", ", ", "}"))
    }
    assert(df.count() > 0, s"$sf/$table.parquet: empty table")
  }

  test("region/nation load with integral keys and names") {
    assertSchema("region", Tables.region(spark, sf), Seq(
      "r_regionkey" -> Integral, "r_name" -> Set(StringType)))
    assertSchema("nation", Tables.nation(spark, sf), Seq(
      "n_nationkey" -> Integral, "n_name" -> Set(StringType),
      "n_regionkey" -> Integral))
  }

  test("customer/supplier load with keys, balances, segment") {
    assertSchema("customer", Tables.customer(spark, sf), Seq(
      "c_custkey" -> Integral, "c_name" -> Set(StringType),
      "c_nationkey" -> Integral, "c_acctbal" -> Set(DoubleType),
      "c_mktsegment" -> Set(StringType)))
    assertSchema("supplier", Tables.supplier(spark, sf), Seq(
      "s_suppkey" -> Integral, "s_name" -> Set(StringType),
      "s_nationkey" -> Integral, "s_acctbal" -> Set(DoubleType)))
  }

  test("part loads with brand/type/size/price") {
    assertSchema("part", Tables.part(spark, sf), Seq(
      "p_partkey" -> Integral, "p_name" -> Set(StringType),
      "p_brand" -> Set(StringType), "p_type" -> Set(StringType),
      "p_size" -> Integral, "p_retailprice" -> Set(DoubleType)))
  }

  test("orders/lineitem load with date columns of a timestamp type") {
    assertSchema("orders", Tables.orders(spark, sf), Seq(
      "o_orderkey" -> Integral, "o_custkey" -> Integral,
      "o_orderstatus" -> Set(StringType), "o_totalprice" -> Set(DoubleType),
      "o_orderdate" -> AnyTimestamp, "o_orderpriority" -> Set(StringType)))
    assertSchema("lineitem", Tables.lineitem(spark, sf), Seq(
      "l_orderkey" -> Integral, "l_partkey" -> Integral,
      "l_suppkey" -> Integral, "l_linenumber" -> Integral,
      "l_quantity" -> Set(DoubleType), "l_extendedprice" -> Set(DoubleType),
      "l_discount" -> Set(DoubleType), "l_tax" -> Set(DoubleType),
      "l_returnflag" -> Set(StringType), "l_linestatus" -> Set(StringType),
      "l_shipdate" -> AnyTimestamp))
  }

  test("events loader normalizes ts to a session-zone TIMESTAMP") {
    // The time-series operators (sessionize, as-of join, resample) and
    // their DuckDB oracles require an exact instant type, not NTZ —
    // the loader must normalize whatever the file ships.
    assertSchema("events", Tables.events(spark, sf), Seq(
      "event_id" -> Integral, "ts" -> Set[DataType](TimestampType),
      "user_id" -> Integral, "event_type" -> Set(StringType),
      "value" -> Set(DoubleType), "props" -> Set(StringType)))
  }

  test("documents/embeddings load with text and vector columns") {
    assertSchema("documents", Tables.documents(spark, sf), Seq(
      "doc_id" -> Integral, "text" -> Set(StringType),
      "lang" -> Set(StringType), "source" -> Set(StringType),
      "n_chars" -> Integral))
    assertSchema("embeddings", Tables.embeddings(spark, sf), Seq(
      "vec_id" -> Integral,
      "embedding" -> Set[DataType](ArrayType(FloatType), ArrayType(FloatType, false)),
      "label" -> Integral))
  }

  test("events ts values are exact microsecond instants (UTC session)") {
    import org.apache.spark.sql.functions._
    val df = Tables.events(spark, sf)
    // sanity: values land in the generator's era, not 1970 or a
    // nanos-misread year like +56xxx
    val bounds = df.agg(min("ts").cast("string"), max("ts").cast("string"))
      .collect()(0)
    val minYear = bounds.getString(0).take(4).toInt
    val maxYear = bounds.getString(1).take(4).toInt
    assert(minYear >= 1990 && maxYear <= 2100,
      s"events.ts out of plausible range: ${bounds.getString(0)} .. ${bounds.getString(1)} " +
        "(a nanos/micros unit mix-up lands centuries away)")
  }
}
