package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Core analytics operators over the TPC-H-ish tables: scan, filter,
  * projection, hash/broadcast joins, semi/anti joins, aggregation,
  * windowing, sort/limit. Declarative DataFrame plans throughout so
  * Catalyst performs pushdown, pruning, join selection and AQE.
  *
  * Scale notes (100 TB): every join below either broadcasts a
  * dimension table (nation/region/supplier/part/customer are orders of
  * magnitude smaller than the fact tables) or shuffles on the join key
  * that the downstream aggregation also groups on, so the exchange is
  * reused; aggregates are all partial-aggregatable (map-side combine).
  */
object Analytics {

  private def ts(s: String): Column = to_timestamp(lit(s))

  /** Exact integer cents of a money value stored as double, via ONE
    * explicit `round(x·100)`: both engines multiply the identical IEEE
    * double by 100 and round the identical product half-away-from-zero
    * (the proven q17/q45 shape), then the BIGINT cast of an integral
    * double is exact on both. The SQL text is valid verbatim in Spark
    * AND DuckDB, so every gate query computes the identical integer on
    * both sides; no engine float ever crosses the gate (the r12
    * migration of the HASH-FRAGILE class — every driver hash-red in
    * rounds 5-11 came from engine-computed float outputs).
    *
    * Deliberately NOT `CAST(x AS DECIMAL(18,2)) * 100`: Spark's
    * double→decimal cast rounds the SHORTEST DECIMAL STRING of the
    * double while DuckDB rounds the binary value, so a corpus
    * regenerated with 3+ decimal digits (e.g. 2.675, binary
    * 2.67499999…) would diverge by one cent — `round` keeps both
    * engines on the binary value for ANY input.
    */
  private[queries] def centsSql(c: String): String =
    s"CAST(round($c * 100) AS BIGINT)"

  /** The e6 sibling of [[centsSql]] as a Column: one explicit
    * `round(x·10⁶)` into BIGINT — for engine-computed ratios/quantiles
    * where both engines derived the identical IEEE double (positive
    * domain: Spark HALF_UP == DuckDB away-from-zero).
    */
  private[queries] def e6(c: Column): Column =
    round(c * 1000000).cast("long")

  /** TPC-H Q1-style pricing summary: full-scan partial aggregation.
    * All money outputs in exact integer units (cents / e4 / e6 — see
    * [[centsSql]]): sums are integer sums, averages are integer-scaled
    * truncating divisions — bit-identical on any corpus by
    * construction. At 100 TB swap the BIGINT product sums for
    * DECIMAL(38,0) accumulators (row values here stay < 2^40 and row
    * counts < 2^20 at gate SFs, far from overflow).
    */
  def q1PricingSummary(spark: SparkSession, d: String): DataFrame = {
    val qc = centsSql("l_quantity"); val pc = centsSql("l_extendedprice")
    val dc = centsSql("l_discount"); val tc = centsSql("l_tax")
    Tables.lineitem(spark, d)
      .filter(col("l_shipdate") <= ts("1998-09-01"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        expr(s"sum($qc)").as("sum_qty_c"),
        expr(s"sum($pc)").as("sum_base_price_c"),
        expr(s"sum($pc * (100 - $dc))").as("sum_disc_price_e4"),
        expr(s"sum($pc * (100 - $dc) * (100 + $tc))").as("sum_charge_e6"),
        expr(s"(sum($qc) * 10000) div count(1)").as("avg_qty_e6"),
        expr(s"(sum($pc) * 10000) div count(1)").as("avg_price_e6"),
        expr(s"(sum($dc) * 10000) div count(1)").as("avg_disc_e6"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val q1Sql: String = {
    val qc = centsSql("l_quantity"); val pc = centsSql("l_extendedprice")
    val dc = centsSql("l_discount"); val tc = centsSql("l_tax")
    s"""WITH c AS (
      |  SELECT l_returnflag, l_linestatus,
      |    $qc AS qc, $pc AS pc, $dc AS dc, $tc AS tc
      |  FROM lineitem
      |  WHERE l_shipdate <= TIMESTAMP '1998-09-01')
      |SELECT l_returnflag, l_linestatus,
      |  CAST(sum(qc) AS BIGINT) AS sum_qty_c,
      |  CAST(sum(pc) AS BIGINT) AS sum_base_price_c,
      |  CAST(sum(pc * (100 - dc)) AS BIGINT) AS sum_disc_price_e4,
      |  CAST(sum(pc * (100 - dc) * (100 + tc)) AS BIGINT) AS sum_charge_e6,
      |  CAST((sum(qc) * 10000) // count(*) AS BIGINT) AS avg_qty_e6,
      |  CAST((sum(pc) * 10000) // count(*) AS BIGINT) AS avg_price_e6,
      |  CAST((sum(dc) * 10000) // count(*) AS BIGINT) AS avg_disc_e6,
      |  count(*) AS count_order
      |FROM c
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin
  }

  /** Hierarchical rollup: part counts and retail value by brand and
    * type with subtotal rows (GROUPING SETS / ROLLUP). Partial
    * aggregation applies at every grouping level — scale-safe.
    */
  def q2PartRollup(spark: SparkSession, d: String): DataFrame =
    Tables.part(spark, d)
      .rollup(col("p_brand"), col("p_type"))
      .agg(count(lit(1)).as("n_parts"),
           // exact decimal accumulation, then a representation-stable
           // STRING for the dumped output: the driver hash is sensitive
           // to the decimal's physical parquet encoding (Spark writes
           // FIXED_LEN_BYTE_ARRAY, DuckDB INT64/INT128 pages), so both
           // sides emit the identical plain decimal string instead
           sum(col("p_retailprice").cast("decimal(24,2)"))
             .cast("decimal(38,2)").cast("string").as("retail_value"))
      .orderBy(asc_nulls_first("p_brand"), asc_nulls_first("p_type"))

  val q2Sql: String =
    """SELECT p_brand, p_type, count(*) AS n_parts,
      |  CAST(CAST(sum(CAST(p_retailprice AS DECIMAL(24,2))) AS DECIMAL(38,2)) AS VARCHAR) AS retail_value
      |FROM part
      |GROUP BY ROLLUP (p_brand, p_type)
      |ORDER BY p_brand NULLS FIRST, p_type NULLS FIRST""".stripMargin

  /** TPC-H Q6-style: tight range filter + global aggregate. The filter
    * is pushed to the parquet scan (row-group skipping on l_shipdate).
    */
  def q6ForecastRevenue(spark: SparkSession, d: String): DataFrame =
    Tables.lineitem(spark, d)
      .filter(col("l_shipdate") >= ts("1996-01-01") &&
              col("l_shipdate") < ts("1997-01-01") &&
              col("l_discount").between(0.05, 0.07) &&
              col("l_quantity") < 24)
      .agg(expr(s"sum(${centsSql("l_extendedprice")} * " +
             s"${centsSql("l_discount")})").as("revenue_e4"),
           count(lit(1)).as("n_rows"))

  val q6Sql: String =
    s"""SELECT CAST(sum(${centsSql("l_extendedprice")} *
      |                ${centsSql("l_discount")}) AS BIGINT) AS revenue_e4,
      |  count(*) AS n_rows
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07
      |  AND l_quantity < 24""".stripMargin

  /** TPC-H Q3-style shipping priority: 3-way join, aggregate, top-N.
    * orders⋈lineitem shuffles on orderkey, which the groupBy reuses;
    * join strategy for customer is left to AQE (broadcast at small SF,
    * shuffle-hash beyond the broadcast threshold).
    */
  def q3ShippingPriority(spark: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(spark, d).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(spark, d).filter(col("o_orderdate") < ts("1995-03-15"))
    val l = Tables.lineitem(spark, d).filter(col("l_shipdate") > ts("1995-03-15"))
    // no broadcast hint on customer: it grows with SF, so let AQE pick
    // broadcast only when the filtered side is actually small.
    // revenue in exact integer e4 units (cents × (100 − discount
    // cents), [[centsSql]]): the top-10 ORDER BY compares exact
    // integers, so the selected set is corpus-independent-deterministic
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(expr(s"sum(${centsSql("l_extendedprice")} * " +
        s"(100 - ${centsSql("l_discount")}))").as("revenue_e4"))
      .orderBy(col("revenue_e4").desc, col("l_orderkey").asc)
      .limit(10)
  }

  val q3Sql: String =
    s"""SELECT l_orderkey, o_orderdate,
      |  CAST(sum(${centsSql("l_extendedprice")} *
      |           (100 - ${centsSql("l_discount")})) AS BIGINT) AS revenue_e4
      |FROM customer, orders, lineitem
      |WHERE c_mktsegment = 'BUILDING'
      |  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND o_orderdate < TIMESTAMP '1995-03-15'
      |  AND l_shipdate > TIMESTAMP '1995-03-15'
      |GROUP BY l_orderkey, o_orderdate
      |ORDER BY revenue_e4 DESC, l_orderkey ASC
      |LIMIT 10""".stripMargin

  /** TPC-H Q4-style: EXISTS as a left-semi join, then aggregate. */
  def q4OrderPriority(spark: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(spark, d)
      .filter(col("o_orderdate") >= ts("1996-01-01") && col("o_orderdate") < ts("1997-01-01"))
    val l = Tables.lineitem(spark, d).filter(col("l_discount") > 0.05)
      .select(col("l_orderkey").as("o_orderkey"))
    o.join(l, Seq("o_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  val q4Sql: String =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_discount > 0.05)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** TPC-H Q5-style revenue by nation: fact table joined to the
    * dimension chain supplier→nation→region; fixed-size dims are
    * broadcast, supplier's strategy is AQE-chosen.
    */
  def q5RevenueByNation(spark: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitem(spark, d)
    val s = Tables.supplier(spark, d)
    val n = Tables.nation(spark, d)
    val r = Tables.region(spark, d)
    // supplier grows with SF — no forced broadcast (AQE decides);
    // nation (25) and region (5) are fixed-size, always broadcastable
    l.join(s, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(expr(s"sum(${centsSql("l_extendedprice")} * " +
             s"(100 - ${centsSql("l_discount")}))").as("revenue_e4"),
           count(lit(1)).as("n_items"))
      .orderBy("r_name", "n_name")
  }

  val q5Sql: String =
    s"""SELECT r_name, n_name,
      |  CAST(sum(${centsSql("l_extendedprice")} *
      |           (100 - ${centsSql("l_discount")})) AS BIGINT) AS revenue_e4,
      |  count(*) AS n_items
      |FROM lineitem, supplier, nation, region
      |WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
      |  AND n_regionkey = r_regionkey
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin

  /** Calendar aggregation: orders per month (date_trunc rollup). */
  def q7MonthlyOrders(spark: SparkSession, d: String): DataFrame =
    Tables.orders(spark, d)
      .groupBy(date_trunc("month", col("o_orderdate")).as("order_month"))
      .agg(count(lit(1)).as("n_orders"),
           expr(s"sum(${centsSql("o_totalprice")})").as("total_price_c"))
      .orderBy("order_month")

  val q7Sql: String =
    s"""SELECT date_trunc('month', o_orderdate) AS order_month,
      |  count(*) AS n_orders,
      |  CAST(sum(${centsSql("o_totalprice")}) AS BIGINT) AS total_price_c
      |FROM orders
      |GROUP BY 1
      |ORDER BY order_month""".stripMargin

  /** Window functions: top-3 customers by balance per market segment
    * (rank over partition, deterministic tie-break on key).
    */
  def q8TopCustomers(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
    Tables.customer(spark, d)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      // ranked by the raw double (its order == the cents order), but
      // the gate output carries exact integer cents ([[centsSql]])
      .select(col("c_mktsegment"), col("rk"), col("c_custkey"),
        expr(centsSql("c_acctbal")).as("acctbal_c"))
      .orderBy("c_mktsegment", "rk")
  }

  val q8Sql: String =
    s"""SELECT c_mktsegment, rk, c_custkey,
      |  ${centsSql("c_acctbal")} AS acctbal_c FROM (
      |  SELECT c_mktsegment, c_custkey, c_acctbal,
      |    row_number() OVER (PARTITION BY c_mktsegment
      |                       ORDER BY c_acctbal DESC, c_custkey ASC) AS rk
      |  FROM customer) t
      |WHERE rk <= 3
      |ORDER BY c_mktsegment, rk""".stripMargin

  /** Anti join: customers with no orders in the first year, counted by
    * segment (NOT EXISTS as a left-anti join).
    */
  def q9CustomersNoOrders(spark: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(spark, d)
    val o = Tables.orders(spark, d)
      .filter(col("o_orderdate") < ts("1996-01-01"))
      .select(col("o_custkey").as("c_custkey"))
    c.join(o, Seq("c_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy("c_mktsegment")
  }

  val q9Sql: String =
    """SELECT c_mktsegment, count(*) AS n_customers
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |                  AND o_orderdate < TIMESTAMP '1996-01-01')
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  /** Event-stream rollup: per event type stats over the events table. */
  def q10EventStats(spark: SparkSession, d: String): DataFrame =
    Tables.events(spark, d)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
           countDistinct(col("user_id")).as("n_users"),
           // decimal sum: exact, summation-order-independent (a double
           // sum differs at the 1e-10 level between engines); emitted as
           // a plain STRING because the driver hash is sensitive to the
           // decimal's physical parquet encoding, not just its value
           sum(col("value").cast("decimal(24,6)")).cast("decimal(38,6)")
             .cast("string").as("sum_value"),
           // extremes as exact integer cents ([[centsSql]]): min/max of
           // cents == cents of min/max (monotone), and no raw double
           // crosses the gate
           expr(s"min(${centsSql("value")})").as("min_value_c"),
           expr(s"max(${centsSql("value")})").as("max_value_c"))
      .orderBy("event_type")

  val q10Sql: String =
    s"""SELECT event_type, count(*) AS n_events,
      |  count(DISTINCT user_id) AS n_users,
      |  CAST(CAST(sum(CAST(value AS DECIMAL(24,6))) AS DECIMAL(38,6)) AS VARCHAR) AS sum_value,
      |  min(${centsSql("value")}) AS min_value_c,
      |  max(${centsSql("value")}) AS max_value_c
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** Running windows over a time-ordered stream: per-user cumulative
    * event value plus lag delta (time-series style window frame).
    */
  def q11UserRunning(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, d)
      .withColumn("running_value",
        // exact decimal running sum, emitted as a STRING so the dumped
        // parquet encoding matches the DuckDB oracle byte-for-byte
        sum(col("value").cast("decimal(24,6)"))
          .over(w.rowsBetween(Window.unboundedPreceding, 0))
          .cast("decimal(38,6)").cast("string"))
      // current and lagged value as exact integer cents ([[centsSql]])
      .withColumn("value_c", expr(Analytics.centsSql("value")))
      .withColumn("prev_value_c", lag(col("value_c"), 1).over(w))
      .select(col("event_id"), col("user_id"), col("value_c"),
              col("running_value"), col("prev_value_c"))
      .orderBy("user_id", "event_id")
  }

  val q11Sql: String =
    s"""SELECT event_id, user_id,
      |  ${centsSql("value")} AS value_c,
      |  CAST(CAST(sum(CAST(value AS DECIMAL(24,6)))
      |    OVER (PARTITION BY user_id ORDER BY ts, event_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |    AS DECIMAL(38,6)) AS VARCHAR) AS running_value,
      |  lag(${centsSql("value")}, 1)
      |    OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value_c
      |FROM events
      |ORDER BY user_id, event_id""".stripMargin

  /** EXISTS + NOT EXISTS composition: orders with a big-quantity line
    * but no deep-discount line, counted by priority (semi join then
    * anti join on the same key — the exchanges are reused).
    */
  def q22OrderProfile(spark: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(spark, d)
    val l = Tables.lineitem(spark, d)
    o.join(l.filter(col("l_quantity") > 45)
        .select(col("l_orderkey").as("o_orderkey")), Seq("o_orderkey"), "left_semi")
      .join(l.filter(col("l_discount") > 0.09)
        .select(col("l_orderkey").as("o_orderkey")), Seq("o_orderkey"), "left_anti")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")
  }

  val q22Sql: String =
    """SELECT o_orderpriority, count(*) AS n_orders
      |FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem
      |                  WHERE l_orderkey = o_orderkey AND l_discount > 0.09)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** Distinct aggregation: per market segment, customer count, distinct
    * nations, and balance extremes (as exact integer cents — see
    * [[centsSql]]).
    */
  def q23SegmentNations(spark: SparkSession, d: String): DataFrame =
    Tables.customer(spark, d)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_customers"),
        countDistinct(col("c_nationkey")).as("n_nations"),
        expr(s"min(${centsSql("c_acctbal")})").as("min_bal_c"),
        expr(s"max(${centsSql("c_acctbal")})").as("max_bal_c"))
      .orderBy("c_mktsegment")

  val q23Sql: String =
    s"""SELECT c_mktsegment, count(*) AS n_customers,
      |  count(DISTINCT c_nationkey) AS n_nations,
      |  min(${centsSql("c_acctbal")}) AS min_bal_c,
      |  max(${centsSql("c_acctbal")}) AS max_bal_c
      |FROM customer
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  /** Set operation: (brand, size) pairs in the small-size range not
    * mirrored (shifted by 30) in the large-size range (EXCEPT = set
    * difference with dedup).
    */
  def q12BrandExcept(spark: SparkSession, d: String): DataFrame = {
    val p = Tables.part(spark, d)
    p.filter(col("p_size") <= 10).select(col("p_brand"), col("p_size"))
      .except(p.filter(col("p_size") >= 40)
        .select(col("p_brand"), (col("p_size") - 30).as("p_size")))
      .orderBy("p_brand", "p_size")
  }

  val q12Sql: String =
    """SELECT p_brand, p_size FROM part WHERE p_size <= 10
      |EXCEPT
      |SELECT p_brand, p_size - 30 AS p_size FROM part WHERE p_size >= 40
      |ORDER BY p_brand, p_size""".stripMargin

  /** Semi-structured column handling: `events.props` is a JSON string;
    * parse it with a TYPED schema (`from_json`, codegen'd Jackson parse
    * in the scan projection — the Spark-first path for JSON columns,
    * no UDF, no driver round-trip) and aggregate the extracted field.
    * Malformed documents parse to NULL and fall into the NULL bucket
    * rather than failing the scan (PERMISSIVE mode, the 100-TB default:
    * one bad row must not kill a corpus-wide pass).
    */
  def q59JsonProps(spark: SparkSession, d: String): DataFrame = {
    val k = from_json(col("props"),
      org.apache.spark.sql.types.StructType.fromDDL("k BIGINT")).getField("k")
    Tables.events(spark, d)
      .select(col("event_type"), k.as("k"))
      .groupBy(col("event_type"), pmod(col("k"), lit(10L)).as("k_mod"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy("event_type", "k_mod")
  }

  val q59Sql: String =
    """SELECT event_type,
      |  CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_mod,
      |  count(*) AS n_events,
      |  CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  min(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
      |  max(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  /** RANGE-interval window frames (the time-based sibling of q11's
    * ROWS frames): per event, the count and exact-decimal sum of the
    * same user's values in the trailing 10 minutes of EVENT TIME —
    * peers at the same microsecond share one frame, which ROWS frames
    * cannot express. Single shuffle on the user key; frame math on
    * integer epoch-micros for engine parity.
    */
  def q64RangeWindow(spark: SparkSession, d: String): DataFrame = {
    val us = unix_micros(col("ts"))
    val w = Window.partitionBy(col("user_id")).orderBy(us)
      .rangeBetween(-600L * 1000000L, 0)
    Tables.events(spark, d)
      .select(col("user_id"), col("event_id"), us.as("ts_us"),
        count(lit(1)).over(w).as("n_10min"),
        sum(col("value").cast("decimal(24,6)")).over(w)
          .cast("decimal(38,6)").cast("string").as("sum_10min"))
      .orderBy("user_id", "ts_us", "event_id")
  }

  val q64Sql: String =
    """SELECT user_id, event_id, epoch_us(ts) AS ts_us,
      |  count(*) OVER w AS n_10min,
      |  CAST(CAST(sum(CAST(value AS DECIMAL(24,6))) OVER w AS DECIMAL(38,6)) AS VARCHAR) AS sum_10min
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
      |             RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, ts_us, event_id""".stripMargin

  /** PIVOT: event-type counts spread into one column per type, keyed
    * by user-id decile — Spark's `pivot` with an EXPLICIT value list
    * (the open-ended form scans twice to discover values and cannot
    * be planned in one pass at scale). Absent cells coalesce to 0.
    */
  def q65Pivot(spark: SparkSession, d: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val p = Tables.events(spark, d)
      .groupBy(pmod(col("user_id"), lit(10L)).as("user_mod"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
    p.select(col("user_mod") +:
        types.map(t => coalesce(col(t), lit(0L)).as(s"n_$t")): _*)
      .orderBy("user_mod")
  }

  val q65Sql: String = {
    val arms = Seq("click", "error", "purchase", "signup", "view")
      .map(t => s"count(CASE WHEN event_type = '$t' THEN 1 END) AS n_$t")
      .mkString(",\n      |  ")
    s"""SELECT user_id % 10 AS user_mod,
      |  $arms
      |FROM events
      |GROUP BY 1
      |ORDER BY 1""".stripMargin
  }

  /** ROLLUP with `grouping_id()`: the multi-granularity aggregate
    * (leaf / per-flag / grand total) in ONE pass — Spark plans one
    * Expand over the scan feeding a single partial-aggregatable
    * hash aggregate, instead of the three scans the UNION ALL
    * formulation costs at 100 TB. Sums ride an exact decimal cast so
    * float summation order can't smear the gate; NULL group markers
    * are coalesced to a sentinel (the data has no real NULL keys) so
    * row identity is representation-stable across engines.
    */
  def q66Rollup(spark: SparkSession, d: String): DataFrame =
    Tables.lineitem(spark, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().as("gid"),
        count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,2)"))
          .cast("decimal(38,2)").cast("string").as("sum_qty"))
      .select(col("gid"),
        coalesce(col("l_returnflag"), lit("(all)")).as("flag"),
        coalesce(col("l_linestatus"), lit("(all)")).as("status"),
        col("n"), col("sum_qty"))
      .orderBy("gid", "flag", "status")

  val q66Sql: String =
    """SELECT GROUPING(l_returnflag, l_linestatus) AS gid,
      |  coalesce(l_returnflag, '(all)') AS flag,
      |  coalesce(l_linestatus, '(all)') AS status,
      |  count(*) AS n,
      |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS VARCHAR) AS sum_qty
      |FROM lineitem
      |GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY gid, flag, status""".stripMargin

  /** EXACT quartiles per group — Spark's `percentile` (true
    * sort-based percentile, not the approx sketch) against DuckDB's
    * `quantile_cont`. Gate-safe because every input is an
    * integer-valued double and the probed fractions are dyadic
    * (.25/.5/.75): the linear interpolation `lo + (hi-lo)·f` is then
    * exact IEEE arithmetic on any engine — and the gate output scales
    * the exact quarter-step values into e2 integers
    * (`round(q·100)` is exact: quarters × 100 are whole numbers), so
    * no float crosses the gate even if a future corpus made the
    * interpolation inexact. At 100 TB the exact form costs a per-group
    * sort — swap to `percentile_approx` (t-digest-style,
    * partial-mergeable) when 1-ulp answers stop mattering.
    */
  def q67Percentile(spark: SparkSession, d: String): DataFrame =
    Tables.lineitem(spark, d)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        expr("CAST(round(percentile(l_quantity, 0.25) * 100) AS BIGINT)").as("q25_e2"),
        expr("CAST(round(percentile(l_quantity, 0.5) * 100) AS BIGINT)").as("q50_e2"),
        expr("CAST(round(percentile(l_quantity, 0.75) * 100) AS BIGINT)").as("q75_e2"))
      .orderBy("l_returnflag")

  val q67Sql: String =
    """SELECT l_returnflag, count(*) AS n,
      |  CAST(round(quantile_cont(l_quantity, 0.25) * 100) AS BIGINT) AS q25_e2,
      |  CAST(round(quantile_cont(l_quantity, 0.50) * 100) AS BIGINT) AS q50_e2,
      |  CAST(round(quantile_cont(l_quantity, 0.75) * 100) AS BIGINT) AS q75_e2
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** Skew-salted fact/dimension join ([[graft.operators.Skew]]):
    * lineitem→orders salted on the line number, then aggregated by
    * priority. The gate proves pair-exactness — the salted plan must
    * reproduce the plain join's row multiset bit-for-bit (each match
    * meets in exactly one salt cell), a property independent of the
    * salt count, so the gate uses salts=4 (the smallest value that
    * still demonstrably spreads a hot key; SkewSpec pins the spread,
    * the plan mechanics, and equality with AQE's runtime skew split).
    */
  def q68SaltedJoin(spark: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(spark, d)
      .select(col("l_orderkey").as("okey"), col("l_linenumber"),
        col("l_quantity"))
    val ords = Tables.orders(spark, d)
      .select(col("o_orderkey").as("okey"), col("o_orderpriority"))
    graft.operators.Skew.saltedEquiJoin(li, ords, "okey",
        col("l_linenumber"), salts = 4)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,2)"))
          .cast("decimal(38,2)").cast("string").as("sum_qty"))
      .orderBy("o_orderpriority")
  }

  val q68Sql: String =
    """SELECT o_orderpriority, count(*) AS n,
      |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS VARCHAR) AS sum_qty
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** Bucketed co-located join ([[graft.operators.Bucketed]]): orders
    * and customer written as 8-bucket hash-clustered tables on their
    * custkeys, then joined WITHOUT a shuffle on either side (the
    * zero-Exchange plan is asserted in BucketedSpec; this gate pins
    * that the pre-shuffled path is RESULT-identical to the plain
    * join). The write is the gate's fixture step — at 100 TB it's the
    * one-time layout investment that every later fact⋈dim run
    * amortizes.
    */
  def q75BucketedJoin(spark: SparkSession, d: String): DataFrame = {
    val db = "graft_buckets"
    if (!spark.catalog.databaseExists(db)) {
      val loc = java.nio.file.Files.createTempDirectory("graft-q75-wh")
      spark.sql(s"CREATE DATABASE $db LOCATION '$loc'")
    }
    graft.operators.Bucketed.writeBucketed(
      Tables.orders(spark, d)
        .select("o_orderkey", "o_custkey", "o_totalprice"),
      s"$db.orders_b", "o_custkey", buckets = 8)
    graft.operators.Bucketed.writeBucketed(
      Tables.customer(spark, d).select("c_custkey", "c_mktsegment"),
      s"$db.customer_b", "c_custkey", buckets = 8)
    graft.operators.Bucketed.cojoin(spark,
        s"$db.orders_b", s"$db.customer_b", "o_custkey", "c_custkey")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(24,2)"))
          .cast("decimal(38,2)").cast("string").as("revenue"))
      .orderBy("c_mktsegment")
  }

  val q75Sql: String =
    """SELECT c_mktsegment, count(*) AS n_orders,
      |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(24,2))) AS DECIMAL(38,2)) AS VARCHAR) AS revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  /** Integer fixed-point PageRank ([[graft.operators.PageRank]]) over
    * the nation-to-nation trade graph (customer nation → supplier
    * nation, weighted by lineitem count — a 4-way join builds the edge
    * list), 5 damped iterations. Every division is a positive-long
    * floor, so the whole trajectory is exact and the oracle replays
    * all 5 iterations as chained CTEs.
    */
  def q76PageRank(spark: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(spark, d).select("l_orderkey", "l_suppkey")
    val ords = Tables.orders(spark, d).select("o_orderkey", "o_custkey")
    val cust = Tables.customer(spark, d).select("c_custkey", "c_nationkey")
    val supp = Tables.supplier(spark, d).select("s_suppkey", "s_nationkey")
    val nat = Tables.nation(spark, d).select("n_nationkey", "n_name")
    val edges = li
      .join(ords, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(nat.select(col("n_nationkey").as("cnk"),
        col("n_name").as("src")), col("c_nationkey") === col("cnk"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(nat.select(col("n_nationkey").as("snk"),
        col("n_name").as("dst")), col("s_nationkey") === col("snk"))
      .groupBy("src", "dst").agg(count(lit(1)).as("w"))
    graft.operators.PageRank.ranks(edges, iters = 5).orderBy("v")
  }

  val q76Sql: String = {
    val iter = (prev: String, cur: String) =>
      s"""$cur AS (SELECT nodes.v,
         |  CAST(15000000000000 // (100 * nn.n) AS BIGINT)
         |  + CAST((85 * coalesce(s.m, 0)) // 100 AS BIGINT) AS r
         |  FROM nodes CROSS JOIN nn
         |  LEFT JOIN (SELECT e.dst AS v,
         |      sum(CAST((p.r * e.w) // ow.ow AS BIGINT)) AS m
         |    FROM e JOIN $prev p ON e.src = p.v
         |    JOIN outw ow ON ow.src = e.src
         |    GROUP BY e.dst) s ON s.v = nodes.v)""".stripMargin
    val iters = (1 to 5)
      .map(i => iter(s"r${i - 1}", s"r$i")).mkString(",\n")
    s"""WITH e AS (
       |  SELECT cn.n_name AS src, sn.n_name AS dst, count(*) AS w
       |  FROM lineitem l
       |  JOIN orders o ON l.l_orderkey = o.o_orderkey
       |  JOIN customer c ON o.o_custkey = c.c_custkey
       |  JOIN nation cn ON c.c_nationkey = cn.n_nationkey
       |  JOIN supplier sup ON l.l_suppkey = sup.s_suppkey
       |  JOIN nation sn ON sup.s_nationkey = sn.n_nationkey
       |  GROUP BY 1, 2),
       |nodes AS (SELECT src AS v FROM e UNION SELECT dst FROM e),
       |nn AS (SELECT count(*) AS n FROM nodes),
       |outw AS (SELECT src, sum(w) AS ow FROM e GROUP BY src),
       |r0 AS (SELECT v, CAST(1000000000000 // nn.n AS BIGINT) AS r
       |       FROM nodes CROSS JOIN nn),
       |$iters
       |SELECT v, r AS rank_e12 FROM r5 ORDER BY v""".stripMargin
  }

  /** CUBE: all four grouping granularities of (returnflag, ship-year)
    * — leaf, per-flag, per-year, grand total — in ONE pass.
    * Like q66's ROLLUP, Spark plans a single Expand feeding one
    * partial-aggregatable hash aggregate, vs the 4 scans a UNION ALL
    * costs at 100 TB; CUBE's extra cross-marginal (per-year) is the
    * grouping-set q66 cannot produce. Decimal-exact sums, sentinel
    * labels for NULL group markers.
    */
  def q82Cube(spark: SparkSession, d: String): DataFrame =
    Tables.lineitem(spark, d)
      .cube(col("l_returnflag"), year(col("l_shipdate")).as("ship_year"))
      .agg(grouping_id().as("gid"),
        count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,2)"))
          .cast("decimal(38,2)").cast("string").as("sum_qty"))
      .select(col("gid"),
        coalesce(col("l_returnflag"), lit("(all)")).as("flag"),
        coalesce(col("ship_year").cast("string"), lit("(all)")).as("yr"),
        col("n"), col("sum_qty"))
      .orderBy("gid", "flag", "yr")

  val q82Sql: String =
    """SELECT GROUPING(l_returnflag, year(l_shipdate)) AS gid,
      |  coalesce(l_returnflag, '(all)') AS flag,
      |  coalesce(CAST(year(l_shipdate) AS VARCHAR), '(all)') AS yr,
      |  count(*) AS n,
      |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS VARCHAR) AS sum_qty
      |FROM lineitem
      |GROUP BY CUBE(l_returnflag, year(l_shipdate))
      |ORDER BY gid, flag, yr""".stripMargin

  /** UNPIVOT (melt): q65's wide per-type counts folded back to long
    * (user_mod, event_col, n) rows with Spark's native `unpivot` — a
    * zero-shuffle Expand over the aggregated frame, NOT a 5-way
    * UNION ALL re-scan. Wide cells are coalesced to 0 first because
    * unpivot-then-drop-NULL semantics differ across engines; with no
    * NULLs both agree.
    */
  def q83Unpivot(spark: SparkSession, d: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val wide = Tables.events(spark, d)
      .groupBy(pmod(col("user_id"), lit(10L)).as("user_mod"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
    val filled = wide.select(col("user_mod") +:
      types.map(t => coalesce(col(t), lit(0L)).as(s"n_$t")): _*)
    filled.unpivot(
        Array(col("user_mod")),
        types.map(t => col(s"n_$t")).toArray,
        "event_col", "n")
      .orderBy("user_mod", "event_col")
  }

  val q83Sql: String = {
    val arms = Seq("click", "error", "purchase", "signup", "view")
      .map(t =>
        s"""SELECT user_id % 10 AS user_mod, 'n_$t' AS event_col,
           |  count(CASE WHEN event_type = '$t' THEN 1 END) AS n
           |FROM events GROUP BY 1""".stripMargin)
      .mkString("\nUNION ALL\n")
    s"""$arms
       |ORDER BY user_mod, event_col""".stripMargin
  }

  /** Navigation + distribution window functions in one pass: per
    * priority class over (orderdate, orderkey) order — lag/lead of the
    * order key, ntile(4) quartile bucket, plus rank/dense_rank and
    * e6-scaled percent_rank/cume_dist computed over orderDATE alone so
    * real ties exercise the tie semantics (equal dates share a rank
    * and a cume_dist, deterministically on any engine). One shuffle on
    * the partition key serves all seven functions — at 100 TB the
    * win is exactly this sharing: N window functions, one sort.
    * percent_rank/cume_dist are ratios of exact small ints, identical
    * IEEE doubles on both engines; scaled-round pins them as BIGINT.
    */
  def q84WindowFuncs(spark: SparkSession, d: String): DataFrame = {
    val wUnique = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val wTies = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_orderdate"))
    Tables.orders(spark, d)
      .select(col("o_orderpriority"), col("o_orderkey"),
        lag(col("o_orderkey"), 1, -1L).over(wUnique).as("prev_key"),
        lead(col("o_orderkey"), 1, -1L).over(wUnique).as("next_key"),
        ntile(4).over(wUnique).as("quartile"),
        rank().over(wTies).as("rk"),
        dense_rank().over(wTies).as("drk"),
        round(percent_rank().over(wTies) * 1000000).cast("long").as("prk_e6"),
        round(cume_dist().over(wTies) * 1000000).cast("long").as("cd_e6"))
      .orderBy("o_orderpriority", "o_orderkey")
  }

  val q84Sql: String =
    """SELECT o_orderpriority, o_orderkey,
      |  coalesce(lag(o_orderkey, 1) OVER wu, -1) AS prev_key,
      |  coalesce(lead(o_orderkey, 1) OVER wu, -1) AS next_key,
      |  CAST(ntile(4) OVER wu AS INTEGER) AS quartile,
      |  rank() OVER wt AS rk,
      |  dense_rank() OVER wt AS drk,
      |  CAST(round(percent_rank() OVER wt * 1000000) AS BIGINT) AS prk_e6,
      |  CAST(round(cume_dist() OVER wt * 1000000) AS BIGINT) AS cd_e6
      |FROM orders
      |WINDOW wu AS (PARTITION BY o_orderpriority
      |              ORDER BY o_orderdate, o_orderkey),
      |       wt AS (PARTITION BY o_orderpriority ORDER BY o_orderdate)
      |ORDER BY o_orderpriority, o_orderkey""".stripMargin

  /** Argmax/argmin aggregation: per customer-nation, the order key of
    * the latest/earliest order (`max_by`/`min_by` keyed on the unique
    * orderkey — deterministic) plus a `count_if` predicate count.
    * Single partial-aggregatable pass — max_by carries one (key,
    * value) pair per group through the map-side combine, NOT a sorted
    * window; this is the scan-shaped way to answer "row of the max"
    * at 100 TB (the window formulation sorts every group).
    */
  def q85ArgExtremes(spark: SparkSession, d: String): DataFrame =
    Tables.orders(spark, d)
      .join(Tables.customer(spark, d),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_orders"),
        max_by(col("o_orderkey"), col("o_orderkey")).as("latest_key"),
        min_by(col("o_orderkey"), col("o_orderkey")).as("first_key"),
        count_if(col("o_totalprice") > lit(150000.0)).as("n_big"))
      .orderBy("c_nationkey")

  val q85Sql: String =
    """SELECT c_nationkey, count(*) AS n_orders,
      |  arg_max(o_orderkey, o_orderkey) AS latest_key,
      |  arg_min(o_orderkey, o_orderkey) AS first_key,
      |  CAST(sum(CASE WHEN o_totalprice > 150000.0 THEN 1 ELSE 0 END)
      |       AS BIGINT) AS n_big
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_nationkey
      |ORDER BY c_nationkey""".stripMargin

  /** Exact-moment correlation/variance: Pearson corr and population
    * stddev of (quantity, extendedprice-in-cents) per returnflag,
    * computed from EXACT integer moment sums (Σx Σy Σxy Σx² Σy² as
    * DECIMAL(38,0) — quantities are integral, prices exact in cents)
    * and only then combined in closed form. A direct `corr()` is a
    * float aggregation whose partial-merge order perturbs low bits
    * across cluster layouts; the moment form is ONE partial-
    * aggregatable pass whose result is bit-identical on any layout
    * and any engine — the distributed-determinism pattern for second-
    * order stats at 100 TB.
    */
  def q86MomentCorr(spark: SparkSession, d: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val x = col("l_quantity").cast("long")
    val y = round(col("l_extendedprice") * 100).cast("long")
    Tables.lineitem(spark, d)
      .select(col("l_returnflag"), x.as("x"), y.as("y"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).cast(d38).as("n"),
        sum(col("x").cast(d38)).as("sx"),
        sum(col("y").cast(d38)).as("sy"),
        sum((col("x") * col("y")).cast(d38)).as("sxy"),
        sum((col("x") * col("x")).cast(d38)).as("sxx"),
        sum((col("y") * col("y")).cast(d38)).as("syy"))
      .select(col("l_returnflag"),
        col("n").cast("long").as("n"),
        round(((col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
          / sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
          / sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double")))
          * 1000000).cast("long").as("corr_e6"),
        round(sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
          / col("n").cast("double") * 1000000).cast("long").as("sd_x_e6"))
      .orderBy("l_returnflag")
  }

  val q86Sql: String =
    """WITH m AS (
      |  SELECT l_returnflag,
      |    CAST(count(*) AS HUGEINT) AS n,
      |    sum(CAST(CAST(l_quantity AS BIGINT) AS HUGEINT)) AS sx,
      |    sum(CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS HUGEINT)) AS sy,
      |    sum(CAST(CAST(l_quantity AS BIGINT) * CAST(round(l_extendedprice * 100) AS BIGINT) AS HUGEINT)) AS sxy,
      |    sum(CAST(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT) AS HUGEINT)) AS sxx,
      |    sum(CAST(CAST(round(l_extendedprice * 100) AS BIGINT) * CAST(round(l_extendedprice * 100) AS BIGINT) AS HUGEINT)) AS syy
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag, CAST(n AS BIGINT) AS n,
      |  CAST(round(CAST(n * sxy - sx * sy AS DOUBLE)
      |    / sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
      |    / sqrt(CAST(n * syy - sy * sy AS DOUBLE)) * 1000000) AS BIGINT) AS corr_e6,
      |  CAST(round(sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
      |    / CAST(n AS DOUBLE) * 1000000) AS BIGINT) AS sd_x_e6
      |FROM m ORDER BY l_returnflag""".stripMargin

  /** Ordered-sequence funnel (view → click → purchase): per user, the
    * first view, the first click AT OR AFTER it, the first purchase at
    * or after that — the product-analytics staple that needs
    * cross-stage ordering, not just per-type mins. Three conditional
    * aggregations, each shuffling on the SAME user key (the exchange
    * is planned once and reused); no per-user event-list
    * materialization, so user cardinality is the only scale axis.
    * Unreached stages surface as -1.
    */
  def q91Funnel(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(spark, d)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    val s1 = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("us").as("t1"))
    val s2 = ev.filter(col("event_type") === "click")
      .join(s1, "user_id").filter(col("us") >= col("t1"))
      .groupBy("user_id").agg(min("us").as("t2"))
    val s3 = ev.filter(col("event_type") === "purchase")
      .join(s2, "user_id").filter(col("us") >= col("t2"))
      .groupBy("user_id").agg(min("us").as("t3"))
    s1.join(s2, Seq("user_id"), "left")
      .join(s3, Seq("user_id"), "left")
      .select(col("user_id"), col("t1"),
        coalesce(col("t2"), lit(-1L)).as("t2"),
        coalesce(col("t3"), lit(-1L)).as("t3"))
      .orderBy("user_id")
  }

  val q91Sql: String =
    """WITH s1 AS (
      |  SELECT user_id, min(epoch_us(ts)) AS t1 FROM events
      |  WHERE event_type = 'view' GROUP BY 1),
      |s2 AS (
      |  SELECT e.user_id, min(epoch_us(e.ts)) AS t2
      |  FROM events e JOIN s1 ON e.user_id = s1.user_id
      |  WHERE e.event_type = 'click' AND epoch_us(e.ts) >= s1.t1
      |  GROUP BY 1),
      |s3 AS (
      |  SELECT e.user_id, min(epoch_us(e.ts)) AS t3
      |  FROM events e JOIN s2 ON e.user_id = s2.user_id
      |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= s2.t2
      |  GROUP BY 1)
      |SELECT s1.user_id, t1,
      |  coalesce(t2, -1) AS t2, coalesce(t3, -1) AS t3
      |FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
      |ORDER BY user_id""".stripMargin

  /** Retention cohort matrix: users grouped by the epoch-week of their
    * FIRST event, counted distinct per week offset — the
    * week-over-week retention table. Two shuffles: first-touch per
    * user, then (cohort, offset) distinct-count; epoch-week is exact
    * integer division of micros (calendar-free, engine-identical).
    */
  def q92Retention(spark: SparkSession, d: String): DataFrame = {
    val wk = 604800000000L // micros per week
    val ev = Tables.events(spark, d)
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
    val first = ev.groupBy("user_id").agg(min("us").as("f"))
    // `div` is true integer division — a double divide-then-cast can
    // misplace bucket boundaries at epoch-micros magnitudes
    ev.join(first, "user_id")
      .select(col("user_id"),
        expr(s"f div ${wk}L").as("cohort_week"),
        expr(s"us div ${wk}L - f div ${wk}L").as("week_offset"))
      .groupBy("cohort_week", "week_offset")
      .agg(countDistinct("user_id").as("n_users"))
      .orderBy("cohort_week", "week_offset")
  }

  val q92Sql: String =
    """WITH f AS (SELECT user_id, min(epoch_us(ts)) AS f FROM events GROUP BY 1)
      |SELECT f.f // 604800000000 AS cohort_week,
      |  epoch_us(e.ts) // 604800000000 - f.f // 604800000000 AS week_offset,
      |  count(DISTINCT e.user_id) AS n_users
      |FROM events e JOIN f ON e.user_id = f.user_id
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  /** Hourly volume anomaly z-scores per user decile — the monitoring
    * query over event streams: bucket counts, then each bucket scored
    * against ITS GROUP's mean/std computed from exact integer moment
    * sums (q86's determinism pattern — a running `stddev()` would be
    * partial-merge-order sensitive). Two shuffles sharing the group
    * key; z is e6-scaled from the closed form so both engines round
    * the identical double. Zero-variance groups score 0 by definition.
    */
  def q93AnomalyZ(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(spark, d)
      .select(pmod(col("user_id"), lit(10L)).as("user_mod"),
        unix_micros(col("ts")).as("us"))
      .select(col("user_mod"), expr("us div 3600000000L").as("hour"))
    val counts = ev.groupBy("user_mod", "hour")
      .agg(count(lit(1)).as("n"))
    val stats = counts.groupBy("user_mod")
      .agg(count(lit(1)).as("k"), sum("n").as("s"),
        sum(col("n") * col("n")).as("s2"))
    val mean = col("s").cast("double") / col("k").cast("double")
    val variance = (col("s2").cast("double") / col("k").cast("double")) -
      (mean * mean)
    counts.join(stats, "user_mod")
      .select(col("user_mod"), col("hour"), col("n"),
        when(variance <= 0, lit(0L)).otherwise(
          round((col("n").cast("double") - mean) / sqrt(variance) * 1000000)
            .cast("long")).as("z_e6"))
      .orderBy("user_mod", "hour")
  }

  val q93Sql: String =
    """WITH c AS (
      |  SELECT user_id % 10 AS user_mod,
      |    epoch_us(ts) // 3600000000 AS hour, count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |st AS (
      |  SELECT user_mod, count(*) AS k,
      |    CAST(sum(n) AS BIGINT) AS s, CAST(sum(n * n) AS BIGINT) AS s2
      |  FROM c GROUP BY 1)
      |SELECT c.user_mod, c.hour, c.n,
      |  CASE WHEN CAST(s2 AS DOUBLE) / CAST(k AS DOUBLE)
      |            - (CAST(s AS DOUBLE) / CAST(k AS DOUBLE))
      |              * (CAST(s AS DOUBLE) / CAST(k AS DOUBLE)) <= 0 THEN 0
      |  ELSE CAST(round((CAST(c.n AS DOUBLE)
      |    - CAST(s AS DOUBLE) / CAST(k AS DOUBLE))
      |    / sqrt(CAST(s2 AS DOUBLE) / CAST(k AS DOUBLE)
      |           - (CAST(s AS DOUBLE) / CAST(k AS DOUBLE))
      |             * (CAST(s AS DOUBLE) / CAST(k AS DOUBLE)))
      |    * 1000000) AS BIGINT) END AS z_e6
      |FROM c JOIN st USING (user_mod)
      |ORDER BY user_mod, hour""".stripMargin

  /** MERGEABLE histogram quantiles: order totals binned at $10k, ONE
    * map-side-combined groupBy whose key space is ≤ #bins at ANY input
    * size (the partial-mergeable sketch shape q67's exact sort-based
    * percentile lacks), then each probed quantile resolved to the
    * first bin whose cumulative count reaches ceil(q·n). Everything
    * integer-exact: bin ids, cumulative counts, thresholds — the
    * approximation is the DECLARED bin width, not float drift.
    */
  def q96HistQuantiles(spark: SparkSession, d: String): DataFrame = {
    val w = Window.orderBy("bin")
    val bins = Tables.orders(spark, d)
      .select(round(col("o_totalprice") * 100).cast("long").as("cents"))
      .select(expr("cents div 1000000L").as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n"))
      .withColumn("cum", sum("n").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val total = bins.agg(sum("n").as("total"))
    val probes = spark.range(1).select(
      explode(array(lit(25), lit(50), lit(75), lit(90), lit(99))).as("q_pct"))
    probes.crossJoin(broadcast(total))
      .join(bins, col("cum") * 100 >= col("q_pct") * col("total"))
      .groupBy("q_pct", "total")
      .agg(min("bin").as("bin"))
      .select(col("q_pct"),
        (col("bin") * 1000000L).as("bin_lo_cents"),
        col("total").cast("long").as("n"))
      .orderBy("q_pct")
  }

  val q96Sql: String =
    """WITH b AS (
      |  SELECT CAST(round(o_totalprice * 100) AS BIGINT) // 1000000 AS bin,
      |    count(*) AS n
      |  FROM orders GROUP BY 1),
      |c AS (SELECT bin, n,
      |        sum(n) OVER (ORDER BY bin
      |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |          AS cum
      |      FROM b),
      |t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM b),
      |p AS (SELECT unnest([25, 50, 75, 90, 99]) AS q_pct)
      |SELECT p.q_pct, min(c.bin) * 1000000 AS bin_lo_cents, t.total AS n
      |FROM p CROSS JOIN t JOIN c ON c.cum * 100 >= p.q_pct * t.total
      |GROUP BY p.q_pct, t.total
      |ORDER BY p.q_pct""".stripMargin

  /** Event-SEQUENCE pattern mining: each user's events rendered as an
    * ordered type-initial string (one shuffle, array sort — no window
    * pass), then regex analytics over the sequence — adjacent
    * view→click count and the full view→…→click→…→purchase
    * conversion flag. The per-user string is bounded by that user's
    * event count (activity-bounded, not corpus-bounded), which is
    * what keeps sequence mining feasible at 100 TB.
    */
  def q97EventSeq(spark: SparkSession, d: String): DataFrame =
    Tables.events(spark, d)
      .select(col("user_id"),
        struct(unix_micros(col("ts")).as("us"), col("event_id"),
          substring(col("event_type"), 1, 1).as("ch")).as("e"))
      .groupBy("user_id")
      .agg(sort_array(collect_list(col("e"))).as("es"))
      .select(col("user_id"),
        size(col("es")).cast("long").as("n_events"),
        array_join(transform(col("es"), e => e("ch")), "").as("seq"))
      .select(col("user_id"), col("n_events"),
        regexp_count(col("seq"), lit("vc")).cast("long").as("n_view_click"),
        when(col("seq").rlike("v.*c.*p"), 1L).otherwise(0L).as("converted"))
      .orderBy("user_id")

  val q97Sql: String =
    """WITH s AS (
      |  SELECT user_id, count(*) AS n_events,
      |    string_agg(substr(event_type, 1, 1), ''
      |               ORDER BY epoch_us(ts), event_id) AS seq
      |  FROM events GROUP BY 1)
      |SELECT user_id, n_events,
      |  CAST(len(regexp_extract_all(seq, 'vc')) AS BIGINT) AS n_view_click,
      |  CAST(CASE WHEN regexp_matches(seq, 'v.*c.*p') THEN 1 ELSE 0 END
      |       AS BIGINT) AS converted
      |FROM s ORDER BY user_id""".stripMargin

  /** Chi-square independence test of (event_type × user-decile): the
    * contingency table is ONE map-side-combined groupBy (≤ 50 cells
    * at any input size), margins and the statistic derive from those
    * exact integer counts in closed form — per-cell contribution
    * (o·t − r·c)² / (r·c·t) evaluated with the IDENTICAL operation
    * order on both engines, e6-scaled. The hypothesis-testing member
    * of the analytics family; at 100 TB the only data-sized work is
    * the one cell-count pass.
    */
  def q99ChiSquare(spark: SparkSession, d: String): DataFrame = {
    val cells = Tables.events(spark, d)
      .groupBy(col("event_type"), pmod(col("user_id"), lit(10L)).as("user_mod"))
      .agg(count(lit(1)).as("o"))
    val rows = cells.groupBy("event_type").agg(sum("o").as("r"))
    val cols = cells.groupBy("user_mod").agg(sum("o").as("c"))
    val tot = cells.agg(sum("o").as("t"))
    // o·t and r·c reach ~1e24 at 100 TB — exact only in decimal(38,0)
    // (HUGEINT on the oracle side; 64-bit longs would wrap silently).
    // num² would reach ~1e48 and overflow even those, so num and r·c
    // are cast to double FIRST and the square/divides run in identical
    // IEEE order on both engines.
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val num = (dec(col("o")) * dec(col("t")) - dec(col("r")) * dec(col("c")))
      .cast("double")
    cells.join(broadcast(rows), "event_type")
      .join(broadcast(cols), "user_mod")
      .crossJoin(broadcast(tot))
      .select(col("event_type"), col("user_mod"), col("o"),
        round(num * num
          / (dec(col("r")) * dec(col("c"))).cast("double") / col("t").cast("double")
          * lit(1000000.0) / col("t").cast("double")).cast("long")
          .as("chi2_term_e6"))
      .orderBy("event_type", "user_mod")
  }

  val q99Sql: String =
    """WITH cells AS (
      |  SELECT event_type, user_id % 10 AS user_mod, count(*) AS o
      |  FROM events GROUP BY 1, 2),
      |r AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS r FROM cells GROUP BY 1),
      |c AS (SELECT user_mod, CAST(sum(o) AS BIGINT) AS c FROM cells GROUP BY 1),
      |t AS (SELECT CAST(sum(o) AS BIGINT) AS t FROM cells)
      |SELECT cells.event_type, cells.user_mod, cells.o,
      |  CAST(round(
      |    CAST(CAST(o AS HUGEINT) * CAST(t AS HUGEINT)
      |         - CAST(r AS HUGEINT) * CAST(c AS HUGEINT) AS DOUBLE)
      |    * CAST(CAST(o AS HUGEINT) * CAST(t AS HUGEINT)
      |         - CAST(r AS HUGEINT) * CAST(c AS HUGEINT) AS DOUBLE)
      |    / CAST(CAST(r AS HUGEINT) * CAST(c AS HUGEINT) AS DOUBLE)
      |    / CAST(t AS DOUBLE)
      |    * 1000000.0 / CAST(t AS DOUBLE)) AS BIGINT) AS chi2_term_e6
      |FROM cells JOIN r USING (event_type) JOIN c USING (user_mod)
      |  CROSS JOIN t
      |ORDER BY event_type, user_mod""".stripMargin

  /** Bounded-round min-label propagation
    * ([[graft.operators.Components.minLabelPropagation]]) over the
    * part–supplier bipartite graph: after 3 synchronous rounds each
    * node is labeled with the smallest id within 3 hops — the
    * fixed-budget community/affiliation signal next to full
    * star-contraction components (ComponentsSpec) and PageRank (q76).
    * Labels are exact integers; the oracle replays all 3 rounds as
    * chained CTEs and the gate pins the full label-size distribution.
    */
  def q100LabelProp(spark: SparkSession, d: String): DataFrame = {
    // deterministic ~9% edge sample: the full bipartite graph is one
    // component within 3 hops (every supplier touches many parts) —
    // the sparse subgraph leaves real multi-label structure for the
    // bounded rounds to expose
    val edges = Tables.lineitem(spark, d)
      .filter(pmod(col("l_partkey") * 31 + col("l_suppkey"), lit(11L)) === 0)
      .select(col("l_partkey").as("a"),
        (col("l_suppkey") + 10000000L).as("b"))
      .distinct()
    graft.operators.Components.minLabelPropagation(edges, "a", "b", rounds = 3)
      .groupBy("lab").agg(count(lit(1)).as("n_nodes"))
      .orderBy("lab")
  }

  val q100Sql: String = {
    val iter = (prev: String, cur: String) =>
      s"""$cur AS (SELECT x.v, least(x.lab, coalesce(m.nlab, x.lab)) AS lab
         |  FROM $prev x LEFT JOIN (
         |    SELECT e.dst AS v, min(p.lab) AS nlab
         |    FROM e JOIN $prev p ON e.src = p.v GROUP BY 1) m USING (v))""".stripMargin
    val iters = (1 to 3).map(i => iter(s"r${i - 1}", s"r$i")).mkString(",\n")
    s"""WITH e0 AS (SELECT DISTINCT l_partkey AS a, l_suppkey + 10000000 AS b
       |            FROM lineitem
       |            WHERE (l_partkey * 31 + l_suppkey) % 11 = 0),
       |e AS (SELECT a AS src, b AS dst FROM e0
       |      UNION SELECT b, a FROM e0),
       |nodes AS (SELECT DISTINCT src AS v FROM e),
       |r0 AS (SELECT v, v AS lab FROM nodes),
       |$iters
       |SELECT lab, count(*) AS n_nodes FROM r3 GROUP BY 1 ORDER BY 1""".stripMargin
  }
}
