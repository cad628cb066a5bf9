package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Driver-gate query exercising the native SQL row-level DML path
  * (`SupportsRowLevelOperations` + `SupportsDelta`, WriteDelta plans —
  * connector/VintageRowLevel.scala): build a vintage table from the
  * fixture parquet INSIDE the query, mutate it through the SQL catalog
  * with UPDATE, MERGE (matched update + not-matched-by-source update),
  * and DELETE, then return the ordered post-state. The DuckDB oracle
  * recomputes the same post-state as a pure SELECT pipeline
  * (CASE / LEFT JOIN / filter) over the same parquet — putting the
  * engine's hardest write path on the hash gate, not just scalatest.
  *
  * Monetary state rides as integer cents (`CAST(round(c_acctbal*100)
  * AS BIGINT)` on both engines — the fixture doubles are generated
  * from cent-exact values, so the rounding never sits near a tie):
  * every DML step after ingestion is exact integer arithmetic and the
  * hashed output carries no float anywhere (the q39/q42
  * cast-portability lesson).
  */
object RowLevelQueries {

  private val CatalogName = "q44cat"

  /** Register the vintage catalog once per session; catalog instances
    * are cached by Spark after first resolution, so the warehouse conf
    * must not change once set.
    */
  private def ensureCatalog(spark: SparkSession): Unit =
    if (spark.conf.getOption(s"spark.sql.catalog.$CatalogName").isEmpty) {
      spark.conf.set(s"spark.sql.catalog.$CatalogName",
        "graft.vintage.connector.VintageCatalog")
      spark.conf.set(s"spark.sql.catalog.$CatalogName.warehouse",
        Files.createTempDirectory("graft-q44-wh").toString)
    }

  /** The previous invocation's table, dropped at the next entry: the
    * returned DataFrame stays lazy (Verify/Bench execute it after this
    * method returns), so the current table must outlive the call —
    * bounding the leak to ONE table instead of one per invocation.
    */
  private var lastTable: Option[String] = None

  def q44SqlRowLevel(spark: SparkSession, d: String): DataFrame = {
    ensureCatalog(spark)
    lastTable.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    // unique table per invocation: the query is re-runnable (bench
    // runs it twice) and never reads state another run left behind
    val tbl = s"$CatalogName.t_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    lastTable = Some(tbl)
    // a handful of well-sized files, not one per shuffle partition:
    // every DML pass below re-scans the table, so file count is the
    // constant factor (the same reason OPTIMIZE exists)
    Tables.customer(spark, d)
      .select(col("c_custkey"), col("c_mktsegment"),
        round(col("c_acctbal") * 100).cast("long").as("bal_cents"))
      .coalesce(4)
      .createOrReplaceTempView("q44_customer_src")
    Tables.orders(spark, d)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
      .createOrReplaceTempView("q44_order_counts")
    // DVs on: the UPDATE/MERGE/DELETE sequence grows deletion vectors
    // through the delta write path instead of rewriting files
    spark.sql(
      s"""CREATE TABLE $tbl
         |TBLPROPERTIES ('vintage.deletionVectors.enabled'='true')
         |AS SELECT * FROM q44_customer_src""".stripMargin)
    spark.sql(
      s"UPDATE $tbl SET bal_cents = bal_cents + 10000 " +
        "WHERE c_mktsegment = 'BUILDING'")
    spark.sql(
      s"""MERGE INTO $tbl t
         |USING q44_order_counts s
         |ON t.c_custkey = s.o_custkey
         |WHEN MATCHED THEN UPDATE SET bal_cents = t.bal_cents + s.n_orders
         |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET bal_cents = t.bal_cents - 50""".stripMargin)
    spark.sql(s"DELETE FROM $tbl WHERE bal_cents < 0")
    spark.sql(
      s"SELECT c_custkey, c_mktsegment, bal_cents FROM $tbl ORDER BY c_custkey")
  }

  /** The oracle replays the same three mutations as stacked SELECTs. */
  val q44Sql: String =
    """WITH base AS (
      |  SELECT c_custkey, c_mktsegment,
      |    CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
      |  FROM customer
      |),
      |upd AS (
      |  SELECT c_custkey, c_mktsegment,
      |    CASE WHEN c_mktsegment = 'BUILDING' THEN bal_cents + 10000
      |         ELSE bal_cents END AS bal_cents
      |  FROM base
      |),
      |agg AS (
      |  SELECT o_custkey, count(*)::BIGINT AS n_orders FROM orders GROUP BY 1
      |),
      |merged AS (
      |  SELECT u.c_custkey, u.c_mktsegment,
      |    CASE WHEN a.o_custkey IS NOT NULL THEN u.bal_cents + a.n_orders
      |         ELSE u.bal_cents - 50 END AS bal_cents
      |  FROM upd u LEFT JOIN agg a ON u.c_custkey = a.o_custkey
      |)
      |SELECT c_custkey, c_mktsegment, bal_cents FROM merged
      |WHERE bal_cents >= 0 ORDER BY c_custkey""".stripMargin
}
