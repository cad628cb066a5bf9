package graft.vintage

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Staged (atomic) CTAS and `[CREATE OR] REPLACE TABLE [AS SELECT]`:
  * one-commit publication, and — the Delta-distinctive part — REPLACE
  * retains table history for time travel and RESTORE.
  */
class StagedTableSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkTestSession.spark
    s.conf.set("spark.sql.catalog.stg", "graft.vintage.connector.VintageCatalog")
    s.conf.set("spark.sql.catalog.stg.warehouse",
      Files.createTempDirectory("vintage-stg-wh").toString)
    s
  }

  private def wh = spark.conf.get("spark.sql.catalog.stg.warehouse")

  test("CTAS goes through the staged path and publishes atomically") {
    spark.sql("CREATE TABLE stg.ctas AS SELECT id, id * 2 AS dbl FROM range(5)")
    assert(spark.sql("SELECT count(*) FROM stg.ctas").head().getLong(0) == 5)
    val hist = VintageTable.forPath(spark, s"$wh/ctas").history()
      .select("operation").collect().map(_.getString(0)).toSeq
    assert(hist == Seq("CREATE TABLE AS SELECT"),
      s"CTAS must be ONE commit, got: $hist")
  }

  test("REPLACE TABLE AS SELECT swaps data atomically, history survives") {
    spark.sql("CREATE TABLE stg.r (k STRING, v INT)")
    spark.sql("INSERT INTO stg.r VALUES ('a', 1), ('b', 2)")
    spark.sql("REPLACE TABLE stg.r AS SELECT id AS n, CAST(id AS STRING) AS s FROM range(3)")
    // new state: new schema, new rows
    val out = spark.sql("SELECT n, s FROM stg.r ORDER BY n").collect()
    assert(out.length == 3 && out.head.getLong(0) == 0L)
    // HISTORY SURVIVES: the pre-replace version still reads with its
    // own schema (drop-and-recreate would have destroyed the log)
    val old = spark.sql("SELECT k, v FROM stg.r VERSION AS OF 1 ORDER BY k").collect()
    assert(old.map(r => (r.getString(0), r.getInt(1))).toSeq ==
      Seq(("a", 1), ("b", 2)))
    val ops = VintageTable.forPath(spark, s"$wh/r").history()
      .select("operation").collect().map(_.getString(0)).toSeq
    assert(ops.head == "REPLACE TABLE", s"history is newest-first, got: $ops")
    // RESTORE reaches through the replace too
    spark.sql("RESTORE TABLE stg.r TO VERSION AS OF 1")
    assert(spark.sql("SELECT k FROM stg.r ORDER BY k").collect()
      .map(_.getString(0)).toSeq == Seq("a", "b"))
  }

  test("CREATE OR REPLACE creates when absent, replaces when present") {
    spark.sql("CREATE OR REPLACE TABLE stg.cor AS SELECT 1 AS one")
    assert(spark.sql("SELECT one FROM stg.cor").head().getInt(0) == 1)
    spark.sql("CREATE OR REPLACE TABLE stg.cor AS SELECT 2 AS two")
    assert(spark.sql("SELECT two FROM stg.cor").head().getInt(0) == 2)
    // both creations are in one table's history
    assert(VintageTable.forPath(spark, s"$wh/cor").history().count() == 2)
  }

  test("REPLACE TABLE without AS SELECT replaces schema, keeps history") {
    spark.sql("CREATE TABLE stg.plain (a INT)")
    spark.sql("INSERT INTO stg.plain VALUES (7)")
    spark.sql("REPLACE TABLE stg.plain (b STRING, c DOUBLE)")
    assert(spark.table("stg.plain").schema.fieldNames.toSeq == Seq("b", "c"))
    assert(spark.table("stg.plain").count() == 0)
    assert(spark.sql("SELECT a FROM stg.plain VERSION AS OF 1").head().getInt(0) == 7)
  }

  test("REPLACE of a missing table errors; failed CTAS leaves nothing") {
    val e = intercept[Exception] {
      spark.sql("REPLACE TABLE stg.nope AS SELECT 1 AS x")
    }
    assert(e.getMessage.toLowerCase.contains("not") ||
      e.getMessage.toLowerCase.contains("nope"))
    // a CTAS whose query fails mid-write must not half-create the table
    intercept[Exception] {
      spark.sql("CREATE TABLE stg.fail AS " +
        "SELECT raise_error('boom') AS x FROM range(3)")
    }
    assert(!VintageLog.exists(s"$wh/fail"), "failed CTAS left a table behind")
    assert(intercept[Exception](spark.table("stg.fail").count()) != null)
  }

  test("partitioned RTAS keeps hive layout and partition pruning") {
    spark.sql("CREATE TABLE stg.part (k STRING, v LONG) PARTITIONED BY (k)")
    spark.sql("INSERT INTO stg.part VALUES ('x', 1)")
    spark.sql("REPLACE TABLE stg.part " +
      "PARTITIONED BY (p) AS " +
      "SELECT CASE WHEN id < 2 THEN 'lo' ELSE 'hi' END AS p, id AS v FROM range(4)")
    val snap = VintageLog.replay(s"$wh/part")
    assert(snap.partitionColumns == Seq("p"))
    assert(snap.files.forall(f => f.partitionValues.contains("p")),
      s"files must land in hive dirs: ${snap.files.map(_.path)}")
    assert(spark.sql("SELECT v FROM stg.part WHERE p = 'lo' ORDER BY v")
      .collect().map(_.getLong(0)).toSeq == Seq(0L, 1L))
  }
}
