package graft.vintage

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** `ALTER TABLE … ALTER COLUMN … TYPE <wider>`: metadata-only type
  * widening — old files keep the narrow parquet type, readers promote
  * at scan time.
  */
class TypeWideningSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkTestSession.spark
    s.conf.set("spark.sql.catalog.tw", "graft.vintage.connector.VintageCatalog")
    s.conf.set("spark.sql.catalog.tw.warehouse",
      Files.createTempDirectory("vintage-tw-wh").toString)
    s
  }

  test("INT->BIGINT widening: old files promote, new files are wide") {
    spark.sql("CREATE TABLE tw.t (id INT, v INT)")
    spark.sql("INSERT INTO tw.t VALUES (1, 10), (2, 20)")
    spark.sql("ALTER TABLE tw.t ALTER COLUMN v TYPE BIGINT")
    assert(spark.table("tw.t").schema("v").dataType ==
      org.apache.spark.sql.types.LongType)
    // old narrow files read through the widened schema
    assert(spark.sql("SELECT sum(v) FROM tw.t").head().getLong(0) == 30L)
    // new writes land wide, mixed-width scans agree
    spark.sql("INSERT INTO tw.t VALUES (3, 2147483648)") // > Int.MaxValue
    assert(spark.sql("SELECT sum(v) FROM tw.t").head().getLong(0) ==
      30L + 2147483648L)
    // row-level DML across mixed-width files
    spark.sql("UPDATE tw.t SET v = v + 1 WHERE id = 1")
    assert(spark.sql("SELECT v FROM tw.t WHERE id = 1").head().getLong(0) == 11L)
    // stats skipping still prunes on the widened column
    val wide = spark.sql("SELECT * FROM tw.t WHERE v > 1000000")
    assert(wide.count() == 1)
  }

  test("FLOAT->DOUBLE and DECIMAL precision growth") {
    spark.sql("CREATE TABLE tw.f (x FLOAT, d DECIMAL(5,2))")
    spark.sql("INSERT INTO tw.f VALUES (CAST(1.5 AS FLOAT), 123.45)")
    spark.sql("ALTER TABLE tw.f ALTER COLUMN x TYPE DOUBLE")
    spark.sql("ALTER TABLE tw.f ALTER COLUMN d TYPE DECIMAL(10,2)")
    spark.sql("INSERT INTO tw.f VALUES (2.5, 12345678.90)")
    val r = spark.sql("SELECT sum(x), sum(d) FROM tw.f").head()
    assert(r.getDouble(0) == 4.0)
    assert(r.getDecimal(1).toString == "12345802.35")
  }

  test("narrowing and re-typing are rejected") {
    spark.sql("CREATE TABLE tw.n (a BIGINT, s STRING)")
    // Spark's analyzer already refuses unsafe ALTERs
    // (NOT_SUPPORTED_CHANGE_COLUMN); the catalog's widening gate is
    // the backstop for direct TableChange callers — accept either
    def rejected(e: Exception): Boolean =
      e.getMessage.contains("widening") ||
        e.getMessage.contains("NOT_SUPPORTED_CHANGE_COLUMN")
    val e1 = intercept[Exception] {
      spark.sql("ALTER TABLE tw.n ALTER COLUMN a TYPE INT")
    }
    assert(rejected(e1), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE tw.n ALTER COLUMN s TYPE BIGINT")
    }
    assert(rejected(e2), e2.getMessage)
  }

  test("identity columns cannot change type") {
    spark.sql("CREATE TABLE tw.i (id BIGINT GENERATED ALWAYS AS IDENTITY, v INT)")
    // BIGINT is already the widest integral — but make the guard explicit
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE tw.i ALTER COLUMN id TYPE DECIMAL(20,0)")
    }
    assert(e.getMessage.contains("widening") || e.getMessage.contains("BIGINT"),
      e.getMessage)
  }
}
