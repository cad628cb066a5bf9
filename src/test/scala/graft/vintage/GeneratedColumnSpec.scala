package graft.vintage

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Generated columns: SQL `GENERATED ALWAYS AS` DDL, ingest-side
  * computation, and the write-time consistency constraint.
  */
class GeneratedColumnSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkTestSession.spark
    s.conf.set("spark.sql.catalog.gen", "graft.vintage.connector.VintageCatalog")
    s.conf.set("spark.sql.catalog.gen.warehouse",
      Files.createTempDirectory("vintage-gen-wh").toString)
    s
  }
  import spark.implicits._

  test("SQL DDL: GENERATED ALWAYS AS lands in properties + constraint") {
    spark.sql("""CREATE TABLE gen.t (
      |  id BIGINT,
      |  price DOUBLE,
      |  price_cents BIGINT GENERATED ALWAYS AS (CAST(price * 100 AS BIGINT)))""".stripMargin)
    val wh = spark.conf.get("spark.sql.catalog.gen.warehouse")
    val props = VintageLog.replay(s"$wh/t").properties
    assert(props.get("vintage.generated.price_cents")
      .exists(_.contains("price * 100")))
    assert(props.keys.exists(_.startsWith("vintage.constraints._gen_price_cents")))
    // a consistent insert passes; values read back
    spark.sql("INSERT INTO gen.t VALUES (1, 1.5, 150)")
    assert(spark.sql("SELECT price_cents FROM gen.t").head().getLong(0) == 150L)
    // an INCONSISTENT insert fails with the named constraint
    val e = intercept[Exception] {
      spark.sql("INSERT INTO gen.t VALUES (2, 2.0, 999)")
    }
    assert(e.getMessage.contains("_gen_price_cents") ||
      Option(e.getCause).exists(_.getMessage.contains("_gen_price_cents")),
      s"expected the consistency constraint to fire, got: ${e.getMessage}")
  }

  test("DEFAULT column values fill omitted INSERT columns") {
    spark.sql("CREATE TABLE gen.dflt (id BIGINT, status STRING DEFAULT 'new')")
    spark.sql("INSERT INTO gen.dflt (id) VALUES (1)")
    spark.sql("INSERT INTO gen.dflt VALUES (2, 'done'), (3, DEFAULT)")
    val rows = spark.sql("SELECT id, status FROM gen.dflt ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows == Seq((1L, "new"), (2L, "done"), (3L, "new")))
    // the default survives a snapshot reload (it lives in the log's schema)
    VintageLog.clearSnapshotCache()
    spark.sql("INSERT INTO gen.dflt (id) VALUES (4)")
    assert(spark.sql("SELECT status FROM gen.dflt WHERE id = 4")
      .head().getString(0) == "new")
  }

  test("ALTER COLUMN SET/DROP DEFAULT changes future inserts only") {
    spark.sql("CREATE TABLE gen.setd (id BIGINT, tier STRING DEFAULT 'basic')")
    spark.sql("INSERT INTO gen.setd (id) VALUES (1)")
    spark.sql("ALTER TABLE gen.setd ALTER COLUMN tier SET DEFAULT 'pro'")
    spark.sql("INSERT INTO gen.setd (id) VALUES (2)")
    spark.sql("ALTER TABLE gen.setd ALTER COLUMN tier DROP DEFAULT")
    spark.sql("INSERT INTO gen.setd (id) VALUES (3)")
    val rows = spark.sql("SELECT id, tier FROM gen.setd ORDER BY id").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toSeq
    assert(rows == Seq(
      (1L, Some("basic")), (2L, Some("pro")), (3L, None)))
  }

  test("ALTER TABLE ADD COLUMN DEFAULT: existing rows read the frozen value") {
    spark.sql("CREATE TABLE gen.addc (id BIGINT)")
    spark.sql("INSERT INTO gen.addc VALUES (1), (2)")
    spark.sql("ALTER TABLE gen.addc ADD COLUMN tier STRING DEFAULT 'basic'")
    // pre-existing rows (whose files lack the column) read the frozen
    // EXISTS_DEFAULT; omitted-column inserts use CURRENT_DEFAULT
    spark.sql("INSERT INTO gen.addc (id) VALUES (3)")
    spark.sql("INSERT INTO gen.addc VALUES (4, 'pro')")
    val rows = spark.sql("SELECT id, tier FROM gen.addc ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows == Seq((1L, "basic"), (2L, "basic"), (3L, "basic"), (4L, "pro")))
    // EXISTS_DEFAULT is stored as a folded literal, not raw SQL
    val wh = spark.conf.get("spark.sql.catalog.gen.warehouse")
    VintageLog.clearSnapshotCache()
    val field = VintageLog.replay(s"$wh/addc").schema("tier")
    assert(field.metadata.getString("EXISTS_DEFAULT") == "'basic'")
  }

  test("fluent ingest computes a missing generated column") {
    val dir = Files.createTempDirectory("vintage-gen").toString + "/t"
    val t = VintageTable.create(spark, dir,
      Seq((1L, "alpha"), (2L, "beta et gamma")).toDF("id", "text"),
      properties = GeneratedColumns.properties(
        Map("n_chars" -> "length(text)")))
    // create computed the column for rows that never carried it
    assert(t.toDF.columns.contains("n_chars"))
    assert(t.toDF.orderBy("id").select("n_chars").as[Int].collect().toSeq ==
      Seq(5, 13))
    // append without the column computes it too
    t.append(Seq((3L, "xy")).toDF("id", "text"))
    assert(t.toDF.filter(col("id") === 3).select("n_chars")
      .as[Int].head() == 2)
    // append WITH a consistent value passes; inconsistent fails
    t.append(Seq((4L, "ok", 2)).toDF("id", "text", "n_chars"))
    val e = intercept[Exception] {
      t.append(Seq((5L, "bad", 999)).toDF("id", "text", "n_chars"))
    }
    assert(e.getMessage.contains("_gen_n_chars") ||
      Option(e.getCause).exists(_.getMessage.contains("_gen_n_chars")))
    assert(t.toDF.count() == 4)
  }

  test("update keeping consistency passes; breaking it fails") {
    val dir = Files.createTempDirectory("vintage-gen").toString + "/u"
    val t = VintageTable.create(spark, dir,
      Seq((1L, "alpha")).toDF("id", "text"),
      properties = GeneratedColumns.properties(
        Map("n_chars" -> "length(text)")))
    // consistent: set both base and generated
    t.update(col("id") === 1,
      Map("text" -> lit("longer!"), "n_chars" -> lit(7)))
    assert(t.toDF.select("n_chars").as[Int].head() == 7)
    // inconsistent: base changes, generated left stale -> constraint
    val e = intercept[Exception] {
      t.update(col("id") === 1, Map("text" -> lit("zz")))
    }
    assert(e.getMessage.contains("_gen_n_chars") ||
      Option(e.getCause).exists(_.getMessage.contains("_gen_n_chars")))
  }
}
