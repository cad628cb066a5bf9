package graft.vintage

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** CHECK constraints: validated on add, enforced inline on every
  * data-changing write path (fluent append/merge, SQL INSERT through
  * the native DSv2 writer), dropped by name.
  */
class ConstraintSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshTable(prefix: String): VintageTable = {
    val base = Files.createTempDirectory("vintage-constraint").toString
    VintageTable.create(spark, s"$base/$prefix",
      Seq((1L, 10.0), (2L, 20.0)).toDF("id", "amount"))
  }

  test("addConstraint validates existing rows and blocks violating appends") {
    val t = freshTable("basic")
    t.addConstraint("amount_pos", "amount > 0")

    // a conforming append passes
    t.append(Seq((3L, 30.0)).toDF("id", "amount"))
    assert(t.toDF.count() == 3)

    // a violating append fails AND commits nothing
    val vBefore = t.version
    val e = intercept[Exception] {
      t.append(Seq((4L, -5.0)).toDF("id", "amount"))
    }
    assert(e.getMessage != null || e.getCause != null)
    assert(t.version == vBefore, "failed write must not commit")
    assert(t.toDF.count() == 3)

    // NULL passes (SQL CHECK semantics)
    t.append(Seq((5L, null.asInstanceOf[java.lang.Double]))
      .toDF("id", "amount").select(col("id"), col("amount").cast("double")))
    assert(t.toDF.count() == 4)
  }

  test("addConstraint rejects when existing rows violate") {
    val t = freshTable("preexisting")
    val err = intercept[IllegalArgumentException] {
      t.addConstraint("small", "amount < 15")
    }
    assert(err.getMessage.contains("existing rows violate"))
    assert(!t.snapshot.properties.keys.exists(_.contains("small")))
  }

  test("merge and update respect constraints") {
    val t = freshTable("merge")
    t.addConstraint("amount_pos", "amount > 0")
    intercept[Exception] {
      t.update(col("id") === 1L, Map("amount" -> lit(-1.0)))
    }
    assert(t.toDF.filter(col("amount") < 0).count() == 0)
  }

  test("dropConstraint re-allows previously blocked writes") {
    val t = freshTable("drop")
    t.addConstraint("amount_pos", "amount > 0")
    t.dropConstraint("amount_pos")
    t.append(Seq((9L, -1.0)).toDF("id", "amount"))
    assert(t.toDF.filter(col("amount") < 0).count() == 1)
    intercept[IllegalArgumentException](t.dropConstraint("nope"))
    t.dropConstraint("nope", ifExists = true) // no-op
  }

  test("violating append leaves no .tmp staging garbage behind") {
    val t = freshTable("tmpclean")
    t.addConstraint("amount_pos", "amount > 0")
    intercept[Exception] { t.append(Seq((4L, -5.0)).toDF("id", "amount")) }
    val leftovers = new java.io.File(new java.net.URI(t.path).getPath)
      .listFiles().filter(_.getName.startsWith(".tmp-"))
    assert(leftovers.isEmpty,
      s"failed write must clean its staging dir, found ${leftovers.mkString(",")}")
  }

  test("a commit raced by a concurrent metadata change conflicts") {
    val t = freshTable("metarace")
    val stale = t.snapshot
    t.addConstraint("amount_pos", "amount > 0") // concurrent property change
    // a blind append planned against the stale snapshot must NOT slip
    // past the new constraint silently
    val e = intercept[java.util.ConcurrentModificationException] {
      t.commitOp(stale, "WRITE", Map("mode" -> "Append"), Nil, Nil, None, NoRead)
    }
    assert(e.getMessage.contains("metadata"))

    // control: racing a plain append (no metadata action) is fine
    val stale2 = t.snapshot
    t.append(Seq((7L, 70.0)).toDF("id", "amount"))
    t.commitOp(stale2, "WRITE", Map("mode" -> "Append"), Nil, Nil, None, NoRead)
  }

  test("SQL: ADD CONSTRAINT enforces on native INSERT; DROP lifts it") {
    val s = spark
    s.conf.set("spark.sql.catalog.vinq", "graft.vintage.connector.VintageCatalog")
    s.conf.set("spark.sql.catalog.vinq.warehouse",
      Files.createTempDirectory("vintage-constraint-wh").toString)
    spark.sql("CREATE TABLE vinq.t (id BIGINT, amount DOUBLE)")
    spark.sql("INSERT INTO vinq.t VALUES (1, 10.0)")
    spark.sql("ALTER TABLE vinq.t ADD CONSTRAINT amount_pos CHECK (amount > 0)")

    spark.sql("INSERT INTO vinq.t VALUES (2, 5.0)") // conforming
    val e = intercept[Exception] {
      spark.sql("INSERT INTO vinq.t VALUES (3, -1.0)")
    }
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .take(8).exists(_.getMessage.contains("amount_pos")),
      s"violation error must name the constraint, got: $e")
    assert(spark.sql("SELECT count(*) FROM vinq.t WHERE true")
      .head().getLong(0) == 2)

    spark.sql("ALTER TABLE vinq.t DROP CONSTRAINT amount_pos")
    spark.sql("INSERT INTO vinq.t VALUES (3, -1.0)")
    assert(spark.sql("SELECT count(*) FROM vinq.t WHERE true")
      .head().getLong(0) == 3)
  }
}
