package graft.vintage

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** COPY INTO: incremental, idempotent file ingestion — per-file ingest
  * markers committed atomically with the data.
  */
class CopyIntoSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("ingests new files once; re-runs and already-seen files are skipped") {
    val base = Files.createTempDirectory("vintage-copy").toString
    val srcDir = s"$base/landing"
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1)
      .write.parquet(srcDir)

    val t = VintageTable.create(spark, s"$base/t",
      Seq.empty[(Long, String)].toDF("id", "v"))
    assert(t.copyInto(srcDir) == 1) // one landed parquet file
    assert(t.toDF.count() == 2)

    // re-run: nothing new → no commit, no duplicate rows
    val vBefore = t.version
    assert(t.copyInto(srcDir) == 0)
    assert(t.version == vBefore && t.toDF.count() == 2)

    // a new landing file is picked up alone
    Seq((3L, "c")).toDF("id", "v").coalesce(1)
      .write.mode("append").parquet(srcDir)
    assert(t.copyInto(srcDir) == 1)
    assert(t.toDF.count() == 3)
    assert(t.snapshot.ingested.size == 2)
  }

  test("csv ingestion with table schema and options; constraints apply") {
    val base = Files.createTempDirectory("vintage-copy").toString
    val srcDir = s"$base/csv"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(srcDir))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$srcDir/batch1.csv"), "id,v\n10,x\n11,y\n")

    val t = VintageTable.create(spark, s"$base/t2",
      Seq((1L, "a")).toDF("id", "v"))
    assert(t.copyInto(srcDir, "csv", Map("header" -> "true")) == 1)
    assert(t.toDF.count() == 3)
    assert(t.toDF.filter(col("id") === 10).select("v").head().getString(0) == "x")

    // CHECK constraints gate ingested rows like any write
    t.addConstraint("id_pos", "id > 0")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$srcDir/batch2.csv"), "id,v\n-5,bad\n")
    intercept[Exception] { t.copyInto(srcDir, "csv", Map("header" -> "true")) }
    assert(t.toDF.count() == 3)
  }

  test("parquet sources are cast to the table schema; hive layouts rejected") {
    val base = Files.createTempDirectory("vintage-copy").toString
    // landing file writes id as INT (not the table's BIGINT)
    val srcDir = s"$base/narrow"
    Seq((7, "n")).toDF("id", "v").coalesce(1).write.parquet(srcDir)
    val t = VintageTable.create(spark, s"$base/t3",
      Seq((1L, "a")).toDF("id", "v"))
    assert(t.copyInto(srcDir) == 1)
    // every committed file decodes under the table schema
    assert(t.toDF.orderBy("id").select("id").as[Long].collect().toSeq ==
      Seq(1L, 7L))

    val partDir = s"$base/parts"
    Seq((1L, "x", "p1")).toDF("id", "v", "p").coalesce(1)
      .write.partitionBy("p").parquet(partDir)
    val e = intercept[IllegalArgumentException] { t.copyInto(partDir) }
    assert(e.getMessage.contains("hive-partitioned"))
  }

  test("ingest markers survive checkpoint replay") {
    val base = Files.createTempDirectory("vintage-copy").toString
    val t = VintageTable.create(spark, s"$base/cp",
      Seq((0L, "z")).toDF("id", "v"))
    (1 to 12).foreach { i =>
      val d = s"$base/land$i"
      Seq((i.toLong, s"v$i")).toDF("id", "v").coalesce(1).write.parquet(d)
      assert(t.copyInto(d) == 1)
    }
    VintageLog.invalidate(t.path) // force replay through the checkpoint
    assert(t.snapshot.ingested.size == 12)
    assert(t.copyInto(s"$base/land5") == 0, "marker must survive checkpoint")
  }

  test("SQL: COPY INTO with FILEFORMAT and FORMAT_OPTIONS") {
    val s = spark
    s.conf.set("spark.sql.catalog.vcp", "graft.vintage.connector.VintageCatalog")
    s.conf.set("spark.sql.catalog.vcp.warehouse",
      Files.createTempDirectory("vintage-copy-wh").toString)
    spark.sql("CREATE TABLE vcp.t (id BIGINT, v STRING)")
    val srcDir = Files.createTempDirectory("vintage-copy").toString + "/sqlsrc"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(srcDir))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$srcDir/f.csv"), "id,v\n7,q\n")
    val res = spark.sql(s"COPY INTO vcp.t FROM '$srcDir' FILEFORMAT = CSV " +
      "FORMAT_OPTIONS('header' = 'true')").collect().head
    assert(res.getLong(1) == 1)
    assert(spark.sql("SELECT v FROM vcp.t WHERE id = 7").head().getString(0) == "q")
    // idempotent via SQL too
    assert(spark.sql(s"COPY INTO vcp.t FROM '$srcDir' FILEFORMAT = CSV " +
      "FORMAT_OPTIONS('header' = 'true')").collect().head.getLong(1) == 0)
    // option values containing ')' parse (greedy body capture)
    assert(spark.sql(s"COPY INTO vcp.t FROM '$srcDir' FILEFORMAT = CSV " +
      "FORMAT_OPTIONS('header' = 'true', 'comment' = ')')")
      .collect().head.getLong(1) == 0)
  }
}
