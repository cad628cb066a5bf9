package graft.vintage

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** SHALLOW CLONE: metadata-only table copy referencing the source's
  * files by absolute path, evolving independently afterwards.
  */
class CloneSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("shallow clone reads source data without copying; diverges independently") {
    val base = Files.createTempDirectory("vintage-clone").toString
    val src = VintageTable.create(spark, s"$base/src",
      (1L to 100L).map(i => (i, s"n$i")).toDF("id", "name")
        .repartitionByRange(3, col("id"))) // disjoint ranges → prunable
    val srcFiles = src.snapshot.files.map(_.path).toSet

    val cl = src.shallowClone(s"$base/dst")
    // no data files were copied into the clone directory
    val dstDir = new java.io.File(s"$base/dst")
    assert(!dstDir.listFiles().exists(_.getName.startsWith("part-")),
      "clone must not copy data files")
    assert(cl.toDF.count() == 100)
    assert(cl.snapshot.files.forall(_.path.startsWith("/")),
      "cloned AddFiles must be absolute")
    // stats survived the clone: point lookup prunes
    assert(cl.candidateFiles(cl.snapshot, col("id") === 5).size <
      cl.snapshot.files.size)

    // clone-side writes land in the clone dir and never touch the source
    cl.delete(col("id") <= 10)
    cl.append(Seq((200L, "new")).toDF("id", "name").coalesce(1))
    assert(cl.toDF.count() == 91)
    assert(src.toDF.count() == 100, "source must be unaffected by clone writes")
    assert(src.snapshot.files.map(_.path).toSet == srcFiles)

    // source writes don't affect the clone either
    src.delete(col("id") > 50)
    assert(src.toDF.count() == 50)
    assert(cl.toDF.count() == 91, "clone pins the files, not the source version")

    // clone vacuum walks only its own directory: source files survive
    spark.conf.set("spark.vintage.retentionDurationCheck.enabled", "false")
    try cl.vacuum(0.0) finally
      spark.conf.unset("spark.vintage.retentionDurationCheck.enabled")
    assert(src.toDFAsOf(0).count() == 100,
      "clone vacuum must never delete source-owned files")

    // history records the clone provenance
    val op = cl.snapshot.commits.find(_.version == 0).get
    assert(op.operation == "CLONE")
    assert(op.operationParameters("source").endsWith("/src"))
  }

  test("clone of a compacted source still emits every row to its change feed") {
    val base = Files.createTempDirectory("vintage-clone").toString
    val src = VintageTable.create(spark, s"$base/c-src",
      (1L to 30L).map(i => (i, s"n$i")).toDF("id", "name").repartition(3))
    src.compact(1) // live files become dataChange=false
    assert(src.snapshot.files.forall(!_.dataChange))

    val cl = src.shallowClone(s"$base/c-dst")
    // the clone's creating write is a data change regardless of the
    // source's layout-only flags: CDF and streaming must see the rows
    val ch = cl.changes(-1, 0)
    assert(ch.filter(col("_change_type") === "insert").count() == 30,
      "cloned rows must appear as inserts in the clone's change feed")
  }

  test("SQL: CREATE TABLE dst SHALLOW CLONE src") {
    val s = spark
    s.conf.set("spark.sql.catalog.vinc", "graft.vintage.connector.VintageCatalog")
    s.conf.set("spark.sql.catalog.vinc.warehouse",
      Files.createTempDirectory("vintage-clone-wh").toString)
    spark.sql("CREATE TABLE vinc.src0 (id BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO vinc.src0 SELECT id, id * 0.5 FROM range(50)")
    val res = spark.sql("CREATE TABLE vinc.dst0 SHALLOW CLONE vinc.src0").collect().head
    assert(res.getLong(1) == 1) // cloned at source version 1
    assert(spark.sql("SELECT count(*) FROM vinc.dst0 WHERE true").head().getLong(0) == 50)
    // divergence: insert into the clone, source unchanged
    spark.sql("INSERT INTO vinc.dst0 VALUES (999, 9.9)")
    assert(spark.sql("SELECT count(*) FROM vinc.dst0 WHERE true").head().getLong(0) == 51)
    assert(spark.sql("SELECT count(*) FROM vinc.src0 WHERE true").head().getLong(0) == 50)
  }

  test("shallow clone of a partitioned table is rejected") {
    val base = Files.createTempDirectory("vintage-clone").toString
    val src = VintageTable.create(spark, s"$base/p",
      Seq((1L, "a"), (2L, "b")).toDF("id", "p").coalesce(1),
      partitionBy = Seq("p"))
    val e = intercept[IllegalArgumentException](src.shallowClone(s"$base/pc"))
    assert(e.getMessage.contains("partitioned"))
  }
}
