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

  // ------------------------------------------------------- DEEP CLONE

  test("deep clone survives source vacuum and time-travels from its own v0") {
    val base = Files.createTempDirectory("vintage-clone").toString
    val src = VintageTable.create(spark, s"$base/d-src",
      (1L to 100L).map(i => (i, s"n$i")).toDF("id", "name")
        .repartitionByRange(3, col("id")))
    val cl = src.deepClone(s"$base/d-dst")
    assert(cl.toDF.count() == 100)
    assert(cl.snapshot.files.forall(!_.path.startsWith("/")),
      "deep clone must own its files (relative paths)")
    // stats survived the copy: point lookup prunes
    assert(cl.candidateFiles(cl.snapshot, col("id") === 5).size <
      cl.snapshot.files.size)

    // the decisive difference vs SHALLOW: rewrite + vacuum the SOURCE
    // to zero retention — the clone keeps reading its own copies
    src.delete(col("id") <= 50)
    spark.conf.set("spark.vintage.retentionDurationCheck.enabled", "false")
    try src.vacuum(0.0) finally
      spark.conf.unset("spark.vintage.retentionDurationCheck.enabled")
    assert(cl.toDF.count() == 100,
      "source vacuum must not invalidate a deep clone")
    // clone evolves independently and time-travels to its own v0
    cl.delete(col("id") > 90)
    assert(cl.toDF.count() == 90)
    assert(cl.toDFAsOf(0).count() == 100)
    val op = cl.snapshot.commits.find(_.version == 0).get
    assert(op.operation == "CLONE" &&
      op.operationParameters("mode") == "deep")
  }

  test("deep clone rewrites sidecar deletion vectors into its own dir") {
    val base = Files.createTempDirectory("vintage-clone").toString
    val src = VintageTable.create(spark, s"$base/dv-src",
      (1L to 60L).map(i => (i, s"n$i")).toDF("id", "name")
        .repartitionByRange(3, col("id")),
      properties = Map(DeletionVectors.EnabledProp -> "true",
        DeletionVectors.MaxInlineProp -> "3"))
    src.delete(col("id") % 4 === 0) // 15 deletes across files → sidecars
    assert(src.snapshot.files.exists(_.dvRef.nonEmpty),
      "precondition: source must carry sidecar DVs")
    val expect = src.toDF.orderBy("id").collect().toSeq

    val cl = src.deepClone(s"$base/dv-dst")
    val f = cl.snapshot.files.filter(_.dvRef.nonEmpty)
    assert(f.nonEmpty && f.forall(a =>
      !a.dvRef.get.path.startsWith("/")),
      "clone sidecar refs must be clone-relative")
    assert(cl.toDF.orderBy("id").collect().toSeq == expect)

    // obliterate the source entirely: the clone must not notice
    val fs = new org.apache.hadoop.fs.Path(s"$base/dv-src")
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(s"$base/dv-src"), true)
    VintageLog.invalidate(s"$base/dv-src")
    assert(cl.toDF.orderBy("id").collect().toSeq == expect,
      "deep clone must share zero storage with the source")
  }

  test("deep clone of a partitioned table keeps layout and pruning") {
    val base = Files.createTempDirectory("vintage-clone").toString
    val src = VintageTable.create(spark, s"$base/p-src",
      (1L to 40L).map(i => (i, if (i % 2 == 0) "even" else "odd"))
        .toDF("id", "p").repartition(2),
      partitionBy = Seq("p"))
    val cl = src.deepClone(s"$base/p-dst")
    assert(cl.toDF.count() == 40)
    assert(cl.snapshot.partitionColumns == Seq("p"))
    assert(cl.snapshot.files.forall(_.path.contains("p=")),
      "partition-dir layout must carry over")
    // partition pruning on the clone
    assert(cl.candidateFiles(cl.snapshot, col("p") === "even").size <
      cl.snapshot.files.size)
    assert(cl.toDF.filter(col("p") === "even").count() == 20)
  }

  test("deep clone of a shallow clone decouples from the original storage") {
    val base = Files.createTempDirectory("vintage-clone").toString
    val orig = VintageTable.create(spark, s"$base/o",
      (1L to 20L).map(i => (i, s"n$i")).toDF("id", "name").coalesce(1))
    val sh = orig.shallowClone(s"$base/sh")
    assert(sh.snapshot.files.forall(_.path.startsWith("/")))
    val deep = sh.deepClone(s"$base/deep")
    assert(deep.snapshot.files.forall(!_.path.startsWith("/")),
      "absolute (shallow-inherited) paths must be re-homed")
    // delete the ORIGINAL table the shallow clone points into
    val fs = new org.apache.hadoop.fs.Path(s"$base/o")
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(s"$base/o"), true)
    VintageLog.invalidate(s"$base/o")
    assert(deep.toDF.count() == 20)
  }

  test("clones carry the row-id high watermark") {
    val base = Files.createTempDirectory("vintage-clone").toString
    val src = VintageTable.create(spark, s"$base/rt-src",
      (1L to 10L).map(i => (i, s"n$i")).toDF("id", "name").coalesce(1),
      properties = Map(RowTracking.EnabledProp -> "true"))
    val hwm = src.snapshot.rowIdHwm
    assert(hwm == 10L)
    for ((cl, n) <- Seq(src.deepClone(s"$base/rt-deep") -> "deep",
                        src.shallowClone(s"$base/rt-sh") -> "shallow")) {
      assert(cl.snapshot.rowIdHwm == hwm, s"$n clone must carry the hwm")
      cl.append(Seq((99L, "x")).toDF("id", "name").coalesce(1))
      val ids = cl.toDFWithRowIds.select("_row_id")
        .as[Long].collect().toSet
      assert(ids.size == 11, s"$n clone row ids must stay unique, got $ids")
    }
  }

  test("SQL: bare CLONE is deep; DEEP CLONE explicit") {
    val s = spark
    s.conf.set("spark.sql.catalog.vinc2", "graft.vintage.connector.VintageCatalog")
    val wh = Files.createTempDirectory("vintage-clone-wh2").toString
    s.conf.set("spark.sql.catalog.vinc2.warehouse", wh)
    spark.sql("CREATE TABLE vinc2.src1 (id BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO vinc2.src1 SELECT id, id * 0.5 FROM range(40)")
    val res = spark.sql("CREATE TABLE vinc2.dst1 CLONE vinc2.src1").collect().head
    assert(res.getLong(1) == 1 && res.getLong(2) > 0)
    val dst = VintageTable.forPath(spark, s"$wh/dst1")
    assert(dst.snapshot.commits.find(_.version == 0).get
      .operationParameters("mode") == "deep")
    assert(spark.sql("SELECT count(*) FROM vinc2.dst1 WHERE true")
      .head().getLong(0) == 40)
    spark.sql("CREATE TABLE vinc2.dst2 DEEP CLONE vinc2.src1")
    assert(VintageTable.forPath(spark, s"$wh/dst2").snapshot.files
      .forall(!_.path.startsWith("/")))
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
