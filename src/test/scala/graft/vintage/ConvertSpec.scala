package graft.vintage

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** CONVERT TO VINTAGE: in-place, metadata-only import of an existing
  * Parquet directory — files are referenced where they are, never
  * rewritten.
  */
class ConvertSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("unpartitioned convert references existing files with footer stats") {
    val dir = Files.createTempDirectory("vintage-convert").toString + "/plain"
    (1L to 90L).map(i => (i, s"v$i")).toDF("id", "name")
      .repartitionByRange(3, col("id"))
      .write.parquet(dir)
    val before = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f.length).toMap

    val t = VintageTable.convert(spark, dir)

    // same physical files, untouched — no rewrite happened
    val after = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f.length).toMap
    assert(after == before, "convert must not rewrite or add data files")
    assert(t.snapshot.files.map(_.path).toSet == before.keySet)

    // rows, schema, footer stats all live
    assert(t.toDF.count() == 90)
    assert(t.snapshot.files.forall(_.numRecords.exists(_ > 0)))
    assert(t.candidateFiles(t.snapshot, col("id") === 5).size <
      t.snapshot.files.size, "footer stats must prune range-disjoint files")

    // it is now a normal table: history, append, time travel
    assert(t.snapshot.commits.find(_.version == 0).get.operation == "CONVERT")
    t.append(Seq((200L, "new")).toDF("id", "name").coalesce(1))
    assert(t.toDF.count() == 91)
    assert(t.toDFAsOf(0).count() == 90)
  }

  test("hive-partitioned convert infers partition columns and prunes on them") {
    val dir = Files.createTempDirectory("vintage-convert").toString + "/part"
    Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "c"))
      .toDF("id", "grp").write.partitionBy("grp").parquet(dir)

    val t = VintageTable.convert(spark, dir)
    assert(t.snapshot.partitionColumns == Seq("grp"))
    assert(t.toDF.count() == 4)
    assert(t.toDF.filter(col("grp") === "b").select("id")
      .collect().map(_.getLong(0)).toSet == Set(3L))
    // partition predicate prunes to that partition's files only
    val cands = t.candidateFiles(t.snapshot, col("grp") === "b")
    assert(cands.nonEmpty && cands.forall(_.partitionValues("grp") == "b"))
    // row-level ops work on the converted layout
    t.delete(col("grp") === "c")
    assert(t.toDF.count() == 3)
  }

  test("partition type override via partitionSchema") {
    val dir = Files.createTempDirectory("vintage-convert").toString + "/typed"
    Seq((1L, 10), (2L, 20)).toDF("id", "bucket")
      .write.partitionBy("bucket").parquet(dir)
    val t = VintageTable.convert(spark, dir,
      org.apache.spark.sql.types.StructType.fromDDL("bucket STRING"))
    assert(t.toDF.schema("bucket").dataType ==
      org.apache.spark.sql.types.StringType)
    assert(t.toDF.filter(col("bucket") === "20").count() == 1)
  }

  test("SQL: CONVERT TO VINTAGE on a quoted path") {
    val dir = Files.createTempDirectory("vintage-convert").toString + "/sql"
    spark.range(40).selectExpr("id", "id % 4 AS m").write.parquet(dir)
    val res = spark.sql(s"CONVERT TO VINTAGE '$dir'").collect().head
    assert(res.getLong(1) > 0)
    assert(spark.read.format("vintage").load(dir).count() == 40)
    assert(spark.sql(s"DESCRIBE HISTORY '$dir'").count() == 1)
  }

  test("vacuum reclaims externally-named converted files once rewritten out") {
    val dir = Files.createTempDirectory("vintage-convert").toString + "/ext"
    spark.range(20).selectExpr("id", "id * 2 AS v").coalesce(1).write.parquet(dir)
    // give the imported file a non part-* name, as external tools do
    val d = new java.io.File(dir)
    d.listFiles().filter(_.getName.endsWith(".parquet")).zipWithIndex.foreach {
      case (f, i) => assert(f.renameTo(new java.io.File(d, s"data_$i.parquet")))
    }
    val t = VintageTable.convert(spark, dir)
    assert(t.snapshot.files.forall(_.path.startsWith("data_")))
    t.overwrite(spark.range(5).selectExpr("id", "id * 2 AS v"))
    spark.conf.set("spark.vintage.retentionDurationCheck.enabled", "false")
    val deleted =
      try t.vacuum(0.0)
      finally spark.conf.unset("spark.vintage.retentionDurationCheck.enabled")
    assert(deleted >= 1, "vacuum must reclaim non part-* data files")
    assert(!d.listFiles().exists(_.getName.startsWith("data_")),
      "rewritten-away converted files must be gone")
    assert(t.toDF.count() == 5)
  }

  test("foreign catalogs' maintenance SQL falls through to Spark's parser") {
    val s = spark
    s.conf.set("spark.sql.catalog.foreigncat", "some.other.CatalogImpl")
    s.conf.set("spark.sql.catalog.foreigncat.warehouse", "/tmp/elsewhere")
    try {
      // must NOT be intercepted as a vintage command ("not a vintage
      // table"); Spark's own parser rejects the Delta-flavored verb
      val e = intercept[Exception] {
        spark.sql("OPTIMIZE foreigncat.t").collect()
      }
      assert(!e.getMessage.contains("not a vintage table"), e.getMessage)
      val e2 = intercept[Exception] {
        spark.sql("ALTER TABLE foreigncat.t ADD CONSTRAINT c CHECK (x > 0)").collect()
      }
      assert(!e2.getMessage.contains("not a vintage table"), e2.getMessage)
    } finally {
      s.conf.unset("spark.sql.catalog.foreigncat")
      s.conf.unset("spark.sql.catalog.foreigncat.warehouse")
    }
  }

  test("converting a vintage table or an empty dir fails cleanly") {
    val base = Files.createTempDirectory("vintage-convert").toString
    val t = VintageTable.create(spark, s"$base/already",
      Seq((1L, "x")).toDF("id", "v"))
    assert(intercept[IllegalArgumentException](
      VintageTable.convert(spark, t.path)).getMessage.contains("already"))
    Files.createDirectory(java.nio.file.Paths.get(s"$base/empty"))
    assert(intercept[IllegalArgumentException](
      VintageTable.convert(spark, s"$base/empty")).getMessage
      .contains("no parquet files"))
  }
}
