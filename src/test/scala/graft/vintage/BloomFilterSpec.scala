package graft.vintage

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The `vintage.bloom.columns` table property writes parquet bloom
  * filters for the listed columns — the point-lookup skipping layer
  * min/max stats cannot provide on high-cardinality unsorted keys.
  */
class BloomFilterSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def bloomOffsets(t: VintageTable): Map[String, Seq[Long]] = {
    val conf = spark.sessionState.newHadoopConf()
    t.snapshot.files.filter(_.numRecords.exists(_ > 0)).flatMap { f =>
      val reader = ParquetFileReader.open(
        HadoopInputFile.fromPath(new HPath(t.path, f.path), conf))
      try reader.getRowGroups.asScala.flatMap(_.getColumns.asScala.map(c =>
        c.getPath.toDotString -> c.getBloomFilterOffset))
      finally reader.close()
    }.groupMap(_._1)(_._2)
  }

  test("bloom filters written only for configured columns, on both write paths") {
    val dir = Files.createTempDirectory("vintage-bloom").toString + "/t"
    val t = VintageTable.create(spark, dir,
      (1L to 1000L).map(i => (i, s"name_$i")).toDF("id", "name").coalesce(1),
      properties = Map("vintage.bloom.columns" -> "name"))
    t.append((1001L to 2000L).map(i => (i, s"name_$i")).toDF("id", "name").coalesce(1))

    val offs = bloomOffsets(t)
    assert(offs("name").forall(_ >= 0), s"bloom missing for name: $offs")
    assert(offs("id").forall(_ < 0), s"unconfigured column got a bloom: $offs")

    // native DSv2 write path honors the property too
    val s = spark
    s.conf.set("spark.sql.catalog.vinb", "graft.vintage.connector.VintageCatalog")
    s.conf.set("spark.sql.catalog.vinb.warehouse",
      Files.createTempDirectory("vintage-bloom-wh").toString)
    spark.sql("CREATE TABLE vinb.bt (id BIGINT, name STRING) " +
      "TBLPROPERTIES ('vintage.bloom.columns' = 'name')")
    spark.sql("INSERT INTO vinb.bt SELECT id, concat('n', id) FROM range(1000)")
    val t2 = VintageTable.forPath(spark,
      spark.conf.get("spark.sql.catalog.vinb.warehouse") + "/bt")
    val offs2 = bloomOffsets(t2)
    assert(offs2("name").forall(_ >= 0), s"native write wrote no bloom: $offs2")
    assert(offs2("id").forall(_ < 0))

    // a table without the property writes no blooms
    val dir3 = Files.createTempDirectory("vintage-bloom").toString + "/p"
    val t3 = VintageTable.create(spark, dir3,
      (1L to 100L).map(i => (i, s"n$i")).toDF("id", "name").coalesce(1))
    assert(bloomOffsets(t3).values.flatten.forall(_ < 0))

    // reads still correct with blooms present
    assert(t.toDF.filter($"name" === "name_1500").count() == 1)
  }
}
