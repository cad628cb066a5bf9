package org.apache.spark.sql.graftshim

import java.nio.file.Files

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.PhysicalWriteInfo
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.vintage.VintageTable

/** Drives the task-side DataWriter directly with UNSORTED partition
  * arrival — the SQL surface always gets the requested local sort, so
  * only a direct test exercises the LRU evict-then-REOPEN path
  * (completedPaths + a second file for a re-visited partition merging
  * correctly into the task's commit message).
  */
class VintageNativeWriteSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("LRU eviction reopens evicted partitions; all files reach the commit") {
    val dir = Files.createTempDirectory("vintage-nw").toString + "/t"
    val t = VintageTable.create(spark, dir,
      Seq((0L, "seed")).toDF("id", "p").coalesce(1), partitionBy = Seq("p"))

    val hadoopConf = spark.sparkContext.hadoopConfiguration
    hadoopConf.set("spark.vintage.write.maxOpenWriters", "1")
    try {
      val write = new VintageWrite(t.path, t.snapshot.schema, Seq("p"),
        overwrite = false, t.snapshot.properties)
      val batch = write.toBatch
      val factory = batch.createBatchWriterFactory(
        new PhysicalWriteInfo { override def numPartitions(): Int = 1 })
      val writer = factory.createWriter(0, 0L)
      // alternating partitions with cap=1: every row evicts the other
      // partition's writer; partitions a and b are each REOPENED
      Seq((1L, "a"), (2L, "b"), (3L, "a"), (4L, "b")).foreach { case (id, p) =>
        writer.write(InternalRow(id, UTF8String.fromString(p)))
      }
      val msg = writer.commit()
      batch.commit(Array(msg))
    } finally hadoopConf.unset("spark.vintage.write.maxOpenWriters")

    // every row exactly once, across >= 4 files (one per run)
    val rows = t.toDF.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rows == Set((0L, "seed"), (1L, "a"), (2L, "b"), (3L, "a"), (4L, "b")))
    val newFiles = t.snapshot.files.filter(f =>
      f.partitionValues.get("p").exists(v => v == "a" || v == "b"))
    assert(newFiles.size >= 4,
      s"alternating arrival at cap=1 must produce one file per run: $newFiles")
    assert(newFiles.forall(_.numRecords.contains(1L)))
    // partition pruning still works over the reopened files
    assert(t.toDF.filter($"p" === "a").count() == 2)
  }
}
