package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.vintage.VintageTable

class VintageStreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("streaming merge sink: upserts per micro-batch, one commit each") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = Files.createTempDirectory("vintage-stream").toString + "/t"
    val cp = Files.createTempDirectory("vintage-stream-cp").toString

    val mem = MemoryStream[(String, Double)]
    val stream = mem.toDF().toDF("key", "value")

    val q = VintageStreaming.mergeSink(stream, dir, "key")
      .option("checkpointLocation", cp)
      .start()
    try {
      mem.addData(("a", 1.0), ("b", 2.0))
      q.processAllAvailable()
      val t = VintageTable.forPath(spark, dir)
      assert(t.toDF.count() == 2)

      mem.addData(("b", 20.0), ("c", 3.0)) // update b, insert c
      q.processAllAvailable()
      assert(t.toDF.count() == 3)
      assert(t.toDF.filter(col("key") === "b").select("value").head().getDouble(0) == 20.0)

      // each batch = one atomic commit; history shows WRITE then MERGE
      val ops = t.history().orderBy("version")
        .select("operation").collect().map(_.getString(0)).toSeq
      assert(ops == Seq("WRITE", "MERGE"))

      // time travel to the first batch's state
      assert(t.toDFAsOf(0).count() == 2)
    } finally q.stop()
  }

  test("streaming append sink accumulates batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = Files.createTempDirectory("vintage-stream").toString + "/a"
    val cp = Files.createTempDirectory("vintage-stream-cp").toString

    val mem = MemoryStream[Int]
    val q = VintageStreaming.appendSink(mem.toDF().toDF("n"), dir)
      .option("checkpointLocation", cp)
      .start()
    try {
      mem.addData(1, 2, 3)
      q.processAllAvailable()
      mem.addData(4, 5)
      q.processAllAvailable()
      assert(VintageTable.forPath(spark, dir).toDF.count() == 5)
    } finally q.stop()
  }
}
