package graft.vintage

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Idempotent writes via application transaction watermarks
  * (txnAppId/txnVersion — Delta's SetTransaction contract).
  */
class TxnSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("append with a txn watermark is exactly-once on replay") {
    val dir = Files.createTempDirectory("vintage-txn").toString + "/t"
    val t = VintageTable.create(spark, dir, Seq((1L, "a")).toDF("id", "v"))

    t.append(Seq((2L, "b")).toDF("id", "v"), Some(("loader", 1L)))
    assert(t.toDF.count() == 2)
    assert(t.txnVersion("loader").contains(1L))

    // replay of the same transaction: skipped
    t.append(Seq((2L, "b")).toDF("id", "v"), Some(("loader", 1L)))
    assert(t.toDF.count() == 2)
    // an OLDER transaction number: also skipped
    t.append(Seq((0L, "z")).toDF("id", "v"), Some(("loader", 0L)))
    assert(t.toDF.count() == 2)
    // the next transaction applies
    t.append(Seq((3L, "c")).toDF("id", "v"), Some(("loader", 2L)))
    assert(t.toDF.count() == 3)
    assert(t.txnVersion("loader").contains(2L))
    // a different app is independent
    t.append(Seq((4L, "d")).toDF("id", "v"), Some(("other", 1L)))
    assert(t.toDF.count() == 4)
    assert(t.txnVersion("other").contains(1L))
  }

  test("txn watermarks survive checkpoint replay") {
    val dir = Files.createTempDirectory("vintage-txn").toString + "/cp"
    val t = VintageTable.create(spark, dir, Seq((0L, "x")).toDF("id", "v"))
    (1L to 12L).foreach { i =>
      t.append(Seq((i, s"v$i")).toDF("id", "v"), Some(("loader", i)))
    }
    // force a fresh replay through the version-10 checkpoint
    VintageLog.invalidate(t.path)
    assert(t.txnVersion("loader").contains(12L))
    t.append(Seq((5L, "dup")).toDF("id", "v"), Some(("loader", 12L)))
    assert(t.toDF.count() == 13, "replayed txn after checkpoint must skip")
  }

  test("connector options txnAppId/txnVersion make saves idempotent") {
    val dir = Files.createTempDirectory("vintage-txn").toString + "/conn"
    val df = Seq((1L, "a")).toDF("id", "v")
    // creating save records the txn atomically with the create
    df.write.format("vintage").mode("append")
      .option("txnAppId", "job").option("txnVersion", 0).save(dir)
    df.write.format("vintage").mode("append")
      .option("txnAppId", "job").option("txnVersion", 0).save(dir)
    assert(spark.read.format("vintage").load(dir).count() == 1)
    df.write.format("vintage").mode("append")
      .option("txnAppId", "job").option("txnVersion", 1).save(dir)
    assert(spark.read.format("vintage").load(dir).count() == 2)
    val e = intercept[IllegalArgumentException] {
      df.write.format("vintage").mode("append")
        .option("txnAppId", "job").save(dir)
    }
    assert(e.getMessage.contains("together"))
  }

  test("streaming append batches replay without duplicates") {
    val dir = Files.createTempDirectory("vintage-txn").toString + "/stream"
    val b0 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val b1 = Seq((3L, "c")).toDF("id", "v")
    graft.streaming.VintageStreaming.appendBatch(b0, dir, Some(("q1", 0L)))
    graft.streaming.VintageStreaming.appendBatch(b1, dir, Some(("q1", 1L)))
    // crash-before-checkpoint: batch 1 replays
    graft.streaming.VintageStreaming.appendBatch(b1, dir, Some(("q1", 1L)))
    assert(spark.read.format("vintage").load(dir).count() == 3)
  }
}
