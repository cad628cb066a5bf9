package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.sources.WarcSource.WarcDoc

/** The streaming WARC source ([[WarcSource.readWarcStream]]):
  * incremental file discovery over a growing crawl directory,
  * maxFilesPerTrigger batching, and exactly-once across restarts
  * through the checkpoint — the q129 standing-refresh contract at
  * unit level.
  */
class WarcStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def newDir(): String =
    Files.createTempDirectory("warc-stream").toString

  private def docsFor(ids: Range): Seq[WarcDoc] = ids.map(i =>
    WarcDoc(s"https://s.com/$i", "text/html", s"payload $i".getBytes(UTF_8)))

  test("incremental discovery: a second drain sees only new files; batches honor maxFilesPerTrigger") {
    val root = newDir()
    val cp = newDir()
    // segment 1: 6 records across 3 part files
    WarcSource.writeWarc(
      spark.createDataset(docsFor(0 until 6)).repartition(3), s"$root/seg1")

    val batches = new java.util.concurrent.CopyOnWriteArrayList[(Long, Seq[String])]()
    def drain(): Unit = {
      val q = WarcSource.readWarcStream(spark, s"$root/seg*",
          maxFilesPerTrigger = 1)
        .select("url")
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          batches.add((id, b.as[String].collect().toSeq.sorted)): Unit
        }
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drain()
    import scala.jdk.CollectionConverters._
    val run1 = batches.asScala.toSeq
    assert(run1.size == 3,
      s"maxFilesPerTrigger=1 over 3 part files must yield 3 batches: $run1")
    assert(run1.flatMap(_._2).sorted == (0 until 6).map(i => s"https://s.com/$i").sorted)

    // segment 2 lands between drains; the shared checkpoint must make
    // the second drain process ONLY the new files
    WarcSource.writeWarc(
      spark.createDataset(docsFor(10 until 14)).repartition(2), s"$root/seg2")
    batches.clear()
    drain()
    val run2 = batches.asScala.toSeq
    assert(run2.size == 2, s"only segment 2's 2 part files are new: $run2")
    assert(run2.flatMap(_._2).sorted ==
      (10 until 14).map(i => s"https://s.com/$i").sorted,
      "a re-delivery of segment 1 would break exactly-once")

    // a third drain with nothing new processes nothing
    batches.clear()
    drain()
    assert(batches.asScala.flatMap(_._2).isEmpty)
  }

  test("committer markers and _temporary debris are never parsed by the stream") {
    val root = newDir()
    val cp = newDir()
    WarcSource.writeWarc(
      spark.createDataset(docsFor(0 until 2)).coalesce(1), s"$root/seg1")
    // plant debris the listing must skip (the batch-reader contract)
    val tmp = new java.io.File(s"$root/seg1/_temporary")
    tmp.mkdirs()
    Files.write(new java.io.File(tmp, "part-0-attempt-9.warc.gz").toPath,
      Array[Byte](1, 2, 3))
    val got = new java.util.concurrent.CopyOnWriteArrayList[String]()
    val q = WarcSource.readWarcStream(spark, s"$root/seg*")
      .select("url")
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.as[String].collect().foreach(u => got.add(u)): Unit
      }
      .option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    import scala.jdk.CollectionConverters._
    assert(got.asScala.toSeq.sorted == Seq("https://s.com/0", "https://s.com/1"))
  }
}
