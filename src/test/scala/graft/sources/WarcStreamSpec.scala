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

  test("cleanSource=archive bounds the watched tree: processed files leave it") {
    // the listing-lifecycle story: a long-lived crawl dir grows the
    // per-trigger listing without bound; the archive option moves
    // committed files OUT of the watched glob, keeping it O(unprocessed)
    val root = newDir()
    val cp = newDir()
    val archive = newDir() // outside the watched glob, as required
    WarcSource.writeWarc(
      spark.createDataset(docsFor(0 until 4)).repartition(2), s"$root/seg1")
    val got = new java.util.concurrent.CopyOnWriteArrayList[String]()
    def drain(): Unit = {
      val q = WarcSource.readWarcStream(spark, s"$root/seg*",
          maxFilesPerTrigger = 1,
          options = Map(
            "cleanSource" -> "archive",
            "sourceArchiveDir" -> archive,
            // archival runs on the cleanup thread a couple of triggers
            // behind the commit; force it eager for the assertion
            "spark.sql.streaming.fileSource.cleaner.numThreads" -> "1"))
        .select("url")
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.as[String].collect().foreach(u => got.add(u)): Unit
        }
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drain()
    // second segment + second drain: the cleaner archives files whose
    // batch is committed while later triggers run
    WarcSource.writeWarc(
      spark.createDataset(docsFor(10 until 12)).coalesce(1), s"$root/seg2")
    drain()
    import scala.jdk.CollectionConverters._
    assert(got.asScala.toSeq.sorted ==
      ((0 until 4) ++ (10 until 12)).map(i => s"https://s.com/$i").sorted,
      "archival must never lose or duplicate records")
    def warcsUnder(d: String): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer[String]()
      def walk(f: java.io.File): Unit = {
        val fs = Option(f.listFiles).getOrElse(Array.empty)
        fs.foreach { c =>
          if (c.isDirectory) walk(c)
          else if (c.getName.endsWith(".warc.gz")) out += c.getPath: Unit
        }
      }
      walk(new java.io.File(d)); out.toSeq
    }
    val watchedLeft = warcsUnder(root)
    val archived = warcsUnder(archive)
    assert(archived.nonEmpty,
      s"cleaner must have archived processed files; watched=$watchedLeft")
    assert(watchedLeft.size + archived.size == 3,
      s"every part file is exactly one of watched/archived: " +
        s"$watchedLeft / $archived")
    assert(watchedLeft.size < 3,
      "the watched tree must be strictly smaller after archival")
  }

  test("maxFileAge is forwarded: files older than the window age out of discovery") {
    // the seen-map's age boundary is relative to the NEWEST timestamp
    // already observed — the first listing of a fresh checkpoint takes
    // everything (there is no boundary yet), and files landing LATER
    // with ancient mtimes are ignored. That is the rolling-window
    // crawl-dir shape the option exists for: the checkpoint stays
    // bounded because entries (and late stragglers) past the window
    // are dropped.
    val root = newDir()
    val cp = newDir()
    val got = new java.util.concurrent.CopyOnWriteArrayList[String]()
    def drain(): Unit = {
      val q = WarcSource.readWarcStream(spark, s"$root/seg*",
          options = Map("maxFileAge" -> "1h"))
        .select("url")
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.as[String].collect().foreach(u => got.add(u)): Unit
        }
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    WarcSource.writeWarc(
      spark.createDataset(docsFor(5 until 7)).coalesce(1), s"$root/seg2")
    drain() // establishes the window's upper edge
    // a straggler segment materializes with mtimes far outside the
    // window (e.g. restored from cold storage): discovery must skip it
    WarcSource.writeWarc(
      spark.createDataset(docsFor(0 until 2)).coalesce(1), s"$root/seg1")
    new java.io.File(s"$root/seg1").listFiles()
      .foreach(f => f.setLastModified(1000L): Unit)
    drain()
    import scala.jdk.CollectionConverters._
    assert(got.asScala.toSeq.sorted == Seq("https://s.com/5", "https://s.com/6"),
      s"aged-out seg1 must be ignored, got ${got.asScala.toSeq.sorted}")
  }

  test("requireComplete fails a drain over an uncommitted segment, loudly; succeeds after commit") {
    val root = newDir()
    val cp = newDir()
    WarcSource.writeWarc(
      spark.createDataset(docsFor(0 until 2)).coalesce(1), s"$root/seg1")
    // simulate a mid-write segment: part files present, no _SUCCESS
    new java.io.File(s"$root/seg1/${WarcSource.SuccessMarker}").delete()
    val got = new java.util.concurrent.CopyOnWriteArrayList[String]()
    def drain(): Unit = {
      val q = WarcSource.readWarcStream(spark, s"$root/seg*",
          requireComplete = true)
        .select("url")
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.as[String].collect().foreach(u => got.add(u)): Unit
        }
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c =>
      Option(c.getMessage).exists(_.contains("incomplete WARC directory"))),
      s"expected the loud completeness error, got: $e")
    // writer commits; the failed batch was never committed, so the
    // files replay and the drain now succeeds exactly-once
    java.nio.file.Files.createFile(java.nio.file.Paths.get(
      s"$root/seg1/${WarcSource.SuccessMarker}"))
    got.clear()
    drain()
    import scala.jdk.CollectionConverters._
    assert(got.asScala.toSeq.sorted == Seq("https://s.com/0", "https://s.com/1"))
  }
}
