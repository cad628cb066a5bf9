package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.operators.MediaCodec
import graft.operators.MediaCodec.{AudioSpec, ImageSpec}
import graft.operators.Multimodal.MediaRecord

/** The on-disk media layout ([[MediaSource]]): real encoded files +
  * metadata sidecar, read back through `binaryFile`, driven end-to-end
  * into the REAL codec stages. Solid-color/square-wave fixtures make
  * every decoded statistic formula-checkable.
  */
class MediaSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def newDir(): String =
    Files.createTempDirectory("media-src").toString

  private def fixtures() = {
    val imgs = spark.createDataset((0L until 6L).map(k =>
      ImageSpec(k, 8 + k.toInt * 4, 6 + k.toInt * 2,
        (k * 40 % 256).toInt, (k * 70 % 256).toInt, (k * 90 % 256).toInt,
        if (k % 2 == 0) "png" else "bmp")))
    val auds = spark.createDataset((0L until 4L).map(k =>
      AudioSpec(k, 320 + k.toInt * 16, 1000 + k.toInt * 500, 8000)))
    val recs = MediaCodec.renderImages(imgs)
      .map(m => (m, if (m.media_id % 2 == 0) "png" else "bmp"))
      .union(MediaCodec.renderWavs(auds).map(m => (m, "wav")))
    (imgs, auds, recs)
  }

  test("csv-sidecar roundtrip decodes exactly through the real codecs") {
    val dir = newDir()
    val (_, _, recs) = fixtures()
    MediaSource.writeMediaDir(recs, dir, "csv")

    val media = MediaSource.readMediaDir(spark, dir, "csv")
    assert(media.count() == 10)
    // ids shared between kinds must NOT cross-join (0..3 exist as both)
    assert(media.groupBy("media_id", "kind").count()
      .filter(col("count") > 1).count() == 0)
    // blob length from binaryFile matches the payload actually read
    assert(media.filter(length(col("bytes")) =!= col("n_bytes")).count() == 0)

    val img = MediaCodec.decodeImages(
      media.filter(col("kind") === "image")
        .select("media_id", "kind", "bytes").as[MediaRecord])
      .collect().map(s => s.media_id -> s).toMap
    (0L until 6L).foreach { k =>
      val s = img(k)
      val (w, h) = (8 + k.toInt * 4, 6 + k.toInt * 2)
      assert((s.width, s.height) == (w, h), s"img $k dims")
      assert(s.sum_r == (k * 40 % 256) * w * h, s"img $k red sum")
      assert(s.sum_g == (k * 70 % 256) * w * h, s"img $k green sum")
      assert(s.sum_b == (k * 90 % 256) * w * h, s"img $k blue sum")
    }
    val aud = MediaCodec.decodeWavs(
      media.filter(col("kind") === "audio")
        .select("media_id", "kind", "bytes").as[MediaRecord])
      .collect().map(s => s.media_id -> s).toMap
    (0L until 4L).foreach { k =>
      val s = aud(k)
      assert(s.n_samples == 320 + k * 16 && s.peak == 1000 + k * 500 &&
        s.sample_rate == 8000, s"wav $k stats")
    }
  }

  test("json-sidecar variant reads the same layout") {
    val dir = newDir()
    val (_, _, recs) = fixtures()
    MediaSource.writeMediaDir(recs, dir, "json")
    val media = MediaSource.readMediaDir(spark, dir, "json")
    assert(media.count() == 10)
    assert(media.filter(col("kind") === "image").count() == 6)
    assert(media.select("format").distinct().as[String].collect().toSet ==
      Set("png", "bmp", "wav"))
  }

  test("streaming binaryFile ingestion: new files decode into a vintage sink exactly once") {
    import graft.operators.MediaCodec.ImageSpec
    val dir = newDir()
    val sinkDir = Files.createTempDirectory("media-sink").toString + "/t"
    val cp = Files.createTempDirectory("media-cp").toString
    def drop(ids: Range): Unit = MediaSource.writeMediaDir(
      MediaCodec.renderImages(spark.createDataset(ids.map(k =>
        ImageSpec(k.toLong, 8, 4, k % 256, (k * 2) % 256, (k * 3) % 256, "png"))))
        .map(m => (m, "png")),
      dir, "csv")
    drop(0 until 3)

    // the production ingestion shape: binaryFile is a file STREAMING
    // source too — new blobs landing in the directory flow through the
    // real decoder into a versioned sink, each file exactly once
    val binSchema = "path STRING, modificationTime TIMESTAMP, length LONG, content BINARY"
    val stream = spark.readStream.format("binaryFile").schema(binSchema)
      .load(s"$dir/media")
      .select(
        regexp_extract(col("path"), "/([0-9]+)_([a-z]+)\\.[a-zA-Z0-9]+$", 1)
          .cast("long").as("media_id"),
        regexp_extract(col("path"), "/([0-9]+)_([a-z]+)\\.[a-zA-Z0-9]+$", 2)
          .as("kind"),
        col("content").as("bytes"))
      .as[MediaRecord]
    val decoded = MediaCodec.decodeImages(stream)
      .select(col("media_id"), col("width"), col("height"),
        col("sum_r"), col("sum_g"), col("sum_b"))
    // pre-create the sink so the stream appends versions to it (an
    // empty BATCH frame — a streaming frame cannot batch-write)
    graft.vintage.VintageTable.create(spark, sinkDir,
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        decoded.schema))
    def drain(): Unit = {
      val q = decoded.writeStream.format("vintage")
        .option("path", sinkDir).option("checkpointLocation", cp).start()
      try q.processAllAvailable() finally q.stop()
    }
    drain()
    assert(spark.read.format("vintage").load(sinkDir).count() == 3)

    drop(3 until 5) // two NEW files land; restart picks up only those
    drain()
    val rows = spark.read.format("vintage").load(sinkDir)
    assert(rows.count() == 5, "each file lands exactly once across restarts")
    val px = 8L * 4
    val sums = rows.select("media_id", "sum_r").as[(Long, Long)].collect().toMap
    (0 until 5).foreach { k =>
      assert(sums(k.toLong) == (k % 256) * px, s"file $k decoded through the stream")
    }
  }

  test("metadata-only read prunes the content column from the scan") {
    val dir = newDir()
    val (_, _, recs) = fixtures()
    MediaSource.writeMediaDir(recs, dir, "csv")
    val meta = MediaSource.readMediaMeta(spark, dir, "csv")
    assert(meta.count() == 10)
    // AQE wraps the physical tree, so assert on the explain text: the
    // binaryFile scan's ReadSchema must not include the blob column
    val plan = meta.queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode)
    val scanLines = plan.linesIterator.filter(_.contains("binaryFile")).toSeq
    assert(scanLines.nonEmpty, s"expected a binaryFile scan in the plan:\n$plan")
    scanLines.foreach { l =>
      assert(!l.contains("content"),
        s"metadata-only read must not materialize blobs: $l")
    }
  }
}
