package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._
  import Multimodal._

  test("decodeMeta parses the header with pure expressions") {
    val media = synthesize(spark, 30)
    val meta = decodeMeta(media)
    assert(meta.filter(col("meta.magic") === "GRFT").count() == 30)
    val r = meta.filter(col("media_id") === 0)
      .select("meta.width", "meta.height", "meta.n_frames", "kind").head()
    assert(r.getInt(0) == 64 && r.getInt(1) == 64 && r.getInt(2) == 1)
    assert(meta.filter(col("kind") === "video")
      .filter(col("meta.n_frames") > 1).count() ==
      meta.filter(col("kind") === "video").count())
    // metadata-only projection prunes the blob from the scan
    val proj = meta.select("media_id", "meta.width")
    assert(!proj.schema.fieldNames.contains("bytes"))
  }

  test("extractFeatures: batch-shaped, deterministic, fixed dim") {
    val media = synthesize(spark, 30).repartition(4).as[MediaRecord]
    val f1 = extractFeatures(media, dim = 16).collect().sortBy(_.media_id)
    val f2 = extractFeatures(media, dim = 16).collect().sortBy(_.media_id)
    assert(f1.length == 30)
    assert(f1.forall(_.embedding.length == 16))
    assert(f1.map(_.embedding.toSeq).toSeq == f2.map(_.embedding.toSeq).toSeq,
      "features must be deterministic across runs")
    assert(f1.map(_.embedding.toSeq).distinct.length > 1)
  }

  test("resize rewrites header dims, payload length preserved") {
    val media = synthesize(spark, 9).as[MediaRecord]
    val sizes = media.collect().map(m => m.media_id -> m.bytes.length).toMap
    val out = decodeMeta(resize(media, 224, 224).toDF())
    assert(out.filter(col("meta.width") === 224 && col("meta.height") === 224)
      .count() == 9)
    out.select("media_id", "bytes").as[(Long, Array[Byte])].collect()
      .foreach { case (id, b) => assert(b.length == sizes(id)) }
  }

  test("real PNG codec: encode→decode roundtrip is pixel-exact") {
    import MediaCodec._
    val specs = (0 until 12).map { i =>
      ImageSpec(i.toLong, 16 + (i % 4) * 8, 8 + (i % 3) * 8,
        (i * 37) % 256, (i * 59) % 256, (i * 83) % 256, "png")
    }.toDS().repartition(3)
    val stats = decodeImages(renderImages(specs)).collect().map(s => s.media_id -> s).toMap
    specs.collect().foreach { s =>
      val st = stats(s.media_id)
      val n = s.width.toLong * s.height
      assert(st.width == s.width && st.height == s.height)
      assert(st.sum_r == s.r * n && st.sum_g == s.g * n && st.sum_b == s.b * n,
        s"PNG roundtrip must be lossless for media ${s.media_id}")
      // encoded bytes are a real PNG container
      assert(st.n_bytes > 8)
    }
  }

  test("real JPEG codec: decode recovers dims; solid color within quant error") {
    import MediaCodec._
    val specs = Seq(ImageSpec(0L, 32, 24, 200, 100, 50, "jpg")).toDS()
    val st = decodeImages(renderImages(specs)).head()
    assert(st.width == 32 && st.height == 24)
    val n = 32L * 24
    assert(math.abs(st.sum_r / n.toDouble - 200) < 8, "JPEG is lossy but close")
    assert(math.abs(st.sum_g / n.toDouble - 100) < 8)
    assert(math.abs(st.sum_b / n.toDouble - 50) < 8)
  }

  test("real resize: dims change, solid color survives any interpolation") {
    import MediaCodec._
    val specs = Seq(ImageSpec(7L, 64, 48, 10, 250, 77, "png")).toDS()
    val st = decodeImages(resizeImages(renderImages(specs), 20, 10)).head()
    assert(st.width == 20 && st.height == 10)
    val n = 20L * 10
    assert(st.sum_r == 10 * n && st.sum_g == 250 * n && st.sum_b == 77 * n)
  }

  test("real WAV codec: container roundtrip preserves frames, rate, peak") {
    import MediaCodec._
    val specs = (0 until 6).map(i =>
      AudioSpec(i.toLong, 800 + i * 100, 1000 + i * 2000, 16000)).toDS().repartition(2)
    val stats = decodeWavs(renderWavs(specs)).collect().map(s => s.media_id -> s).toMap
    specs.collect().foreach { s =>
      val st = stats(s.media_id)
      assert(st.n_samples == s.n_samples, "frame count from the RIFF header")
      assert(st.sample_rate == s.sample_rate)
      assert(st.peak == s.amplitude, "square-wave peak is exact in 16-bit PCM")
      assert(st.n_bytes > s.n_samples * 2, "WAVE container adds a header")
    }
  }

  test("sampleFrames yields every stride-th chunk") {
    val media = synthesize(spark, 6).filter(col("kind") === "video")
    val out = sampleFrames(media, stride = 2, frameBytes = 64)
    val r = out.select(col("media_id"), size(col("frames")).as("n"),
        length(col("bytes")).as("len")).collect()
    r.foreach { row =>
      val expected = math.floor((row.getInt(2) - 16) / 128.0).toInt + 1
      assert(row.getInt(1) == expected)
    }
    // frames are fixed-size slices (except possibly the tail)
    val first = out.select(expr("frames[0]")).as[Array[Byte]].head()
    assert(first.length == 64)
  }
}
