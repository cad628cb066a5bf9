package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.operators.VideoCodec.{VideoSpec, frameColor}

/** Real AVI container + DIB/MJPG codecs: lossless DIB roundtrips are
  * formula-exact; MJPG (JPEG per frame) roundtrips within JPEG loss;
  * probe never decodes; stride sampling picks exactly the right
  * frames.
  */
class VideoCodecSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def specs(codec: String) = spark.createDataset(
    (0L until 5L).map(k => VideoSpec(k, 16 + k.toInt * 4, 8 + k.toInt * 2,
      3 + k.toInt, (k * 41 % 256).toInt, (k * 67 % 256).toInt,
      (k * 97 % 256).toInt, 10 + k.toInt, codec)))

  test("DIB roundtrip is byte-exact per frame") {
    val rendered = VideoCodec.renderAvis(specs("DIB ")).cache()
    val stats = VideoCodec.decodeFrames(rendered).collect()
      .map(f => (f.media_id, f.frame_idx) -> f).toMap
    (0L until 5L).foreach { k =>
      val s = VideoSpec(k, 16 + k.toInt * 4, 8 + k.toInt * 2, 3 + k.toInt,
        (k * 41 % 256).toInt, (k * 67 % 256).toInt, (k * 97 % 256).toInt,
        10 + k.toInt, "DIB ")
      (0 until s.n_frames).foreach { i =>
        val f = stats((k, i))
        val (r, g, b) = frameColor(s, i)
        val px = s.width.toLong * s.height
        assert((f.sum_r, f.sum_g, f.sum_b) == (r * px, g * px, b * px),
          s"video $k frame $i: exact DIB sums")
      }
    }
    assert(stats.size == (0 until 5).map(_ + 3).sum)
  }

  test("probe reads dims/fps/codec/frame-count from headers alone") {
    val metas = VideoCodec.probeAvis(VideoCodec.renderAvis(specs("DIB ")))
      .collect().map(m => m.media_id -> m).toMap
    (0L until 5L).foreach { k =>
      val m = metas(k)
      assert(m.width == 16 + k * 4 && m.height == 8 + k * 2 &&
        m.n_frames == 3 + k && m.fps == 10 + k && m.codec == "DIB",
        s"video $k probe: $m")
    }
  }

  test("MJPG frames decode to the source color within JPEG loss") {
    val stats = VideoCodec.decodeFrames(VideoCodec.renderAvis(specs("MJPG")))
      .collect()
    assert(stats.length == (0 until 5).map(_ + 3).sum)
    stats.foreach { f =>
      val k = f.media_id
      val s = VideoSpec(k, 16 + k.toInt * 4, 8 + k.toInt * 2, 3 + k.toInt,
        (k * 41 % 256).toInt, (k * 67 % 256).toInt, (k * 97 % 256).toInt,
        10 + k.toInt, "MJPG")
      val (r, g, b) = frameColor(s, f.frame_idx)
      val px = s.width.toLong * s.height
      def mean(sum: Long) = sum.toDouble / px
      assert(math.abs(mean(f.sum_r) - r) <= 4.0 &&
        math.abs(mean(f.sum_g) - g) <= 4.0 &&
        math.abs(mean(f.sum_b) - b) <= 4.0,
        s"video $k frame ${f.frame_idx}: JPEG mean drift too large " +
        s"(${mean(f.sum_r)},${mean(f.sum_g)},${mean(f.sum_b)}) vs ($r,$g,$b)")
    }
  }

  test("stride sampling decodes exactly the sampled frames") {
    val sampled = VideoCodec.decodeFrames(
      VideoCodec.renderAvis(specs("DIB ")), stride = 2).collect()
    val byId = sampled.groupBy(_.media_id)
    (0L until 5L).foreach { k =>
      val n = 3 + k.toInt
      val want = (0 until n by 2).toSet
      assert(byId(k).map(_.frame_idx).toSet == want,
        s"video $k: sampled frames ${byId(k).map(_.frame_idx).toSet} != $want")
    }
  }

  test("corrupt container fails loudly, not silently") {
    val bad = Seq(Multimodal.MediaRecord(1L, "video",
      "RIFFxxxxWAVE".getBytes("US-ASCII"))).toDS()
    val e = intercept[org.apache.spark.SparkException] {
      VideoCodec.probeAvis(bad).collect()
    }
    assert(e.getMessage != null)
  }
}
