package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.operators.VideoCodec.VideoSpec

/** Both contracts of the runtime-probed inter-frame decode stage
  * ([[FfmpegVideo]]):
  *
  *  - WITHOUT an ffmpeg binary (this container), the stage must skip
  *    CLEANLY — an empty, correctly-typed dataset, no exception — so
  *    pipelines composing it stay runnable;
  *  - WITH one (any host that has ffmpeg on PATH or GRAFT_FFMPEG),
  *    it must decode an MJPEG AVI rendered by [[VideoCodec]] to the
  *    same per-frame channel sums the JDK decoder computes on the
  *    identical bytes (within JPEG-decoder tolerance — libavcodec and
  *    ImageIO are different JPEG implementations), with stride
  *    sampling selecting the same frame indices.
  *
  * The ffmpeg leg self-activates wherever a binary exists — it is a
  * real end-to-end test, not a stub; only the codec binary itself is
  * environment-bound.
  */
class FfmpegVideoSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def mjpgAvis = {
    import spark.implicits._
    VideoCodec.renderAvis(spark.createDataset(
      (0L until 3L).map(k => VideoSpec(k, 32, 16, 4 + k.toInt,
        (k * 41 % 256).toInt, (k * 67 % 256).toInt, (k * 97 % 256).toInt,
        10, "MJPG"))))
  }

  test("without ffmpeg the stage skips cleanly; with it, sums match the JDK decode") {
    val avis = mjpgAvis.cache()
    val decoded = FfmpegVideo.decodeFrames(avis, width = 32, height = 16)
    if (!FfmpegVideo.isAvailable) {
      assert(decoded.collect().isEmpty,
        "no binary -> empty dataset, no exception")
      info("no ffmpeg on PATH — clean-skip contract verified; " +
        "decode contract self-activates on hosts with ffmpeg")
    } else {
      val jdk = VideoCodec.decodeFrames(avis).collect()
        .map(f => (f.media_id, f.frame_idx) -> f).toMap
      val got = decoded.collect()
      assert(got.length == jdk.size, s"frame count: ${got.length} vs ${jdk.size}")
      got.foreach { f =>
        val ref = jdk((f.media_id, f.frame_idx))
        val px = f.width.toLong * f.height
        for ((a, b) <- Seq((f.sum_r, ref.sum_r), (f.sum_g, ref.sum_g),
            (f.sum_b, ref.sum_b)))
          assert(math.abs(a - b).toDouble / px <= 4.0,
            s"media ${f.media_id} frame ${f.frame_idx}: mean channel " +
              s"delta beyond JPEG tolerance ($a vs $b over $px px)")
      }
    }
  }

  /** A fake "ffmpeg" executable: answers `-version`, consumes stdin,
    * then runs `body` (emitting rawvideo bytes or wedging). Lets the
    * full process plumbing — feeder thread, watchdog kill, frame
    * slicing, failure skip — run for REAL in containers that ship no
    * ffmpeg.
    */
  private def stubBinary(name: String, body: String): String = {
    val f = java.nio.file.Files.createTempFile(s"stub-$name", ".sh")
    java.nio.file.Files.writeString(f,
      s"""#!/bin/sh
         |case "$$1" in -version) echo stub; exit 0;; esac
         |cat > /dev/null
         |$body
         |""".stripMargin)
    f.toFile.setExecutable(true)
    f.toString
  }

  test("stub binary: frames slice into exact channel sums through the real process plumbing") {
    // 3 frames of 32x16 RGB24 where every byte is 0x01 -> each channel
    // sums to exactly width*height per frame
    val bin = stubBinary("frames",
      "head -c 4608 /dev/zero | tr '\\0' '\\001'")
    val got = FfmpegVideo.decodeFramesWith(bin, mjpgAvis, 32, 16, stride = 1)
      .collect().sortBy(f => (f.media_id, f.frame_idx))
    // stub emits 3 frames per record regardless of input; 3 records
    assert(got.length == 9, s"9 frames expected, got ${got.length}")
    got.foreach { f =>
      assert((f.sum_r, f.sum_g, f.sum_b) == (512L, 512L, 512L) &&
        f.width == 32 && f.height == 16, s"bad stats: $f")
    }
    assert(got.map(_.frame_idx).toSeq == Seq(0, 1, 2, 0, 1, 2, 0, 1, 2))
  }

  test("stub binary: a wedged decoder is killed by the watchdog and the record skipped") {
    val bin = stubBinary("wedge", "sleep 600")
    sys.props("graft.ffmpeg.timeout.ms") = "2000"
    try {
      val t0 = System.nanoTime()
      val got = FfmpegVideo.decodeFramesWith(bin, mjpgAvis.limit(1), 32, 16,
        stride = 1).collect()
      val sec = (System.nanoTime() - t0) / 1e9
      assert(got.isEmpty, "wedged record must be skipped, not fatal")
      assert(sec < 30, s"watchdog must bound the stall (took $sec s)")
    } finally sys.props -= "graft.ffmpeg.timeout.ms"
  }

  test("stride sampling emits exactly the selected frame indices (or skips cleanly)") {
    val avis = mjpgAvis
    val decoded = FfmpegVideo.decodeFrames(avis, width = 32, height = 16,
      stride = 2).collect()
    if (!FfmpegVideo.isAvailable) assert(decoded.isEmpty)
    else {
      // videos have 4, 5, 6 frames -> stride-2 keeps indices 0,2[,4]
      val expect = Map(0L -> Seq(0, 2), 1L -> Seq(0, 2, 4), 2L -> Seq(0, 2, 4))
      val got = decoded.groupBy(_.media_id)
        .map { case (k, v) => k -> v.map(_.frame_idx).sorted.toSeq }
      assert(got == expect, s"sampled indices: $got")
    }
  }
}
