package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Operator-level pins for [[MediaHash]] — the invariance claims the
  * q105/q106 gates rely on, proven here on real rendered bytes rather
  * than asserted in prose:
  *   - video: the temporal dHash is bit-identical across fps retiming,
  *     2× upscaling, and stride choice (when sampling resolves the same
  *     temporal profile), and CHANGES under a temporal re-cut;
  *   - audio: +1-per-segment noise is hash-invariant (different bytes),
  *     one re-levelled segment flips at most its 2 adjacent bits;
  *   - both hashes feed [[ImageHash.hammingPairs]] unchanged.
  */
class MediaHashSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  import VideoCodec.VideoSpec
  import MediaHash.SegAudioSpec

  private def vhashOf(specs: Seq[VideoSpec],
      stride: Int = 2): Map[Long, (Long, Int)] = {
    import spark.implicits._
    val frames = VideoCodec.decodeFrames(VideoCodec.renderAvis(
      spark.createDataset(specs)), stride = stride)
    MediaHash.videoTemporalHash(frames.toDF(), timeBuckets = 65)
      .select(col("media_id"), col("vhash"), col("n_frames_sampled"))
      .as[(Long, Long, Int)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
  }

  test("video temporal hash: invariant to fps and resolution; stride samples") {
    val base = VideoSpec(1L, 6, 5, 130, 33, 77, 190, 10, "DIB ")
    val h = vhashOf(Seq(
      base,
      base.copy(media_id = 2L, fps = 25),
      base.copy(media_id = 3L, width = 12, height = 10),
      // a genuinely different temporal luminance profile
      base.copy(media_id = 4L, r0 = 200, g0 = 10, b0 = 5)))
    assert(h(1L)._1 == h(2L)._1, "fps retiming must not change the hash")
    assert(h(1L)._1 == h(3L)._1, "2x upscaling must not change the hash")
    assert(h(1L)._1 != h(4L)._1, "a different temporal profile must differ")
    // stride is a SAMPLING knob, not an invariance: stride s hashes the
    // every-s-th-frame subsequence (stride 1 block-sums frame PAIRS per
    // bucket here, a different — equally valid — temporal profile).
    // Pin the sampling contract itself: sampled counts, and that both
    // stride hashes discriminate the id-4 profile change identically.
    assert(h(1L)._2 == 65, s"stride 2 over 130 frames must sample 65")
    val s1 = vhashOf(Seq(base, base.copy(media_id = 4L, r0 = 200,
      g0 = 10, b0 = 5)), stride = 1)
    assert(s1(1L)._2 == 130, s"stride 1 must sample every frame")
    assert(s1(1L)._1 != s1(4L)._1,
      "stride-1 hashing must discriminate the same profile change")
  }

  test("one-pass TemporalDHash kernel bit-equals the HOF reference") {
    import spark.implicits._
    // real rendered videos across bucket-boundary shapes: 130 frames /
    // stride 2 (ns = buckets), stride 1 (ns = 2×buckets, uneven
    // block-sums), and a 10-frame degenerate (ns < buckets)
    val specs = Seq(
      VideoSpec(1L, 6, 5, 130, 33, 77, 190, 10, "DIB "),
      VideoSpec(2L, 12, 10, 130, 200, 10, 5, 25, "DIB "),
      VideoSpec(3L, 6, 5, 10, 33, 77, 190, 10, "DIB "))
    for (stride <- Seq(1, 2); b <- Seq(7, 65)) {
      val frames = VideoCodec.decodeFrames(VideoCodec.renderAvis(
        spark.createDataset(specs)), stride = stride).toDF()
      val fast = MediaHash.videoTemporalHash(frames, timeBuckets = b)
        .as[(Long, Long, Int)].collect().sorted
      val ref = MediaHash.videoTemporalHashHof(frames, timeBuckets = b)
        .as[(Long, Long, Int)].collect().sorted
      assert(fast.sameElements(ref),
        s"kernel/HOF divergence at stride=$stride buckets=$b:\n" +
          s"  kernel ${fast.mkString(", ")}\n  hof    ${ref.mkString(", ")}")
    }
  }

  test("128-bit temporal hashes: invariances hold, bits above 64 carry") {
    import spark.implicits._
    // video at 129 buckets over 130 stride-1 samples: fps and 2x
    // upscale twins must stay bit-identical across BOTH words; a
    // different temporal profile must differ
    val base = VideoSpec(1L, 6, 5, 130, 33, 77, 190, 10, "DIB ")
    val specs = Seq(base,
      base.copy(media_id = 2L, fps = 25),
      base.copy(media_id = 3L, width = 12, height = 10),
      base.copy(media_id = 4L, r0 = 200, g0 = 10, b0 = 5))
    val frames = VideoCodec.decodeFrames(VideoCodec.renderAvis(
      spark.createDataset(specs)), stride = 1).toDF()
    val v = MediaHash.videoTemporalHash128(frames, timeBuckets = 129)
      .as[(Long, Long, Long, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3), r._4)).toMap
    assert(v(1L)._2 == 130)
    assert(v(1L)._1 == v(2L)._1, "fps retiming must not change the wide hash")
    assert(v(1L)._1 == v(3L)._1, "2x upscaling must not change the wide hash")
    assert(v(1L)._1 != v(4L)._1, "a different temporal profile must differ")
    assert(specs.map(s => v(s.media_id)._1._1).exists(_ != 0L),
      "129 buckets must exercise comparison bits above 64")

    // audio at 129 buckets aligned to 129 segments: +1-noise twin
    // bit-identical, one re-levelled segment flips <= 2 bits
    val aBase = MediaHash.SegAudioSpec(1L, 7L, 129, 16, -1, noise = false)
    val wavs = MediaHash.renderSegWavs(spark.createDataset(Seq(
      aBase,
      aBase.copy(media_id = 2L, noise = true),
      aBase.copy(media_id = 3L, flipSeg = 60))))
    val a = MediaHash.audioEnergyHash128(wavs, timeBuckets = 129)
      .collect().map(h => h.media_id -> ((h.ahash_hi, h.ahash_lo))).toMap
    assert(a(1L) == a(2L), "per-segment +1 noise must not change the hash")
    val d = java.lang.Long.bitCount(a(1L)._1 ^ a(3L)._1) +
      java.lang.Long.bitCount(a(1L)._2 ^ a(3L)._2)
    assert(d >= 1 && d <= 2, s"one re-levelled segment must flip 1-2 bits, got $d")

    // both wide hashes feed hammingPairs128: the planted twins pair up
    val vids = v.toSeq.map { case (id, ((hi, lo), _)) => (id, hi, lo) }
      .toDF("media_id", "h_hi", "h_lo")
    val pairs = ImageHash.hammingPairs128(vids, "media_id", "h_hi", "h_lo",
        maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L)),
      s"the three invariant twins must pair at hamming 0: $pairs")
  }

  test("video hash: fewer sampled frames than buckets degrades, not throws") {
    val tiny = VideoSpec(9L, 6, 5, 10, 33, 77, 190, 10, "DIB ")
    val h = vhashOf(Seq(tiny), stride = 1)
    assert(h.contains(9L)) // 10 samples in 65 buckets: defined, degenerate
  }

  private def ahashOf(specs: Seq[SegAudioSpec]): Map[Long, Long] = {
    import spark.implicits._
    MediaHash.audioEnergyHash(MediaHash.renderSegWavs(
        spark.createDataset(specs)), timeBuckets = 65)
      .select(col("media_id"), col("ahash"))
      .as[(Long, Long)].collect().toMap
  }

  test("audio energy hash: noise-invariant; segment re-level flips <= 2 bits") {
    val h = ahashOf(Seq(
      SegAudioSpec(1L, 7L, 65, 32, -1, noise = false),
      SegAudioSpec(2L, 7L, 65, 32, -1, noise = true),
      SegAudioSpec(3L, 7L, 65, 32, 30, noise = false),
      SegAudioSpec(4L, 8L, 65, 32, -1, noise = false)))
    assert(h(1L) == h(2L), "+1/segment noise must be hash-invariant")
    val flipped = java.lang.Long.bitCount(h(1L) ^ h(3L))
    assert(flipped <= 2, s"one re-levelled segment flipped $flipped bits")
    assert(h(1L) != h(4L), "different seeds must differ")
    // and the noise twin's BYTES genuinely differ
    import spark.implicits._
    val bytes = MediaHash.renderSegWavs(spark.createDataset(Seq(
        SegAudioSpec(1L, 7L, 65, 32, -1, noise = false),
        SegAudioSpec(2L, 7L, 65, 32, -1, noise = true))))
      .collect().map(m => m.media_id -> m.bytes).toMap
    assert(!java.util.Arrays.equals(bytes(1L), bytes(2L)))
  }

  test("both hashes feed hammingPairs: planted trios pair up") {
    import spark.implicits._
    val audio = MediaHash.audioEnergyHash(MediaHash.renderSegWavs(
      spark.createDataset(Seq(
        SegAudioSpec(1L, 7L, 65, 32, -1, noise = false),
        SegAudioSpec(1001L, 7L, 65, 32, -1, noise = true),
        SegAudioSpec(3001L, 7L, 65, 32, 30, noise = false),
        SegAudioSpec(5L, 9L, 65, 32, -1, noise = false)))),
      timeBuckets = 65).toDF()
    val pairs = ImageHash.hammingPairs(audio, "media_id", "ahash",
        maxHamming = 3)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 1001L)))
    assert(pairs.contains((1L, 3001L)))
    assert(pairs.contains((1001L, 3001L)))
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L),
      "an unrelated seed must not pair (different tone profile)")
  }
}
