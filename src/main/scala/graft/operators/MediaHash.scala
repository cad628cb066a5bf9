package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Perceptual fingerprints for the VIDEO and AUDIO corpus legs — with
  * [[ImageHash]] (images) this completes "dedup every modality": each
  * modality reduces to a compact 64-bit hash feeding the SAME
  * [[ImageHash.hammingPairs]] banded self-join, so the pairing plan,
  * its skew guards and its scale surface are shared across modalities
  * (one soak leg covers all three).
  *
  * Both fingerprints are TEMPORAL difference hashes — the time-axis
  * analogue of dHash's spatial neighbor comparison, and deliberately
  * exact-integer (the q102 oracle-ability rule):
  *
  *  - video: stride-sampled frames → per-frame luminance sums (from
  *    [[VideoCodec.decodeFrames]]'s exact channel sums) → `timeBuckets`
  *    block-sums over the sampled sequence → bit j = bucket j+1
  *    outshines bucket j, cross-multiplied by bucket sizes. Because
  *    only WITHIN-video comparisons enter the hash, it is invariant to
  *    resolution (w·h scales every bucket equally) and to container
  *    metadata (fps, mux layout) — the two classic video re-encode
  *    perturbations — while any temporal re-cut changes it.
  *  - audio: decoded 16-bit PCM → per-bucket sums of |sample|
  *    (rectified energy) over `timeBuckets` exact integer block
  *    boundaries → the same neighbor comparison. Invariant to
  *    constant-offset loudness tweaks of the +1 kind planted in the
  *    gate fixture; a re-levelled segment flips only its two adjacent
  *    comparisons (≤ 2 bits — inside the hamming-3 banding radius).
  *
  * 100 TB notes: decode is the only expensive stage and shuffles
  * nothing (mapPartitions at the codec boundary — executors scale it);
  * the video hash is one small groupBy over per-FRAME stat rows
  * (16 B/frame), and everything downstream of either hash is the
  * 16 B/row hamming join. Both comparisons cross-multiply in
  * overflow-proof arithmetic (DECIMAL(38,0) in the SQL video path,
  * BigInt in the JVM audio path) — hour-long PCM or dense 8K frame
  * sums × bucket counts genuinely exceed 2⁶³.
  *
  * Reference scope: the reference engine (sosna/sdlt) has no media
  * surface; this is the training-data-pipeline mandate (multimodal
  * dedup), video/audio tier.
  */
object MediaHash {

  case class VideoDHash(media_id: Long, vhash: Long, n_frames_sampled: Int)
  case class AudioDHash(media_id: Long, ahash: Long, n_samples: Long)
  case class AudioDHash128(media_id: Long, ahash_hi: Long, ahash_lo: Long,
                           n_samples: Long)

  /** 64-bit temporal dHash over a [[VideoCodec.FrameStats]]-shaped
    * frame from [[VideoCodec.decodeFrames]] (any stride): per video,
    * frames sort by `frame_idx`, sampled position i of ns lands in
    * bucket `i·B div ns`, and bit j compares bucket j+1's luminance
    * sum against bucket j's (cross-multiplied by bucket sizes — exact
    * when B ∤ ns). Luminance is integer BT.601 ×1000 over the exact
    * channel sums, so the whole hash is integer arithmetic any engine
    * replays. Videos with fewer sampled frames than buckets hash with
    * empty trailing buckets (their comparisons are all-false); sample
    * at least `timeBuckets` frames for full discrimination.
    */
  def videoTemporalHash(frames: DataFrame,
                        timeBuckets: Int = 65): DataFrame = {
    val b = timeBuckets
    require(b >= 2 && b <= 65, s"timeBuckets must be in [2, 65], got $b")
    // ONE compiled pass per video over the sorted frame list (the
    // codegen'd TemporalDHash kernel — sums, counts and the B−1
    // BigInteger-exact comparisons in a single walk); the interpreted
    // 2×O(B·ns) HOF reference lives on as videoTemporalHashHof,
    // bit-equality-pinned in MediaHashSpec (the PqOpsSpec idiom)
    framesToLums(frames)
      .select(col("media_id"),
        org.apache.spark.sql.graftshim.ColumnExpr.column(
          graft.functions.TemporalDHash(
            org.apache.spark.sql.graftshim.ColumnExpr.expr(col("__fs")),
            b)).as("vhash"),
        size(col("__fs")).as("n_frames_sampled"))
  }

  /** 128-bit widening of [[videoTemporalHash]] (up to 129 buckets →
    * 128 comparisons) for video corpora past the 64-bit banding
    * geometry — pairs via [[ImageHash.hammingPairs128]]. Same kernel:
    * the 64-bit hash at the same bucket count would be the lo word.
    * Sample at least `timeBuckets` frames for full discrimination.
    */
  def videoTemporalHash128(frames: DataFrame,
                           timeBuckets: Int = 129): DataFrame = {
    val b = timeBuckets
    require(b >= 66 && b <= 129,
      s"timeBuckets must be in [66, 129] (use videoTemporalHash below 66), got $b")
    framesToLums(frames)
      .select(col("media_id"),
        org.apache.spark.sql.graftshim.ColumnExpr.column(
          graft.functions.TemporalDHash128(
            org.apache.spark.sql.graftshim.ColumnExpr.expr(col("__fs")),
            b)).as("__h"),
        size(col("__fs")).as("n_frames_sampled"))
      .select(col("media_id"), col("__h.vhash_hi").as("vhash_hi"),
        col("__h.vhash_lo").as("vhash_lo"), col("n_frames_sampled"))
  }

  private def framesToLums(frames: DataFrame): DataFrame =
    frames
      .groupBy(col("media_id"))
      .agg(sort_array(collect_list(struct(col("frame_idx"),
        expr("sum_r * 299 + sum_g * 587 + sum_b * 114").as("lum")))).as("__fs"))

  /** The declarative HOF formulation of [[videoTemporalHash]] — kept as
    * the reference semantics (MediaHashSpec pins bit-equality to the
    * one-pass codegen'd kernel on real rendered videos). 64-bit bucket
    * index arithmetic (`CAST(i AS BIGINT) * B`, ADVICE r13) and a
    * DECIMAL(38,0) cross-multiply: an 8K video's bucket sums × counts
    * genuinely exceed 2⁶³ (the same reason the audio twin compares in
    * BigInt) — a raw BIGINT multiply would wrap and silently flip bits.
    */
  private[operators] def videoTemporalHashHof(frames: DataFrame,
                        timeBuckets: Int = 65): DataFrame = {
    val b = timeBuckets
    require(b >= 2 && b <= 65, s"timeBuckets must be in [2, 65], got $b")
    framesToLums(frames)
      .withColumn("__ns", size(col("__fs")))
      .withColumn("__sums", expr(
        s"transform(sequence(0, $b - 1), bk -> " +
        s"aggregate(sequence(0, __ns - 1), CAST(0 AS BIGINT), " +
        s"(acc, i) -> acc + IF((CAST(i AS BIGINT) * $b) DIV __ns = bk, __fs[i].lum, CAST(0 AS BIGINT))))"))
      .withColumn("__cnts", expr(
        s"transform(sequence(0, $b - 1), bk -> " +
        s"aggregate(sequence(0, __ns - 1), CAST(0 AS BIGINT), " +
        s"(acc, i) -> acc + IF((CAST(i AS BIGINT) * $b) DIV __ns = bk, CAST(1 AS BIGINT), CAST(0 AS BIGINT))))"))
      .select(col("media_id"),
        expr(s"aggregate(sequence(0, $b - 2), CAST(0 AS BIGINT), (acc, j) -> " +
          "acc + IF(CAST(__sums[j + 1] AS DECIMAL(38,0)) * __cnts[j] > " +
          "CAST(__sums[j] AS DECIMAL(38,0)) * __cnts[j + 1], " +
          "shiftleft(CAST(1 AS BIGINT), j), CAST(0 AS BIGINT)))").as("vhash"),
        col("__ns").as("n_frames_sampled"))
  }

  /** REAL WAVE decode → 64-bit temporal energy dHash: 16-bit mono PCM
    * samples land in `timeBuckets` exact integer blocks (sample i of n
    * → bucket `i·B div n`), each bucket folds Σ|sample|, and bit j
    * compares bucket j+1 against bucket j cross-multiplied by bucket
    * sizes (BigInt — PCM sums × counts can exceed Long on long audio).
    */
  def audioEnergyHash(ds: Dataset[Multimodal.MediaRecord],
                      timeBuckets: Int = 65): Dataset[AudioDHash] = {
    val b = timeBuckets
    require(b >= 2 && b <= 65, s"timeBuckets must be in [2, 65], got $b")
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map { m =>
      val (hi, lo, n) = pcmEnergyHash(m, b)
      // b <= 65 cannot set bits past 63; require (not assert) so the
      // check survives -Xdisable-assertions builds like every other
      // contract in this file
      require(hi == 0L, s"pcmEnergyHash hi word set at b=$b")
      AudioDHash(m.media_id, lo, n)
    })
  }

  /** 128-bit widening of [[audioEnergyHash]] (up to 129 buckets) —
    * pairs via [[ImageHash.hammingPairs128]]; the 64-bit hash at the
    * same bucket count would be the lo word (shared kernel).
    */
  def audioEnergyHash128(ds: Dataset[Multimodal.MediaRecord],
                         timeBuckets: Int = 129): Dataset[AudioDHash128] = {
    val b = timeBuckets
    require(b >= 66 && b <= 129,
      s"timeBuckets must be in [66, 129] (use audioEnergyHash below 66), got $b")
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map { m =>
      val (hi, lo, n) = pcmEnergyHash(m, b)
      AudioDHash128(m.media_id, hi, lo, n)
    })
  }

  /** Decode one WAVE record and fold the rectified-PCM bucket energies
    * into the (hi, lo) comparison hash — the bucket comparisons share
    * [[graft.functions.TemporalDHash.hashOfBuckets]] with the video
    * tier, so the two modalities' exact compare arithmetic cannot
    * drift.
    */
  private def pcmEnergyHash(m: Multimodal.MediaRecord,
      b: Int): (Long, Long, Long) = {
    val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(m.bytes))
    try {
      val fmt = ais.getFormat
      require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
        s"media_id=${m.media_id}: expected 16-bit mono PCM, got $fmt")
      val pcm = ais.readAllBytes()
      val n = pcm.length / 2
      require(n >= b,
        s"media_id=${m.media_id}: $n samples < $b time buckets")
      val sums = new Array[Long](b)
      val counts = new Array[Long](b)
      var i = 0
      while (i < n) {
        val v = ((pcm(2 * i + 1) << 8) | (pcm(2 * i) & 0xff)).toShort.toInt
        val bk = (i.toLong * b / n).toInt
        sums(bk) += math.abs(v)
        counts(bk) += 1L
        i += 1
      }
      val (hi, lo) = graft.functions.TemporalDHash.hashOfBuckets(sums, counts)
      (hi, lo, n.toLong)
    } finally ais.close()
  }

  // ── gate fixture: segment-amplitude-modulated square waves ────────

  /** Fixture spec for the audio gate: `segments` equal blocks of
    * `segLen` samples (segLen a multiple of 16 so every segment starts
    * at the square wave's positive phase); segment s carries tone
    * [[segmentAmp]](seed, s) ∈ {2000, 12000} from the md5 top-bit
    * idiom, so the REAL rendered-then-decoded WAV's energy hash is
    * formula-predictable in SQL (the q102 trick). `flipSeg ≥ 0` swaps
    * one segment's tone (a controlled ≤2-bit hash perturbation);
    * `noise` adds +1 to the first sample of EVERY segment (all bucket
    * energies shift equally with equal counts, so every comparison —
    * including equal-tone ties — is provably unchanged: a
    * hash-invariant near-duplicate with genuinely different bytes).
    */
  case class SegAudioSpec(media_id: Long, seed: Long, segments: Int,
                          segLen: Int, flipSeg: Int, noise: Boolean)

  /** Tone of segment s for `seed`: top bit of md5("seed-s") picks
    * 12000 over 2000 (see [[ImageHash.blockTone]]).
    */
  def segmentAmp(seed: Long, s: Int): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$seed-$s".getBytes("UTF-8"))
    if ((d(0) & 0x80) != 0) 12000 else 2000
  }

  /** Render each spec to real WAVE bytes (same codec path as
    * [[MediaCodec.renderWavs]]; sample rate fixed at 8 kHz).
    */
  def renderSegWavs(ds: Dataset[SegAudioSpec]): Dataset[Multimodal.MediaRecord] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map { s =>
      require(s.segLen >= 16 && s.segLen % 16 == 0,
        s"media_id=${s.media_id}: segLen must be a positive multiple of 16")
      val n = s.segments * s.segLen
      val pcm = new Array[Byte](n * 2)
      var i = 0
      while (i < n) {
        val seg = i / s.segLen
        val base = segmentAmp(s.seed, seg)
        val amp = if (seg == s.flipSeg) 14000 - base else base
        var v = if ((i / 8) % 2 == 0) amp else -amp
        if (s.noise && i % s.segLen == 0) v += 1
        pcm(2 * i) = (v & 0xff).toByte
        pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new AudioFormat(8000f, 16, 1, true, false)
      val ais = new AudioInputStream(
        new ByteArrayInputStream(pcm), fmt, n.toLong)
      val out = new ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
      Multimodal.MediaRecord(s.media_id, "audio", out.toByteArray)
    })
  }
}
