package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.MediaCodec
import graft.operators.MediaCodec.{AudioSpec, ImageSpec}

/** Driver-gate query for the REAL media codecs ([[MediaCodec]]):
  * hash-pins an actual PNG encode → decode → resize → decode roundtrip
  * and a WAVE container roundtrip against a pure-arithmetic DuckDB
  * oracle.
  *
  * The trick that makes a codec oracle-able without DuckDB decoding
  * images: solid-color images and square-wave PCM make every decoded
  * statistic formula-predictable —
  *   - PNG is lossless, so per-channel pixel SUMS are exactly
  *     `channel * w * h`;
  *   - resize of a solid image is solid under ANY interpolation, so
  *     post-resize sums are `channel * 20 * 12`;
  *   - a 16-bit square wave's peak is exactly its amplitude, and the
  *     RIFF header round-trips the frame count and sample rate.
  * If ImageIO or AudioSystem mis-decoded a single pixel or frame the
  * hash would go red. Specs are derived from the nation table so the
  * oracle runs on the shared parquet inputs.
  */
object MediaQueries {

  def q49MediaCodec(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val nations = Tables.nation(spark, d)
      .select(col("n_nationkey").cast("long").as("k")).as[Long].collect().sorted

    val imgSpecs = spark.createDataset(nations.map { k =>
      ImageSpec(k, 16 + (k % 5).toInt * 8, 8 + (k % 3).toInt * 8,
        ((k * 37) % 256).toInt, ((k * 59) % 256).toInt, ((k * 83) % 256).toInt, "png")
    }.toSeq).repartition(4)
    val audSpecs = spark.createDataset(nations.map { k =>
      AudioSpec(k, 640 + k.toInt * 16, 500 + k.toInt * 777, 8000)
    }.toSeq).repartition(4)

    val encoded = MediaCodec.renderImages(imgSpecs).cache()
    val decode = MediaCodec.decodeImages(encoded)
      .select(col("media_id").as("n_nationkey"), lit("decode").as("stage"),
        col("width").cast("long").as("a"), col("height").cast("long").as("b"),
        col("sum_r").as("c"), col("sum_g").as("d"), col("sum_b").as("e"))
    val resize = MediaCodec.decodeImages(MediaCodec.resizeImages(encoded, 20, 12))
      .select(col("media_id").as("n_nationkey"), lit("resize").as("stage"),
        col("width").cast("long").as("a"), col("height").cast("long").as("b"),
        col("sum_r").as("c"), col("sum_g").as("d"), col("sum_b").as("e"))
    val audio = MediaCodec.decodeWavs(MediaCodec.renderWavs(audSpecs))
      .select(col("media_id").as("n_nationkey"), lit("audio").as("stage"),
        col("n_samples").as("a"), col("sample_rate").cast("long").as("b"),
        col("peak").cast("long").as("c"), lit(0L).as("d"), lit(0L).as("e"))

    decode.unionByName(resize).unionByName(audio)
      .orderBy("stage", "n_nationkey")
  }

  /** Gate query for the on-disk media layout ([[graft.sources.
    * MediaSource]]): the same formula-predictable fixtures as q49, but
    * round-tripped through REAL FILES — rendered blobs written as
    * individual PNG/WAV files plus a CSV sidecar, read back through
    * Spark's `binaryFile` source (ids recovered from file names,
    * sidecar equi-joined), then decoded by the real codecs. Adds
    * metadata-only `files_*` count rows that go through the
    * blob-pruned scan path. A wrong byte on disk, a mis-joined
    * sidecar row, or a lossy write would all break the hash.
    */
  def q51MediaSource(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    import graft.operators.Multimodal.MediaRecord
    import graft.sources.MediaSource
    val base = java.nio.file.Files.createTempDirectory("graft-q51").toString
    val nations = Tables.nation(spark, d)
      .select(col("n_nationkey").cast("long").as("k")).as[Long].collect().sorted

    val imgSpecs = spark.createDataset(nations.map { k =>
      ImageSpec(k, 16 + (k % 5).toInt * 8, 8 + (k % 3).toInt * 8,
        ((k * 37) % 256).toInt, ((k * 59) % 256).toInt, ((k * 83) % 256).toInt, "png")
    }.toSeq).repartition(4)
    val audSpecs = spark.createDataset(nations.map { k =>
      AudioSpec(k, 640 + k.toInt * 16, 500 + k.toInt * 777, 8000)
    }.toSeq).repartition(4)
    MediaSource.writeMediaDir(
      MediaCodec.renderImages(imgSpecs).map(m => (m, "png"))
        .union(MediaCodec.renderWavs(audSpecs).map(m => (m, "wav"))),
      base, "csv")

    val media = MediaSource.readMediaDir(spark, base, "csv")
    def recordsOf(kind: String) = media.filter(col("kind") === kind)
      .select("media_id", "kind", "bytes").as[MediaRecord]
    val decode = MediaCodec.decodeImages(recordsOf("image"))
      .select(col("media_id").as("n_nationkey"), lit("decode").as("stage"),
        col("width").cast("long").as("a"), col("height").cast("long").as("b"),
        col("sum_r").as("c"), col("sum_g").as("d"), col("sum_b").as("e"))
    val audio = MediaCodec.decodeWavs(recordsOf("audio"))
      .select(col("media_id").as("n_nationkey"), lit("audio").as("stage"),
        col("n_samples").as("a"), col("sample_rate").cast("long").as("b"),
        col("peak").cast("long").as("c"), lit(0L).as("d"), lit(0L).as("e"))
    // metadata-only pass: counts per kind through the blob-pruned scan
    val files = MediaSource.readMediaMeta(spark, base, "csv")
      .groupBy("kind").agg(count(lit(1)).as("n"))
      .select(lit(-1L).as("n_nationkey"),
        concat(lit("files_"), col("kind")).as("stage"),
        col("n").as("a"), lit(0L).as("b"), lit(0L).as("c"),
        lit(0L).as("d"), lit(0L).as("e"))

    decode.unionByName(audio).unionByName(files)
      .orderBy("stage", "n_nationkey")
  }

  /** Same arithmetic as q49's oracle plus the per-kind file counts the
    * sidecar join must reproduce.
    */
  val q51Sql: String =
    """WITH k AS (SELECT CAST(n_nationkey AS BIGINT) AS k FROM nation),
      |img AS (
      |  SELECT k, 16 + (k % 5) * 8 AS w, 8 + (k % 3) * 8 AS h,
      |         (k * 37) % 256 AS r, (k * 59) % 256 AS g, (k * 83) % 256 AS b
      |  FROM k
      |)
      |SELECT n_nationkey, stage, a, b, c, d, e FROM (
      |  SELECT k AS n_nationkey, 'decode' AS stage, w AS a, h AS b,
      |         r * w * h AS c, g * w * h AS d, b * w * h AS e
      |  FROM img
      |  UNION ALL
      |  SELECT k, 'audio', 640 + k * 16, 8000, 500 + k * 777, 0, 0 FROM k
      |  UNION ALL
      |  SELECT -1, 'files_audio', (SELECT count(*) FROM k), 0, 0, 0, 0
      |  UNION ALL
      |  SELECT -1, 'files_image', (SELECT count(*) FROM k), 0, 0, 0, 0
      |) ORDER BY stage, n_nationkey""".stripMargin

  /** Gate query for the REAL VIDEO codec
    * ([[graft.operators.VideoCodec]]): a true AVI container (RIFF
    * muxer/demuxer) with lossless uncompressed DIB frames whose
    * per-frame solid colors advance by a known formula — so a full
    * render → probe → per-frame decode → stride-3 sample pipeline is
    * hash-pinned against pure arithmetic. A mis-muxed chunk, a wrong
    * stride pad, an off-by-one in frame ordering, or a sampler that
    * decodes the wrong frames all break the hash.
    */
  def q53VideoCodec(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    import graft.operators.VideoCodec
    import graft.operators.VideoCodec.VideoSpec
    val nations = Tables.nation(spark, d)
      .select(col("n_nationkey").cast("long").as("k")).as[Long].collect().sorted

    val specs = spark.createDataset(nations.map { k =>
      VideoSpec(k, 16 + (k % 4).toInt * 8, 8 + (k % 3).toInt * 4,
        4 + (k % 3).toInt * 2, ((k * 29) % 256).toInt, ((k * 53) % 256).toInt,
        ((k * 71) % 256).toInt, 12 + (k % 5).toInt, "DIB ")
    }.toSeq).repartition(4)
    val avis = VideoCodec.renderAvis(specs).cache()

    val probe = VideoCodec.probeAvis(avis)
      .select(col("media_id").as("n_nationkey"), lit("probe").as("stage"),
        col("width").cast("long").as("a"), col("height").cast("long").as("b"),
        col("n_frames").as("c"), col("fps").cast("long").as("d"),
        lit(0L).as("e"))
    def agg(stride: Int, stage: String) =
      VideoCodec.decodeFrames(avis, stride)
        .groupBy("media_id")
        .agg(count(lit(1)).as("a"),
          max(col("width").cast("long") * col("height")).as("b"),
          sum(col("sum_r")).as("c"), sum(col("sum_g")).as("d"),
          sum(col("sum_b")).as("e"))
        .select(col("media_id").as("n_nationkey"), lit(stage).as("stage"),
          col("a"), col("b"), col("c"), col("d"), col("e"))

    probe.unionByName(agg(1, "frames")).unionByName(agg(3, "sample"))
      .orderBy("stage", "n_nationkey")
  }

  /** The frame-color recurrence summed in SQL: what a correct AVI
    * mux/demux/decode/sample MUST produce.
    */
  val q53Sql: String =
    """WITH k AS (SELECT CAST(n_nationkey AS BIGINT) AS k FROM nation),
      |v AS (
      |  SELECT k, 16 + (k % 4) * 8 AS w, 8 + (k % 3) * 4 AS h,
      |         4 + (k % 3) * 2 AS nf,
      |         (k * 29) % 256 AS r0, (k * 53) % 256 AS g0, (k * 71) % 256 AS b0,
      |         12 + (k % 5) AS fps
      |  FROM k
      |),
      |f AS (
      |  SELECT v.*, r.range AS i FROM v CROSS JOIN range(8) r WHERE r.range < v.nf
      |)
      |SELECT n_nationkey, stage, a, b, c, d, e FROM (
      |  SELECT k AS n_nationkey, 'probe' AS stage, w AS a, h AS b, nf AS c,
      |         fps AS d, CAST(0 AS BIGINT) AS e
      |  FROM v
      |  UNION ALL
      |  SELECT k, 'frames', CAST(COUNT(*) AS BIGINT), w * h,
      |         CAST(SUM(((r0 + 7 * i) % 256) * w * h) AS BIGINT),
      |         CAST(SUM(((g0 + 11 * i) % 256) * w * h) AS BIGINT),
      |         CAST(SUM(((b0 + 13 * i) % 256) * w * h) AS BIGINT)
      |  FROM f GROUP BY k, w, h
      |  UNION ALL
      |  SELECT k, 'sample', CAST(COUNT(*) AS BIGINT), w * h,
      |         CAST(SUM(((r0 + 7 * i) % 256) * w * h) AS BIGINT),
      |         CAST(SUM(((g0 + 11 * i) % 256) * w * h) AS BIGINT),
      |         CAST(SUM(((b0 + 13 * i) % 256) * w * h) AS BIGINT)
      |  FROM f WHERE i % 3 = 0 GROUP BY k, w, h
      |) ORDER BY stage, n_nationkey""".stripMargin

  /** Gate query for perceptual image dedup ([[graft.operators.
    * ImageHash]]): renders 25 base images (block-toned by an exact
    * integer formula over nation keys), plants a hash-invariant NOISY
    * copy (+1 on one pixel per block — different bytes, provably
    * identical dHash) and a one-block-FLIPPED copy (a controlled
    * ≤2-bit hash perturbation) per base, then hash-pins BOTH the
    * 64-bit dHash of every real rendered→decoded PNG (as two 32-bit
    * BIGINT halves) and the banded hamming pairs among the planted
    * trios against a pure-arithmetic DuckDB replay of the tone
    * formula. A decode bug, a wrong block boundary, a luminance-weight
    * slip, a banding miss, or a bit_count regression all break the
    * hash. Pair rows are RESTRICTED to the planted id offsets
    * (1000/2000/3000 with matching key — provable ground truth at any
    * corpus, the q29 robustness pattern); natural cross-key pairs are
    * pinned by ImageHashSpec instead.
    */
  def q102ImageDhash(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    import graft.operators.ImageHash
    import graft.operators.ImageHash.BlockImageSpec
    val nations = Tables.nation(spark, d)
      .select(col("n_nationkey").cast("long").as("k")).as[Long].collect().sorted

    val specs = nations.flatMap { k =>
      val sx = 4 + (k % 3).toInt; val sy = 3 + (k % 2).toInt
      Seq(
        BlockImageSpec(k, k, sx, sy, -1, -1, noise = false),
        BlockImageSpec(k + 1000, k, sx, sy, -1, -1, noise = true),
        BlockImageSpec(k + 3000, k, sx, sy, (k % 8).toInt, 1 + (k % 7).toInt,
          noise = false))
    }
    val hashes = ImageHash.dHash(ImageHash.renderBlockImages(
      spark.createDataset(specs.toSeq).repartition(4))).toDF().cache()
    hashPairGate(hashes, "dhash", Seq(1000L, 2000L, 3000L))
  }

  /** The shared gate tail of the perceptual-dedup queries
    * (q102/q105/q106): pin every 64-bit fingerprint as two 32-bit
    * BIGINT halves, pair via the banded hamming join RESTRICTED to the
    * planted id offsets (provable ground truth at any corpus — the q29
    * robustness pattern), union, materialize eagerly, and drop the
    * upstream cache (ADVICE r12: a long-lived session must not rely on
    * LRU eviction). One definition so a fix to the hash packing, the
    * offset filter, or the persist discipline cannot drift between the
    * three modality gates.
    */
  private def hashPairGate(hashes: DataFrame, hashCol: String,
      offsets: Seq[Long]): DataFrame = {
    val hashRows = hashes
      .select(lit("hash").as("stage"), col("media_id").as("id_a"),
        lit(-1L).as("id_b"),
        col(hashCol).bitwiseAND(lit(4294967295L)).as("a"),
        shiftrightunsigned(col(hashCol), 32).as("b"))
    val pairRows = graft.operators.ImageHash.hammingPairs(
        hashes, "media_id", hashCol, maxHamming = 3)
      .filter((col("id_b") - col("id_a")).isin(offsets: _*) &&
        col("id_a") % 1000 === col("id_b") % 1000)
      .select(lit("pair").as("stage"), col("id_a"), col("id_b"),
        col("hamming").as("a"),
        expr("CAST((id_b - id_a) DIV 1000 AS BIGINT)").as("b"))
    val out = hashRows.unionByName(pairRows)
      .orderBy("stage", "id_a", "id_b").localCheckpoint()
    hashes.unpersist(blocking = false)
    out
  }

  /** The dHash tone formula replayed as pure BIGINT arithmetic: block
    * tones → neighbor-comparison bits → packed 32-bit halves → planted
    * pair hammings.
    */
  val q102Sql: String =
    """WITH k AS (SELECT CAST(n_nationkey AS BIGINT) AS k FROM nation),
      |v(variant, voff) AS (VALUES (0, 0), (1, 1000), (3, 3000)),
      |base AS (
      |  SELECT k.k, r.range AS r, c.range AS c,
      |    CASE WHEN CAST(('0x' || substr(md5(
      |           CAST(k.k AS VARCHAR) || '-' || CAST(r.range AS VARCHAR)
      |           || '-' || CAST(c.range AS VARCHAR)), 1, 1)) AS INT) >= 8
      |      THEN 216 ELSE 40 END AS tone
      |  FROM k, range(8) r, range(9) c
      |),
      |cell AS (
      |  SELECT b.k, v.variant, v.voff, b.r, b.c,
      |    CASE WHEN v.variant = 3 AND b.r = b.k % 8 AND b.c = 1 + b.k % 7
      |      THEN 256 - b.tone ELSE b.tone END AS tone
      |  FROM base b, v
      |),
      |bits AS (
      |  SELECT * FROM (
      |    SELECT k, variant, voff, r, c,
      |      CASE WHEN lead(tone) OVER (PARTITION BY k, variant, r ORDER BY c)
      |                > tone THEN 1 ELSE 0 END AS bit
      |    FROM cell) WHERE c < 8
      |),
      |hashes AS (
      |  SELECT k, variant, voff,
      |    CAST(SUM(CASE WHEN r*8+c < 32
      |             THEN bit * (CAST(1 AS BIGINT) << (r*8+c))
      |             ELSE 0 END) AS BIGINT) AS lo,
      |    CAST(SUM(CASE WHEN r*8+c >= 32
      |             THEN bit * (CAST(1 AS BIGINT) << (r*8+c-32))
      |             ELSE 0 END) AS BIGINT) AS hi
      |  FROM bits GROUP BY k, variant, voff
      |),
      |ham AS (
      |  SELECT a.k, a.voff AS offa, b.voff AS offb,
      |    CAST(SUM(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0 END) AS BIGINT)
      |      AS hamming
      |  FROM bits a JOIN bits b
      |    ON a.k = b.k AND a.r = b.r AND a.c = b.c AND a.voff < b.voff
      |  GROUP BY a.k, a.voff, b.voff
      |)
      |SELECT stage, id_a, id_b, a, b FROM (
      |  SELECT 'hash' AS stage, k + voff AS id_a, CAST(-1 AS BIGINT) AS id_b,
      |         lo AS a, hi AS b
      |  FROM hashes
      |  UNION ALL
      |  SELECT 'pair', k + offa, k + offb, hamming,
      |         CAST((offb - offa) // 1000 AS BIGINT)
      |  FROM ham
      |) ORDER BY stage, id_a, id_b""".stripMargin

  /** VIDEO perceptual dedup on the full hash gate
    * ([[graft.operators.MediaHash.videoTemporalHash]] over
    * [[graft.operators.VideoCodec.decodeFrames]] at stride 2): renders
    * REAL 130-frame DIB AVIs (solid frames, the q53 formula colors) in
    * planted trios per nation — base, an fps-retimed container twin
    * (+1000), and a 2×-upscaled resolution twin (+2000) — then
    * hash-pins every video's 64-bit temporal dHash (as two 32-bit
    * halves) against a pure-arithmetic DuckDB replay of the frame-color
    * formula, plus the banded hamming pairs among the trios (all
    * hamming 0: the hash is provably invariant to fps and resolution,
    * the two classic re-encode perturbations — while the bytes differ
    * wildly). A frame-sampling bug, a luminance slip, a bucket-boundary
    * error, or a lost banding pair all break the hash. Pair rows are
    * restricted to the planted offsets (the q102 robustness pattern).
    */
  def q105VideoVhash(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    import graft.operators.{MediaHash, VideoCodec}
    import graft.operators.VideoCodec.VideoSpec
    val nations = Tables.nation(spark, d)
      .select(col("n_nationkey").cast("long").as("k")).as[Long].collect().sorted

    val specs = nations.flatMap { k =>
      val w = 6 + (k % 3).toInt; val h = 5 + (k % 2).toInt
      val (r0, g0, b0) =
        (((k * 37) % 256).toInt, ((k * 59) % 256).toInt, ((k * 83) % 256).toInt)
      Seq(
        VideoSpec(k, w, h, 130, r0, g0, b0, 10, "DIB "),
        VideoSpec(k + 1000, w, h, 130, r0, g0, b0, 25, "DIB "),
        VideoSpec(k + 2000, 2 * w, 2 * h, 130, r0, g0, b0, 10, "DIB "))
    }
    val frames = VideoCodec.decodeFrames(VideoCodec.renderAvis(
      spark.createDataset(specs.toSeq).repartition(4)), stride = 2)
    val hashes = MediaHash.videoTemporalHash(frames.toDF(), timeBuckets = 65)
      .cache()
    hashPairGate(hashes, "vhash", Seq(1000L, 2000L))
  }

  /** The temporal dHash replayed from the frame-color formula: sampled
    * frame p (stride 2 ⇒ frame 2p) has solid color
    * ((r0+14p)%256, (g0+22p)%256, (b0+26p)%256); with 65 sampled
    * frames in 65 buckets, bit p = lum(p+1) > lum(p) (the w·h pixel
    * factor cancels in every comparison — the resolution invariance
    * the +2000 twin exercises for real).
    */
  val q105Sql: String =
    """WITH k AS (SELECT CAST(n_nationkey AS BIGINT) AS k FROM nation),
      |v(voff) AS (VALUES (CAST(0 AS BIGINT)), (CAST(1000 AS BIGINT)),
      |                   (CAST(2000 AS BIGINT))),
      |lum AS (
      |  SELECT k.k, p.range AS p,
      |    299*((k.k*37 + 14*p.range) % 256)
      |      + 587*((k.k*59 + 22*p.range) % 256)
      |      + 114*((k.k*83 + 26*p.range) % 256) AS lum
      |  FROM k, range(65) p),
      |bits AS (
      |  SELECT * FROM (
      |    SELECT k, p,
      |      CASE WHEN lead(lum) OVER (PARTITION BY k ORDER BY p) > lum
      |           THEN 1 ELSE 0 END AS bit
      |    FROM lum) WHERE p < 64),
      |hashes AS (
      |  SELECT k,
      |    CAST(SUM(CASE WHEN p < 32 THEN bit * (CAST(1 AS BIGINT) << p)
      |             ELSE 0 END) AS BIGINT) AS lo,
      |    CAST(SUM(CASE WHEN p >= 32 THEN bit * (CAST(1 AS BIGINT) << (p-32))
      |             ELSE 0 END) AS BIGINT) AS hi
      |  FROM bits GROUP BY k)
      |SELECT stage, id_a, id_b, a, b FROM (
      |  SELECT 'hash' AS stage, h.k + v.voff AS id_a,
      |         CAST(-1 AS BIGINT) AS id_b, h.lo AS a, h.hi AS b
      |  FROM hashes h, v
      |  UNION ALL
      |  SELECT 'pair', h.k + a.voff, h.k + b.voff, CAST(0 AS BIGINT),
      |         CAST((b.voff - a.voff) // 1000 AS BIGINT)
      |  FROM hashes h, v a, v b WHERE a.voff < b.voff
      |) ORDER BY stage, id_a, id_b""".stripMargin

  /** AUDIO perceptual dedup on the full hash gate
    * ([[graft.operators.MediaHash.audioEnergyHash]] over REAL rendered
    * WAVE bytes): 65-segment amplitude-modulated square waves
    * ([[graft.operators.MediaHash.SegAudioSpec]], md5-derived tones) in
    * planted trios per nation — base, a +1-per-segment noise twin
    * (+1000, provably hash-invariant with different bytes), and a
    * one-segment re-levelled twin (+3000, a controlled ≤2-bit
    * perturbation) — hash-pinning every 64-bit energy dHash and the
    * banded hamming pairs among the trios against the pure-arithmetic
    * tone replay. A PCM decode slip, an energy-bucket boundary error,
    * a wrong rectification, or a banding miss all break the hash.
    */
  def q106AudioAhash(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    import graft.operators.MediaHash
    import graft.operators.MediaHash.SegAudioSpec
    val nations = Tables.nation(spark, d)
      .select(col("n_nationkey").cast("long").as("k")).as[Long].collect().sorted

    val specs = nations.flatMap { k =>
      Seq(
        SegAudioSpec(k, k, 65, 32, -1, noise = false),
        SegAudioSpec(k + 1000, k, 65, 32, -1, noise = true),
        SegAudioSpec(k + 3000, k, 65, 32, (k % 65).toInt, noise = false))
    }
    val hashes = MediaHash.audioEnergyHash(MediaHash.renderSegWavs(
      spark.createDataset(specs.toSeq).repartition(4)), timeBuckets = 65)
      .toDF().cache()
    hashPairGate(hashes, "ahash", Seq(1000L, 2000L, 3000L))
  }

  /** The energy dHash replayed from the segment-tone formula: segment
    * s's rectified energy sum is 32·amp (+1 on the noise twin — equal
    * counts, so every comparison is unchanged); the flip twin maps one
    * segment's tone through 14000−amp, touching only its two adjacent
    * comparisons.
    */
  val q106Sql: String =
    """WITH k AS (SELECT CAST(n_nationkey AS BIGINT) AS k FROM nation),
      |v(variant, voff) AS (VALUES (0, CAST(0 AS BIGINT)),
      |                            (1, CAST(1000 AS BIGINT)),
      |                            (3, CAST(3000 AS BIGINT))),
      |seg AS (
      |  SELECT k.k, s.range AS s,
      |    CASE WHEN CAST(('0x' || substr(md5(
      |           CAST(k.k AS VARCHAR) || '-' || CAST(s.range AS VARCHAR)
      |           ), 1, 1)) AS INT) >= 8
      |      THEN 12000 ELSE 2000 END AS amp
      |  FROM k, range(65) s),
      |cell AS (
      |  SELECT g.k, v.variant, v.voff, g.s,
      |    CAST(32 AS BIGINT) * (CASE WHEN v.variant = 3 AND g.s = g.k % 65
      |      THEN 14000 - g.amp ELSE g.amp END)
      |      + (CASE WHEN v.variant = 1 THEN 1 ELSE 0 END) AS esum
      |  FROM seg g, v),
      |bits AS (
      |  SELECT * FROM (
      |    SELECT k, variant, voff, s,
      |      CASE WHEN lead(esum) OVER (PARTITION BY k, variant ORDER BY s)
      |                > esum THEN 1 ELSE 0 END AS bit
      |    FROM cell) WHERE s < 64),
      |hashes AS (
      |  SELECT k, variant, voff,
      |    CAST(SUM(CASE WHEN s < 32 THEN bit * (CAST(1 AS BIGINT) << s)
      |             ELSE 0 END) AS BIGINT) AS lo,
      |    CAST(SUM(CASE WHEN s >= 32 THEN bit * (CAST(1 AS BIGINT) << (s-32))
      |             ELSE 0 END) AS BIGINT) AS hi
      |  FROM bits GROUP BY k, variant, voff),
      |ham AS (
      |  SELECT a.k, a.voff AS offa, b.voff AS offb,
      |    CAST(SUM(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0 END) AS BIGINT)
      |      AS hamming
      |  FROM bits a JOIN bits b
      |    ON a.k = b.k AND a.s = b.s AND a.voff < b.voff
      |  GROUP BY a.k, a.voff, b.voff
      |)
      |SELECT stage, id_a, id_b, a, b FROM (
      |  SELECT 'hash' AS stage, k + voff AS id_a, CAST(-1 AS BIGINT) AS id_b,
      |         lo AS a, hi AS b
      |  FROM hashes
      |  UNION ALL
      |  SELECT 'pair', k + offa, k + offb, hamming,
      |         CAST((offb - offa) // 1000 AS BIGINT)
      |  FROM ham
      |) ORDER BY stage, id_a, id_b""".stripMargin

  /** Pure arithmetic over nation: what a correct lossless codec
    * roundtrip MUST produce.
    */
  val q49Sql: String =
    """WITH k AS (SELECT CAST(n_nationkey AS BIGINT) AS k FROM nation),
      |img AS (
      |  SELECT k, 16 + (k % 5) * 8 AS w, 8 + (k % 3) * 8 AS h,
      |         (k * 37) % 256 AS r, (k * 59) % 256 AS g, (k * 83) % 256 AS b
      |  FROM k
      |)
      |SELECT n_nationkey, stage, a, b, c, d, e FROM (
      |  SELECT k AS n_nationkey, 'decode' AS stage, w AS a, h AS b,
      |         r * w * h AS c, g * w * h AS d, b * w * h AS e
      |  FROM img
      |  UNION ALL
      |  SELECT k, 'resize', 20, 12, r * 240, g * 240, b * 240 FROM img
      |  UNION ALL
      |  SELECT k, 'audio', 640 + k * 16, 8000, 500 + k * 777, 0, 0 FROM k
      |) ORDER BY stage, n_nationkey""".stripMargin
}
