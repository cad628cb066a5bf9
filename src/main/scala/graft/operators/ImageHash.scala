package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.awt.image.BufferedImage

import javax.imageio.ImageIO

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Perceptual image hashing (dHash) + hamming near-dup pairs — the
  * IMAGE leg of corpus deduplication. A multimodal training pipeline
  * dedups images the same way it dedups text: a compact
  * resolution/noise-invariant fingerprint per blob, then a banded
  * hamming self-join instead of an all-pairs pixel compare.
  *
  * The fingerprint is the classic difference hash (dHash): downsample
  * to a (gridCols × gridRows) luminance grid and emit one bit per
  * horizontal neighbor comparison — (gridCols−1) × gridRows = 64 bits
  * for the canonical 9×8 grid. Two deliberate exactness choices make
  * the hash ORACLE-ABLE (no float, no resampling kernel):
  *
  *  - the downsample is an exact integer BLOCK-SUM over the pixel
  *    grid (block c spans columns [c·w/9, (c+1)·w/9)), not a codec
  *    resize — every interpolation kernel (bilinear/bicubic/area)
  *    yields a different 9×8 image, but the block sum is a single
  *    well-defined integer any engine can replay;
  *  - luminance is integer ITU-R BT.601 scaled by 1000
  *    (299·R + 587·G + 114·B), and the neighbor comparison
  *    cross-multiplies by pixel counts (sum_next · n_cur >
  *    sum_cur · n_next, BigInt — widths may differ by one when
  *    gridCols ∤ w), so the bit is exact for ANY image size.
  *
  * Pairing reuses the pigeonhole banding of [[Dedup.simHashPairs]]:
  * 4 × 16-bit bands over the 64-bit hash guarantee every pair within
  * hamming ≤ 3 shares a verbatim band (h < bands ⇒ some band
  * untouched), so detection at the default threshold is EXACT, not
  * probabilistic. Candidates verify with `bit_count(xor)`.
  *
  * 100 TB notes: dHash is one decode pass per blob (CPU-bound, no
  * shuffle — scale = executors); the hash table is 16 bytes/image, so
  * the banded self-join shuffles hashes, never pixels. Degenerate
  * bands (e.g. the all-zero hash of solid images) are capped by
  * `maxBucketSize` exactly like the text LSH path.
  *
  * Reference scope: the reference engine (sosna/sdlt) has no media
  * surface; this is part of the training-data-pipeline mandate
  * (multimodal dedup).
  */
object ImageHash {

  /** 64-bit dHash + decoded dimensions; `media_id` keys back to the
    * blob. Bit (r·(gridCols−1) + c) is set iff block (r, c+1) outshines
    * block (r, c) — LSB-first packing.
    */
  case class ImageDHash(media_id: Long, dhash: Long, width: Int, height: Int)

  /** Fixture spec for the driver gate: a (9·sx) × (8·sy) image whose
    * 72 blocks each take tone 40 or 216 from an exact integer formula
    * over (seed, blockRow, blockCol) — so the dHash of the REAL
    * rendered-then-decoded PNG is formula-predictable in SQL (the
    * q49/q53 trick). `flipRow/flipCol ≥ 0` inverts one block's tone (a
    * controlled ≤2-bit hash perturbation); `noise` adds +1 to exactly
    * one pixel per block (same count every block, so every comparison
    * — including equal-tone ties — is provably unchanged: a
    * hash-invariant near-duplicate with genuinely different bytes).
    */
  case class BlockImageSpec(media_id: Long, seed: Long, sx: Int, sy: Int,
                            flipRow: Int, flipCol: Int, noise: Boolean)

  /** Tone of block (r, c) for `seed`: the top bit of
    * md5("seed-r-c") — the repo's portable-randomness idiom (any
    * engine with md5 replays it verbatim; unlike a linear-congruential
    * mix, hashes of different seeds are genuinely uncorrelated, so
    * fixtures carry ~16 of 64 bits with no cross-seed near-collisions).
    */
  def blockTone(seed: Long, r: Int, c: Int): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$seed-$r-$c".getBytes("UTF-8"))
    if ((d(0) & 0x80) != 0) 216 else 40
  }

  /** Render each spec to real PNG bytes. Same batch shape as
    * [[MediaCodec.renderImages]] (codec setup once per partition).
    */
  def renderBlockImages(ds: Dataset[BlockImageSpec]): Dataset[Multimodal.MediaRecord] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { batch =>
      ImageIO.setUseCache(false)
      batch.map { s =>
        val w = 9 * s.sx; val h = 8 * s.sy
        val tones = Array.tabulate(8, 9) { (r, c) =>
          if (r == s.flipRow && c == s.flipCol) 256 - blockTone(s.seed, r, c)
          else blockTone(s.seed, r, c)
        }
        val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val base = tones(y / s.sy)(x / s.sx)
            val tone =
              if (s.noise && x % s.sx == 0 && y % s.sy == 0) base + 1 else base
            img.setRGB(x, y, (tone << 16) | (tone << 8) | tone)
            x += 1
          }
          y += 1
        }
        val out = new ByteArrayOutputStream()
        require(ImageIO.write(img, "png", out), "no ImageIO writer for 'png'")
        Multimodal.MediaRecord(s.media_id, "image", out.toByteArray)
      }
    }
  }

  /** REAL decode → exact block-sum luminance grid → dHash. Fails
    * loudly on undecodable bytes (see [[MediaCodec.decodeImages]]).
    * Requires gridCols ≤ width and gridRows ≤ height (an empty block
    * has no luminance to compare).
    */
  def dHash(ds: Dataset[Multimodal.MediaRecord],
            gridCols: Int = 9, gridRows: Int = 8): Dataset[ImageDHash] = {
    import ds.sparkSession.implicits._
    require((gridCols - 1) * gridRows <= 64,
      s"dHash bits (${(gridCols - 1) * gridRows}) exceed 64")
    ds.mapPartitions { batch =>
      ImageIO.setUseCache(false)
      batch.map { m =>
        val img = ImageIO.read(new ByteArrayInputStream(m.bytes))
        require(img != null, s"media_id=${m.media_id}: bytes are not a decodable image")
        val (w, h) = (img.getWidth, img.getHeight)
        require(w >= gridCols && h >= gridRows,
          s"media_id=${m.media_id}: ${w}x$h smaller than the $gridCols x $gridRows grid")
        val px = img.getRGB(0, 0, w, h, null, 0, w)
        // exact block boundaries: block c spans [c*w/grid, (c+1)*w/grid)
        val sums = Array.ofDim[Long](gridRows, gridCols)
        val counts = Array.ofDim[Long](gridRows, gridCols)
        var y = 0
        while (y < h) {
          val br = (y.toLong * gridRows / h).toInt
          var x = 0
          while (x < w) {
            val bc = (x.toLong * gridCols / w).toInt
            val p = px(y * w + x)
            val lum = 299L * ((p >> 16) & 0xff) + 587L * ((p >> 8) & 0xff) +
              114L * (p & 0xff)
            sums(br)(bc) += lum
            counts(br)(bc) += 1L
            x += 1
          }
          y += 1
        }
        var hash = 0L
        var r = 0
        while (r < gridRows) {
          var c = 0
          while (c < gridCols - 1) {
            // mean comparison, cross-multiplied exactly: blocks in a row
            // can differ by one pixel column when gridCols does not
            // divide w, and sum*count can exceed Long for huge frames
            val gt = (BigInt(sums(r)(c + 1)) * counts(r)(c)) >
              (BigInt(sums(r)(c)) * counts(r)(c + 1))
            if (gt) hash |= 1L << (r * (gridCols - 1) + c)
            c += 1
          }
          r += 1
        }
        ImageDHash(m.media_id, hash, w, h)
      }
    }
  }

  /** Banded hamming near-dup pairs over any 64-bit hash column — the
    * [[Dedup.simHashPairs]] pipeline generalized to a precomputed
    * fingerprint (4 × 16-bit bands, pigeonhole-exact for
    * maxHamming ≤ 3, degenerate buckets capped, candidates verified
    * with `bit_count(xor)`). Returns (id_a, id_b, hamming), id_a <
    * id_b. The input is hashes only — 16 bytes a row — so even the
    * eager variant never shuffles blob bytes.
    */
  def hammingPairs(df: DataFrame, idCol: String, hashCol: String,
                   maxHamming: Int = 3, maxBucketSize: Int = 100000,
                   materialize: Boolean = true): DataFrame = {
    require(maxHamming <= 3,
      s"4x16-bit banding is exact only for maxHamming <= 3, got $maxHamming")
    val withSig = df.select(col(idCol).as("__id"), col(hashCol).as("__hh"))
    val chunked0 = withSig.select(col("__id"), col("__hh"), posexplode(expr(
      "transform(sequence(0, 3), c -> shiftright(__hh, c * 16) & 65535)"))
      .as(Seq("__chunk", "__ckey")))
    val chunked =
      if (materialize) chunked0.persist(StorageLevel.MEMORY_AND_DISK)
      else chunked0
    val sizes = chunked.groupBy("__chunk", "__ckey")
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n").between(2, maxBucketSize))
      .select("__chunk", "__ckey")
    val eligible0 = chunked.join(sizes, Seq("__chunk", "__ckey"))
    // persist discipline matches Dedup.simHashPairs: without this the
    // bucketed self-join recomputes the chunked⋈sizes join on both
    // sides (ADVICE r12)
    val eligible =
      if (materialize) eligible0.persist(StorageLevel.MEMORY_AND_DISK)
      else eligible0
    val result = eligible.as("l")
      .join(eligible.as("r"),
        col("l.__chunk") === col("r.__chunk") &&
        col("l.__ckey") === col("r.__ckey") &&
        col("l.__id") < col("r.__id"))
      .select(col("l.__id").as("id_a"), col("r.__id").as("id_b"),
        bit_count(col("l.__hh").bitwiseXOR(col("r.__hh"))).cast("long")
          .as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
    if (!materialize) result
    else {
      val out = Dedup.materializeSmall(result)
      chunked.unpersist(blocking = false)
      eligible.unpersist(blocking = false)
      out
    }
  }
}
