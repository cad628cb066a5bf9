package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.operators.ImageHash.{BlockImageSpec, ImageDHash}

/** Pins the perceptual-hash contract end-to-end on REAL PNG bytes:
  *
  *  - the dHash of a rendered block image equals the hash computed
  *    independently from the tone FORMULA (the whole render → encode →
  *    decode → block-sum → compare pipeline is exact);
  *  - per-block pixel noise (+1 on one pixel per block) leaves the
  *    hash bit-identical while changing the bytes — the invariance the
  *    dedup leg relies on;
  *  - a one-block tone flip moves the hash by at most 2 bits and
  *    [[ImageHash.hammingPairs]] finds exactly the brute-force pair
  *    set at maxHamming 3 (pigeonhole banding is exact, not
  *    probabilistic);
  *  - the non-divisible-size path (gridCols ∤ width) matches an
  *    independent mean-comparison reference on a gradient image.
  */
class ImageHashSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** The formula-side hash: what the oracle computes without pixels. */
  private def formulaHash(seed: Long, flipRow: Int, flipCol: Int): Long = {
    def tone(r: Int, c: Int): Int = {
      val t = ImageHash.blockTone(seed, r, c)
      if (r == flipRow && c == flipCol) 256 - t else t
    }
    var hash = 0L
    for (r <- 0 until 8; c <- 0 until 8)
      if (tone(r, c + 1) > tone(r, c)) hash |= 1L << (r * 8 + c)
    hash
  }

  private def hashOf(specs: Seq[BlockImageSpec]): Map[Long, Long] = {
    import spark.implicits._
    ImageHash.dHash(ImageHash.renderBlockImages(spark.createDataset(specs)))
      .collect().map(h => h.media_id -> h.dhash).toMap
  }

  test("rendered-image dHash equals the tone-formula hash for every seed") {
    val specs = (0L until 12L).map(k =>
      BlockImageSpec(k, k, 3 + (k % 3).toInt, 2 + (k % 2).toInt, -1, -1,
        noise = false))
    val got = hashOf(specs)
    specs.foreach { s =>
      assert(got(s.media_id) === formulaHash(s.seed, -1, -1),
        s"seed=${s.seed}")
    }
  }

  test("per-block noise changes bytes but not the hash") {
    import spark.implicits._
    val base = BlockImageSpec(0L, 7L, 4, 3, -1, -1, noise = false)
    val noisy = base.copy(media_id = 1L, noise = true)
    val blobs = ImageHash.renderBlockImages(
      spark.createDataset(Seq(base, noisy))).collect()
    assert(!java.util.Arrays.equals(
      blobs.find(_.media_id == 0L).get.bytes,
      blobs.find(_.media_id == 1L).get.bytes), "noise must change the PNG")
    val got = hashOf(Seq(base, noisy))
    assert(got(0L) === got(1L), "noise must not change the dHash")
  }

  test("a one-block flip moves the hash by at most 2 bits") {
    (0L until 12L).foreach { k =>
      val d = java.lang.Long.bitCount(
        formulaHash(k, -1, -1) ^ formulaHash(k, (k % 8).toInt, 1 + (k % 7).toInt))
      assert(d <= 2, s"seed=$k flip hamming $d")
    }
  }

  test("hammingPairs returns exactly the brute-force pair set at maxHamming 3") {
    import spark.implicits._
    val specs = (0L until 20L).flatMap { k =>
      Seq(BlockImageSpec(k, k, 3, 2, -1, -1, noise = false),
        BlockImageSpec(k + 100, k, 3, 2, (k % 8).toInt, 1 + (k % 7).toInt,
          noise = false))
    }
    val hashes = hashOf(specs)
    val expected = (for {
      a <- hashes.keys; b <- hashes.keys if a < b
      h = java.lang.Long.bitCount(hashes(a) ^ hashes(b)) if h <= 3
    } yield (a, b, h.toLong)).toSet
    val df = hashes.toSeq.toDF("media_id", "dhash")
    val got = ImageHash.hammingPairs(df, "media_id", "dhash", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expected)
    assert(expected.size >= 20, "every planted flip pair must be present")
  }

  test("non-divisible sizes use the exact cross-multiplied mean comparison") {
    import spark.implicits._
    // 13x10 gradient: pixel value = x * 17 % 251, grayscale
    val img = new java.awt.image.BufferedImage(13, 10,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 10; x <- 0 until 13) {
      val v = x * 17 % 251
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val got = ImageHash.dHash(spark.createDataset(
      Seq(Multimodal.MediaRecord(0L, "image", out.toByteArray))))
      .collect().head.dhash
    // independent reference: same block definition, BigInt mean compare
    val sums = Array.ofDim[Long](8, 9); val counts = Array.ofDim[Long](8, 9)
    for (y <- 0 until 10; x <- 0 until 13) {
      val (br, bc) = (y * 8 / 10, x * 9 / 13)
      sums(br)(bc) += 1000L * (x * 17 % 251); counts(br)(bc) += 1
    }
    var want = 0L
    for (r <- 0 until 8; c <- 0 until 8)
      if (BigInt(sums(r)(c + 1)) * counts(r)(c) >
          BigInt(sums(r)(c)) * counts(r)(c + 1)) want |= 1L << (r * 8 + c)
    assert(got === want)
  }

  test("dHash128 equals an independent 17x8 grid reference on a gradient") {
    import spark.implicits._
    // 23x11 gradient (both dims non-divisible by the 17x8 grid)
    val img = new java.awt.image.BufferedImage(23, 11,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 11; x <- 0 until 23) {
      val t = (x * 31 + y * 7) % 251
      img.setRGB(x, y, (t << 16) | (t << 8) | t)
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val got = ImageHash.dHash128(spark.createDataset(
      Seq(Multimodal.MediaRecord(0L, "image", out.toByteArray))))
      .collect().head
    // independent reference: same block definition, BigInt mean compare
    val sums = Array.ofDim[Long](8, 17); val counts = Array.ofDim[Long](8, 17)
    for (y <- 0 until 11; x <- 0 until 23) {
      val (br, bc) = (y * 8 / 11, x * 17 / 23)
      sums(br)(bc) += 1000L * ((x * 31 + y * 7) % 251); counts(br)(bc) += 1
    }
    var wantLo = 0L; var wantHi = 0L
    for (r <- 0 until 8; c <- 0 until 16)
      if (BigInt(sums(r)(c + 1)) * counts(r)(c) >
          BigInt(sums(r)(c)) * counts(r)(c + 1)) {
        val b = r * 16 + c
        if (b < 64) wantLo |= 1L << b else wantHi |= 1L << (b - 64)
      }
    assert((got.dhash_hi, got.dhash_lo) === ((wantHi, wantLo)))
    assert(got.dhash_hi != 0L,
      "the gradient must exercise bits above 64 or the test proves nothing")
  }

  test("hammingPairs128 equals brute force and is exact to hamming 6") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // 15 random 128-bit bases, each with a twin at hamming j (j = id%8:
    // 0..7 distinct bit flips — 7 is PAST the exactness bound and must
    // be excluded by the verify filter, not silently half-found)
    val rows = (0L until 15L).flatMap { g =>
      val hi = rnd.nextLong(); val lo = rnd.nextLong()
      val j = (g % 8).toInt
      // flip j distinct bit positions derived from g
      var thi = hi; var tlo = lo
      (0 until j).foreach { i =>
        val b = (math.abs(g * 31 + i * 17) % 128).toInt
        if (b < 64) tlo ^= 1L << b else thi ^= 1L << (b - 64)
      }
      Seq((g, hi, lo), (g + 1000L, thi, tlo))
    }
    val expected = (for {
      (a, ahi, alo) <- rows; (b, bhi, blo) <- rows if a < b
      h = java.lang.Long.bitCount(ahi ^ bhi) + java.lang.Long.bitCount(alo ^ blo)
      if h <= 6
    } yield (a, b, h.toLong)).toSet
    val df = rows.toDF("media_id", "dhash_hi", "dhash_lo")
    val got = ImageHash.hammingPairs128(df, "media_id", "dhash_hi",
        "dhash_lo", maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expected)
    assert(expected.size >= 12, "the planted twins at h <= 6 must be present")
    assert(!got.exists(_._3 > 6), "nothing past the exactness bound")
    // the bound is a contract, not a suggestion
    intercept[IllegalArgumentException] {
      ImageHash.hammingPairs128(df, "media_id", "dhash_hi", "dhash_lo",
        maxHamming = 7)
    }
    // candidate generation is a hash equi-join on the composite key,
    // never a cartesian/BNLJ (materialize=false exposes the lazy plan)
    val plan = ImageHash.hammingPairs128(df, "media_id", "dhash_hi",
        "dhash_lo", maxHamming = 6, materialize = false)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
           !plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
  }

  test("the q102 gate restriction keeps only planted-offset pairs") {
    val df = graft.queries.MediaQueries.q102ImageDhash(spark,
      "/root/testdata/sf0.001")
    val pairs = df.filter(col("stage") === "pair")
    // 25 keys x 3 planted relationships, all present, hamming <= 2
    assert(pairs.count() === 75L)
    assert(pairs.filter(col("a") > 2).count() === 0L)
    val noisePairs = pairs.filter(col("b") === 1L)
    assert(noisePairs.count() === 25L)
    assert(noisePairs.filter(col("a") =!= 0L).count() === 0L,
      "noise copies must pair at hamming 0")
  }
}
