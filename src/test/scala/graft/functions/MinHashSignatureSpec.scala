package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.operators.Dedup

class MinHashSignatureSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("codegen'd signature == SQL higher-order-function formulation") {
    val df = Seq(
      "the quick brown fox", "jumps over the lazy dog",
      "minhash signatures must be stable", "ünïcòde shïnglés too")
      .toDF("text")
      .select(Dedup.shingles("text", 5).as("sh"))
    val p = 4294967311L
    val sqlSig = expr(
      s"""transform(sequence(0, 63), j ->
         |  array_min(transform(sh, s ->
         |    pmod((pmod(xxhash64(concat('minhash-a-', j)), 1073741824) + 1)
         |         * pmod(xxhash64(s), 4294967296)
         |         + pmod(xxhash64(concat('minhash-b-', j)), $p), $p))))""".stripMargin)
    val rows = df.select(
      Dedup.minHashSignature("sh", 64).as("fast"),
      sqlSig.as("ref")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1),
        "compiled expression must reproduce the SQL formulation exactly")
    }
  }

  test("Barrett modP equals floorMod across the full 2^62 input domain") {
    val P = MinHashSignature.P
    // boundary values of every regime the reduction must cover: around
    // 0, around each small multiple of P, the a*h+b worst cases near
    // 2^62, and values straddling the q-off-by-one correction
    val boundary = Seq(0L, 1L, P - 1, P, P + 1, 2 * P - 1, 2 * P, 2 * P + 1,
      (1L << 62) - 1, (1L << 62) - P, ((1L << 62) / P) * P,
      ((1L << 62) / P) * P - 1, 1073741824L * 4294967295L + P - 1)
    boundary.foreach { v =>
      assert(MinHashSignature.modP(v) == Math.floorMod(v, P), s"v=$v")
    }
    val rnd = new scala.util.Random(7)
    (0 until 2000000).foreach { _ =>
      val v = rnd.nextLong() & ((1L << 62) - 1)
      assert(MinHashSignature.modP(v) == Math.floorMod(v, P), s"v=$v")
    }
  }

  test("signature is order-insensitive over the shingle set and 128-wide") {
    val a = Seq(("x", Seq("ab", "cd", "ef")), ("y", Seq("ef", "ab", "cd")))
      .toDF("id", "sh")
    val sigs = a.select(Dedup.minHashSignature("sh", 128).as("sig"))
      .collect().map(_.getSeq[Long](0))
    assert(sigs(0) == sigs(1), "min over a set is permutation-invariant")
    assert(sigs(0).length == 128)
  }
}
