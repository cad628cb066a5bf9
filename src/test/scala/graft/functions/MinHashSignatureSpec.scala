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

  test("signature is order-insensitive over the shingle set and 128-wide") {
    val a = Seq(("x", Seq("ab", "cd", "ef")), ("y", Seq("ef", "ab", "cd")))
      .toDF("id", "sh")
    val sigs = a.select(Dedup.minHashSignature("sh", 128).as("sig"))
      .collect().map(_.getSeq[Long](0))
    assert(sigs(0) == sigs(1), "min over a set is permutation-invariant")
    assert(sigs(0).length == 128)
  }
}
