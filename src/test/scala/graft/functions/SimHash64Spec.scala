package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.operators.Dedup

/** Pins bit-equality of the codegen'd [[SimHash64]] against the SQL
  * higher-order-function reference form — including the reference's
  * exact `split` semantics (leading/trailing empty tokens, the
  * empty-document singleton) that a naive tokenizer would drop.
  */
class SimHash64Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val cases = Seq(
    "the quick brown fox",
    "The Quick BROWN Fox", // case-insensitive
    "",                    // split("") = [""]
    " ",                   // leading AND trailing empty token
    "  leading run",
    "trailing run   ",
    "single",
    "a",
    "tabs\tand\nnewlines\r\nmixed",
    "unicode ÉÈ İstanbul STRAßE Σοφός",
    "emoji 😀 tokens 🎉🎉",
    "repeated repeated repeated repeated",
    "numbers 123 456.789 -42")

  test("codegen'd simhash is bit-identical to the SQL HOF form") {
    import spark.implicits._
    val rows = cases.toDF("text")
      .select(
        Dedup.simHash("text").as("fast"),
        Dedup.simHashRegex("text").as("ref"))
      .collect()
    rows.zip(cases).foreach { case (r, c) =>
      assert(r.getLong(0) == r.getLong(1),
        f"simhash divergence on '${c.take(30)}': ${r.getLong(0)}%016x vs ${r.getLong(1)}%016x")
    }
  }

  test("matches on the real documents corpus (every row)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val diff = docs
      .select(Dedup.simHash("text").as("fast"),
        Dedup.simHashRegex("text").as("ref"))
      .filter(col("fast") =!= col("ref"))
      .count()
    assert(diff == 0L, s"$diff documents fingerprint differently")
  }

  test("near-duplicates land near in hamming space; unrelated far") {
    import spark.implicits._
    val sigs = Seq(
      "the quick brown fox jumps over the lazy dog again and again",
      "the quick brown fox jumps over the lazy dog again and again x",
      "completely different subject matter about database engines")
      .toDF("text").select(Dedup.simHash("text")).collect().map(_.getLong(0))
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    assert(ham(sigs(0), sigs(1)) <= 3, "perturbed twin must be close")
    assert(ham(sigs(0), sigs(2)) > 10, "unrelated text must be far")
  }
}
