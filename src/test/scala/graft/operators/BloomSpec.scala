package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class BloomSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val corpus = (0 until 200).map(i => (i.toLong, s"document body number $i"))

  test("no false negatives, ever: every built doc tests positive") {
    val df = corpus.toDF("id", "text")
    val filter = Bloom.build(df, "text")
    val got = Bloom.testMembership(df, filter, "id", "text")
      .filter(!col("maybe_member")).count()
    assert(got == 0, "a Bloom filter must never produce a false negative")
  }

  test("whitespace-normalized membership: reformatted text still matches") {
    val a = Seq((1L, "alpha beta   gamma")).toDF("id", "text")
    val filter = Bloom.build(a, "text")
    val probe = Seq((9L, "  ALPHA beta gamma "), (10L, "alpha beta delta"))
      .toDF("id", "text")
    val got = Bloom.testMembership(probe, filter, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got(9L), "normalized variant must hit")
    assert(!got(10L), "different content must miss at this load factor")
  }

  test("false-positive rate stays near theory; filter is constant-size") {
    val inSet = corpus.toDF("id", "text")
    val filter = Bloom.build(inSet, "text", mBits = 1024, k = 5)
    // filter never exceeds mBits/64 word rows no matter the corpus
    assert(filter.count() <= 1024 / 64)
    val outSet = (1000 until 3000).map(i => (i.toLong, s"other text $i")).toDF("id", "text")
    val fp = Bloom.testMembership(outSet, filter, "id", "text", mBits = 1024, k = 5)
      .filter(col("maybe_member")).count()
    // n=200, m=1024, k=5 → p = (1 - e^(-kn/m))^k ≈ 0.092; allow wide slack
    assert(fp > 0 && fp < 2000 * 0.25, s"fp=$fp")
  }

  test("probe side plans a broadcast join, never a shuffle of the test corpus") {
    val df = corpus.toDF("id", "text")
    val plan = Bloom.testMembership(df, Bloom.build(df, "text"), "id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }
}
