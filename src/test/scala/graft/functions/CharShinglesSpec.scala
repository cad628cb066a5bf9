package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.operators.Dedup

/** Pins bit-equality (values AND first-occurrence order) of the
  * codegen'd [[CharShingles]] against the declarative
  * substring-per-window form every MinHash oracle mirrors.
  */
class CharShinglesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val cases = Seq(
    "the quick brown fox",
    "",            // -> [""]
    "ab",          // shorter than k -> [whole text]
    "abcd",        // k-1 windows... exactly length k - (k-1)
    "abcde",
    "aaaaaaaa",    // heavy dedup
    "abcabcabcabc",
    "unicode ÉÈ 中文字 😀😀ab",
    "  spaces   count  as chars ",
    "tabs\tand\nnewlines")

  test("codegen'd shingles are identical (values and order) to the SQL form") {
    import spark.implicits._
    val k = 5
    val rows = cases.toDF("text")
      .select(Dedup.shingles("text", k).as("fast"),
        Dedup.shinglesRegex("text", k).as("ref"))
      .collect()
    rows.zip(cases).foreach { case (r, c) =>
      assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"shingle divergence on '${c.take(30)}'")
    }
  }

  test("matches on the real documents corpus for several k") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    Seq(3, 5).foreach { k =>
      val diff = docs
        .select(Dedup.shingles("text", k).as("fast"),
          Dedup.shinglesRegex("text", k).as("ref"))
        .filter(col("fast") =!= col("ref"))
        .count()
      assert(diff == 0L, s"$diff documents shingle differently at k=$k")
    }
  }
}
