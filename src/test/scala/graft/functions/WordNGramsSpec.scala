package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.operators.{Contamination, TextAnalysis}

/** Pins bit-equality (values and order) of the codegen'd [[WordNGrams]]
  * against both declarative forms it replaces (multiset and distinct).
  */
class WordNGramsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("multiset and distinct n-grams match the declarative forms") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(TextAnalysis.tokens(col("text")).as("t"))
    Seq(2, 3, 8).foreach { n =>
      val diffMulti = docs.select(
          TextAnalysis.ngramsOfTokens(col("t"), n).as("fast"),
          TextAnalysis.ngramsOfTokensRegex(col("t"), n).as("ref"))
        .filter(col("fast") =!= col("ref")).count()
      assert(diffMulti == 0L, s"multiset n=$n diverged on $diffMulti docs")
      val diffDistinct = docs.select(
          Contamination.distinctNGramsOfTokens(col("t"), n).as("fast"),
          Contamination.distinctNGramsOfTokensRegex(col("t"), n).as("ref"))
        .filter(col("fast") =!= col("ref")).count()
      assert(diffDistinct == 0L, s"distinct n=$n diverged on $diffDistinct docs")
    }
  }

  test("edge cases: short arrays, exact-length, repeats") {
    import spark.implicits._
    val rows = Seq(
      Seq.empty[String], Seq("one"), Seq("a", "b"),
      Seq("a", "b", "c"), Seq("x", "x", "x", "x"))
      .toDF("t0")
      // force the non-null element type the expression requires
      .select(filter(col("t0"), x => x.isNotNull).as("t"))
    val out = rows.select(
        TextAnalysis.ngramsOfTokens(col("t"), 3).as("m"),
        Contamination.distinctNGramsOfTokens(col("t"), 3).as("d"))
      .collect()
    assert(out(0).getSeq[String](0) == Nil && out(0).getSeq[String](1) == Nil)
    assert(out(3).getSeq[String](0) == Seq("a b c"))
    assert(out(4).getSeq[String](0) == Seq("x x x", "x x x"))
    assert(out(4).getSeq[String](1) == Seq("x x x"))
  }
}
