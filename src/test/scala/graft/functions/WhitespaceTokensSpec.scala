package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.operators.TextAnalysis

/** Pins bit-equality of the codegen'd [[WhitespaceTokens]] against the
  * declarative regex form it replaces (same discipline as
  * MinHashSignatureSpec): any divergence would silently shift every
  * text query off its DuckDB oracle.
  */
class WhitespaceTokensSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val cases = Seq(
    "the Quick BROWN fox",
    "  leading and trailing   ",
    "\ttabs\tand\nnewlines\r\nandvtff",
    "single",
    "",
    " ",
    "\t\n\r ",
    "x",
    "a  b   c    d",
    "MiXeD CaSe WiTh 123 and punct!?#@",
    "unicode ÉÈ İstanbul STRAßE Σοφός",
    "cjk 中文 日本語 mixed ASCII",
    "emoji 😀 tokens 🎉🎉",
    "hy-phen under_score dot.sep co:lon",
    "num 3.14159 -42 1e10")

  test("codegen'd tokens are bit-identical to the regex form") {
    import spark.implicits._
    val df = cases.toDF("text")
      .select(
        TextAnalysis.tokens(col("text")).as("fast"),
        TextAnalysis.tokensRegex(col("text")).as("ref"))
    val rows = df.collect()
    rows.zip(cases).foreach { case (r, c) =>
      val fast = r.getSeq[String](0)
      val ref = r.getSeq[String](1)
      assert(fast == ref, s"tokenizer divergence on ${c.take(40)}: $fast vs $ref")
    }
  }

  test("matches on the real documents corpus (every row, every token)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val diff = docs.select(
        TextAnalysis.tokens(col("text")).as("fast"),
        TextAnalysis.tokensRegex(col("text")).as("ref"))
      .filter(col("fast") =!= col("ref"))
      .count()
    assert(diff == 0L, s"$diff documents tokenize differently")
  }

  test("null text stays null") {
    import spark.implicits._
    val r = Seq[Option[String]](None, Some("a b")).toDF("text")
      .select(TextAnalysis.tokens(col("text")).as("t")).collect()
    assert(r.exists(_.isNullAt(0)) && r.exists(!_.isNullAt(0)))
  }
}
