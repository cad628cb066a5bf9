package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.operators.TextAnalysis

/** Original-space span removal ([[DropDupSpansRaw]],
  * [[DropDupSentenceSpansRaw]] and their TextAnalysis operators):
  * verbatim within-run bytes, single-space run joins, indexing
  * equivalence with the normalized decision tier, and the
  * normalize-commutes property (lower + whitespace-collapse of the
  * raw output equals the normalized operator's output).
  */
class RawSpanOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("dropDuplicatedSpansRaw: casing and interior layout survive, spans excised") {
    // 'the end' (normalized) repeats 3 times corpus-wide at n=2 —
    // every occurrence masks; doc 1 carries mixed case, a tab and a
    // double space INSIDE kept runs that must survive verbatim
    val docs = Seq(
      (1L, "Alpha\tBeta  Gamma The End Delta"),
      (2L, "x y the end z"),
      (3L, "p q THE END r")).toDF("doc_id", "text")
    val got = TextAnalysis.dropDuplicatedSpansRaw(docs, "doc_id", "text",
      n = 2, minCount = 3)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "n_kept", "n_removed", "cleaned_text")
      .as[(Long, Long, Long, Long, String)].collect().toList
    assert(got == List(
      (1L, 6L, 4L, 2L, "Alpha\tBeta  Gamma Delta"),
      (2L, 5L, 3L, 2L, "x y z"),
      (3L, 5L, 3L, 2L, "p q r")))
  }

  test("dropDuplicatedSpansRaw: minRun drops shrapnel; full removal emits ''") {
    val docs = Seq(
      (1L, "dup one two three mid dup one two three"),
      (2L, "dup one two three mid dup one two three"),
      (3L, "dup one two three")).toDF("doc_id", "text")
    // n=4: 'dup one two three' hot (4 occurrences); 'mid' is a 1-token
    // surviving run — minRun=2 drops it
    val got = TextAnalysis.dropDuplicatedSpansRaw(docs, "doc_id", "text",
      n = 4, minCount = 3, minRun = 2)
      .orderBy("doc_id")
      .select("doc_id", "n_kept", "cleaned_text")
      .as[(Long, Long, String)].collect().toList
    assert(got.forall(_._3 == ""), s"all shrapnel dropped: $got")
    assert(got.map(_._2) == List(0L, 0L, 0L))
  }

  test("clean document emits its trimmed original text verbatim") {
    val docs = Seq((1L, "  No\tDuplicates  Here \n")).toDF("doc_id", "text")
    val got = TextAnalysis.dropDuplicatedSpansRaw(docs, "doc_id", "text")
      .select("cleaned_text").as[String].head()
    assert(got == "No\tDuplicates  Here")
  }

  test("raw sentence segmentation indexes identically to the normalized segmenter") {
    val cases = Seq(
      "One. Two! Three? Four",
      "a.b no break",
      ". .",
      "end.",
      "end. ",
      "Multi  space. After\t\ntab. Done",
      "", "   ",
      "no punctuation at all",
      "Tail punct mid. trailing. ")
    cases.foreach { s =>
      val normCount = spark.range(1)
        .select(size(TextAnalysis.sentences(lit(s))).cast("long")).as[Long].head()
      val rawCount = spark.range(1).select(
        org.apache.spark.sql.graftshim.ColumnExpr.column(
          DropDupSentenceSpansRaw(
            org.apache.spark.sql.graftshim.ColumnExpr.expr(lit(s)),
            org.apache.spark.sql.graftshim.ColumnExpr.expr(
              typedlit(Array.empty[Long])), 2)).getField("n_sentences"))
        .as[Long].head()
      assert(rawCount == normCount, s"sentence count mismatch on '$s'")
    }
  }

  test("dropDuplicatedSentenceSpansRaw: original casing kept, dup spans excised") {
    // 'Visit our store. Thanks. Bye.' is a shared 3-sentence tail —
    // global-first survivor keeps it ONLY in doc 1
    val docs = Seq(
      (1L, "Body One alpha. Body One beta. Visit our store. Thanks. Bye."),
      (2L, "Body Two alpha. Body Two beta. Visit our store. Thanks. Bye."))
      .toDF("doc_id", "text")
    val got = TextAnalysis.dropDuplicatedSentenceSpansRaw(
      docs, "doc_id", "text", spanLen = 3, minCount = 2)
      .orderBy("doc_id")
      .select("doc_id", "n_sentences", "n_kept", "cleaned_text")
      .as[(Long, Long, Long, String)].collect().toList
    assert(got == List(
      (1L, 5L, 5L,
        "Body One alpha. Body One beta. Visit our store. Thanks. Bye."),
      (2L, 5L, 2L, "Body Two alpha. Body Two beta.")))
  }

  test("normalize commutes: lower+collapse of raw output equals the normalized output") {
    val docs = Seq(
      (1L, "The Quick\tBrown  Fox. REPEATED span here now ok. Tail bit."),
      (2L, "other doc REPEATED span here now ok extra words beyond"),
      (3L, "third copy REPEATED span here now ok and more padding"),
      (4L, "clean text with nothing shared at all in this row"))
      .toDF("doc_id", "text")
    def norm(c: org.apache.spark.sql.Column) =
      regexp_replace(lower(trim(c)), "\\s+", " ")
    val rawN = TextAnalysis.dropDuplicatedSpansRaw(
      docs, "doc_id", "text", n = 4, minCount = 3)
      .select(col("doc_id"), norm(col("cleaned_text")).as("c"))
    val normed = TextAnalysis.dropDuplicatedSpans(
      docs, "doc_id", "text", n = 4, minCount = 3)
      .select(col("doc_id"), col("cleaned_text").as("c2"))
    val joined = rawN.join(normed, "doc_id")
      .select("doc_id", "c", "c2").as[(Long, String, String)]
      .collect().toList
    joined.foreach { case (id, a, b) => assert(a == b, s"doc $id: '$a' != '$b'") }
    // and the sentence tier
    val sdocs = Seq(
      (1L, "Aa bb. Cc dd. Shared one. Shared two. Shared three."),
      (2L, "Ee ff. Gg hh. Shared one. Shared two. Shared three."))
      .toDF("doc_id", "text")
    val sraw = TextAnalysis.dropDuplicatedSentenceSpansRaw(
      sdocs, "doc_id", "text", spanLen = 3, minCount = 2)
      .select(col("doc_id"), norm(col("cleaned_text")).as("c"))
    val snorm = TextAnalysis.dropDuplicatedSentenceSpans(
      sdocs, "doc_id", "text", spanLen = 3, minCount = 2)
      .select(col("doc_id"), col("cleaned_text").as("c2"))
    sraw.join(snorm, "doc_id").select("doc_id", "c", "c2")
      .as[(Long, String, String)].collect()
      .foreach { case (id, a, b) => assert(a == b, s"doc $id: '$a' != '$b'") }
  }

  test("raw span dedup: gram/span text never crosses an exchange") {
    // the q107 100 TB rule carried over: decision stages shuffle only
    // 8-byte hashed keys and skinny aggregates; the ONLY exchange
    // allowed to carry a string is the one doc-keyed join of the
    // corpus against its span starts
    val docs = Seq((1L, "a b c d e f"), (2L, "a b c d x y"))
      .toDF("doc_id", "text")
    Seq(
      TextAnalysis.dropDuplicatedSpansRaw(docs, "doc_id", "text",
        n = 4, minCount = 2),
      TextAnalysis.dropDuplicatedSentenceSpansRaw(
        Seq((1L, "A b. C d. E f."), (2L, "A b. C d. G h."))
          .toDF("doc_id", "text"), "doc_id", "text",
        spanLen = 2, minCount = 2)).foreach { out =>
      val stringExchanges = out.queryExecution.sparkPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.Exchange
            if e.output.exists(_.dataType ==
              org.apache.spark.sql.types.StringType) => e
      }
      assert(stringExchanges.size <= 1,
        s"corpus text crosses ${stringExchanges.size} exchanges:\n" +
          out.queryExecution.sparkPlan)
    }
  }
}
