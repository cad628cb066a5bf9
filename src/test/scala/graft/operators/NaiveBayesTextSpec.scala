package graft.operators

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Behavioral pins for the trained NB tier ([[NaiveBayesText]]):
  * planted separable classes recover perfectly; empty docs fall back
  * to priors with the deterministic label tie-break; the model stays
  * classes×buckets-bounded.
  */
class NaiveBayesTextSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def corpus = {
    import spark.implicits._
    // two classes with DISJOINT vocabularies (hash collisions across
    // 1024 buckets cannot merge whole vocabularies), 20 docs each
    (0L until 40L).map { i =>
      val cls = if (i < 20) "good" else "junk"
      val base = if (i < 20) "alpha" else "omega"
      val text = (0 until 12).map(j => s"$base${(i * 7 + j) % 9}").mkString(" ")
      (i, cls, text)
    }.toDF("doc_id", "label", "text")
  }

  test("disjoint-vocabulary classes self-classify perfectly") {
    val df = corpus
    val model = NaiveBayesText.train(df, "label", "text")
    val pred = NaiveBayesText.classify(df, "doc_id", "text", model)
      .join(df.select("doc_id", "label"), "doc_id")
      .collect()
    assert(pred.length == 40)
    pred.foreach { r =>
      assert(r.getAs[String]("pred") == r.getAs[String]("label"),
        s"misclassified: $r")
    }
  }

  test("model is classes x buckets bounded and empty docs score on priors") {
    import spark.implicits._
    val df = corpus
    val model = NaiveBayesText.train(df, "label", "text")
    assert(model.classes.count() == 2)
    assert(model.weights.count() <= 2L * 1024L)

    // an empty doc gets identical per-class token sums (zero), so the
    // winner is decided by prior + tie-break; with equal 20/20 priors
    // the tie-break must pick the alphabetically smallest label in
    // BOTH runs (determinism pin)
    val empty = Seq((99L, "good", "")).toDF("doc_id", "label", "text")
    val p1 = NaiveBayesText.classify(empty, "doc_id", "text", model)
      .collect().head
    val p2 = NaiveBayesText.classify(empty, "doc_id", "text", model)
      .collect().head
    assert(p1.getAs[String]("pred") == "good" &&
      p2.getAs[String]("pred") == "good",
      s"empty-doc tie must break to the smallest label: $p1 / $p2")
  }

  test("charGrams: non-distinct trigrams, whitespace-collapsed, short-text clamp") {
    import spark.implicits._
    val got = Seq(Tuple1("ABA  aba"), Tuple1("ab"), Tuple1("")).toDF("t")
      .select(NaiveBayesText.charGrams(col("t"), 3).as("g"))
      .as[Seq[String]].collect().toSeq
    // lowercased, "  " collapsed to one space; trigram "a a" repeats
    // via the collapse — NON-distinct (multinomial counts need it)
    assert(got(0) == Seq("aba", "ba ", "a a", " ab", "aba"))
    assert(got(1) == Seq("ab"), "short text yields itself as one gram")
    assert(got(2) == Seq(""), "empty text yields the empty gram")
  }

  test("CharNGrams kernel is bit-identical to the declarative transform form") {
    import spark.implicits._
    import org.apache.spark.sql.functions.expr
    // multi-byte codepoints included — the diacritic/CJK cases the
    // fixture languages produce; the kernel walks UTF-8 lead bytes
    val texts = Seq("ABA  aba", "ärger ëlf", "日本語のテスト", "ab", "a", "")
    val df = texts.map(Tuple1(_)).toDF("raw")
      .selectExpr("regexp_replace(lower(trim(raw)), '\\\\s+', ' ') AS s")
    val kernel = df.select(NaiveBayesText.charGrams(col("s"), 3).as("g"))
      .as[Seq[String]].collect().toSeq
    val declarative = df.select(expr(
      "transform(sequence(1, greatest(length(s) - 2, 1)), i -> substring(s, i, 3))"))
      .as[Seq[String]].collect().toSeq
    assert(kernel == declarative)
  }

  test("char-gram lang-ID: held-out docs classify by character statistics, margin exact") {
    import spark.implicits._
    // two 'languages' with disjoint character distributions; train on
    // ids < 30, classify ids >= 30 (held out — word overlap with the
    // training rows is partial, character statistics decide)
    val rows = (0L until 40L).map { i =>
      val lang = if (i % 2 == 0) "aa" else "bb"
      val text = if (i % 2 == 0) s"alpha gamma delta item$i alpha gamma"
        else s"zzyzx qqwqq xxkxx unit$i zzyzx qqwqq"
      (i, lang, text)
    }
    val df = rows.toDF("doc_id", "lang", "text")
    val model = NaiveBayesText.trainCharGrams(
      df.filter(col("doc_id") < 30), "lang", "text")
    val out = NaiveBayesText.classifyCharGramsWithMargin(
        df, "doc_id", "text", model)
      .join(df.select("doc_id", "lang"), "doc_id").collect()
    assert(out.length == 40)
    out.foreach { r =>
      assert(r.getAs[String]("pred") == r.getAs[String]("lang"),
        s"misclassified: $r")
      assert(r.getAs[Long]("margin_e4") > 0L,
        s"two disjoint alphabets must separate with positive margin: $r")
    }
  }
}
