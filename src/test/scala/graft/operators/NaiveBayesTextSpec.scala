package graft.operators

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
}
