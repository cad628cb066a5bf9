package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The bundled language-profile tier ([[LangProfiles]], q131): the
  * shipped resource must equal a regeneration from the samples (no
  * drift), the loaded model must be bit-identical to training on the
  * samples, and classification must work out of the box across
  * scripts.
  */
class LangProfilesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("bundled profiles == regenerate(samples) — the no-drift pin") {
    val bundled = new String(
      scala.io.Source.fromInputStream(
        getClass.getClassLoader.getResourceAsStream(
          LangProfiles.ProfilesResource), "UTF-8").mkString)
    assert(bundled == LangProfiles.renderProfiles(spark),
      "lang_profiles.dat is stale — rerun graft.tools.GenLangProfiles")
  }

  test("samples cover >= 5 scripts and labels are unique") {
    val s = LangProfiles.samples
    assert(s.map(_._1).distinct.size == s.size)
    assert(s.size >= 20)
    // representative codepoints per script family
    def hasScript(pred: Int => Boolean) =
      s.exists(_._2.codePoints().toArray.exists(pred(_)))
    assert(hasScript(c => c >= 'a' && c <= 'z'), "latin")
    assert(hasScript(c => c >= 0x0400 && c <= 0x04FF), "cyrillic")
    assert(hasScript(c => c >= 0x0590 && c <= 0x05FF), "hebrew")
    assert(hasScript(c => c >= 0x0600 && c <= 0x06FF), "arabic")
    assert(hasScript(c => c >= 0x0900 && c <= 0x097F), "devanagari")
    assert(hasScript(c => c >= 0x4E00 && c <= 0x9FFF), "han")
    assert(hasScript(c => c >= 0xAC00 && c <= 0xD7AF), "hangul")
    assert(hasScript(c => c >= 0x0E00 && c <= 0x0E7F), "thai")
    assert(hasScript(c => c >= 0x0370 && c <= 0x03FF), "greek")
  }

  test("bundled model is bit-identical to training on the samples") {
    val bundled = LangProfiles.bundledModel(spark)
    val trained = NaiveBayesText.trainCharGrams(
      LangProfiles.samplesDF(spark), "label", "text",
      n = LangProfiles.NGramSize, numBuckets = LangProfiles.NumBuckets)
    assert(bundled.numBuckets == trained.numBuckets)
    def wset(m: NaiveBayesText.Model) = m.weights
      .select(col("__lbl"), col("__f").cast("long"), col("w_e4"))
      .as[(String, Long, Long)].collect().toSet
    def cset(m: NaiveBayesText.Model) = m.classes
      .as[(String, Long, Long)].collect().toSet
    assert(wset(bundled) == wset(trained))
    assert(cset(bundled) == cset(trained))
  }

  test("out-of-the-box classification: every sample classifies as itself") {
    val docs = LangProfiles.samplesDF(spark)
      .select(col("label").as("id"), col("text"))
    val preds = NaiveBayesText.classifyCharGramsWithMargin(
        docs, "id", "text", LangProfiles.bundledModel(spark))
      .select("id", "pred").as[(String, String)].collect().toMap
    val wrong = preds.filter { case (l, p) => l != p }
    assert(wrong.isEmpty, s"misclassified: $wrong")
  }

  test("held-out-ish text (rotated word order) still classifies; empty text has zero margin") {
    val m = LangProfiles.bundledModel(spark)
    val rotated = LangProfiles.samples
      .filter { case (l, _) => Seq("en", "de", "ru", "ar", "ko").contains(l) }
      .map { case (l, t) =>
        val w = t.split(" ")
        (l, (w.drop(3) ++ w.take(3)).mkString(" "))
      }.toDF("id", "text")
    val preds = NaiveBayesText.classifyCharGramsWithMargin(
        rotated, "id", "text", m)
      .select("id", "pred").as[(String, String)].collect().toMap
    assert(preds.forall { case (l, p) => l == p }, s"rotated: $preds")
    // ambiguous input: the short-text clamp makes '' a single gram, so
    // scores differ only through the per-class DEFAULT weights (class
    // gram totals differ slightly) — a few-hundred-e4 margin, an order
    // of magnitude under any real-language margin. That gap is what
    // the routing tier thresholds on (q131 uses 1500).
    val amb = Seq(("x", "")).toDF("id", "text")
    val margin = NaiveBayesText.classifyCharGramsWithMargin(
        amb, "id", "text", m)
      .select("margin_e4").as[Long].head()
    assert(margin < 1500L,
      s"empty text must sit under the routing threshold, margin=$margin")
    val real = NaiveBayesText.classifyCharGramsWithMargin(
        Seq(("y", LangProfiles.samples.head._2)).toDF("id", "text"),
        "id", "text", m)
      .select("margin_e4").as[Long].head()
    assert(real > 10000L, s"a real passage must clear it decisively: $real")
  }
}
