package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed multinomial Naive Bayes text classifier over hashed
  * token features — the TRAINED tier of corpus quality/domain
  * filtering (the CCNet/fastText pattern: classify each document
  * against reference domains, keep/weight by predicted class), next
  * to the heuristic tier ([[TextAnalysis.qualityScore]]) and the
  * LM-perplexity tier ([[TextAnalysis.unigramLogprob]], [[NgramLm]]).
  *
  * Scale shape — the whole point of NB here is that it trains in ONE
  * pass at any corpus size:
  *  - training is a single map-side-combinable `groupBy(label,
  *    feature).count()` shuffle whose state is bounded by
  *    `classes × numBuckets` rows (the token hash-bucketing caps the
  *    feature space, fastText-style), NOT by the corpus;
  *  - the model (weights + per-class priors/defaults) is a
  *    classes × buckets table — kilobytes — broadcast for scoring;
  *  - scoring is map-side only: per-doc bucket counts joined against
  *    the BROADCAST model, one `Window.partitionBy(doc)` over
  *    `classes` rows per doc for the argmax. No shuffle grows with
  *    the corpus beyond the per-doc aggregate itself.
  *
  * Exact-integer portability (the repo's gate discipline): per-term
  * log-weights are integer e4 units via ONE explicit
  * `round(ln(·)·10⁴)` — both engines round the identical IEEE double
  * (the proven q45/q74 shape) — and every downstream sum/argmax is
  * exact integer arithmetic with a deterministic `(score DESC, label
  * ASC)` tie-break.
  *
  * Smoothing is add-one over the bucket space: weight(c, f) =
  * ln((n_cf + 1) / (N_c + numBuckets)); a bucket unseen in class c
  * contributes the class default ln(1 / (N_c + numBuckets)).
  */
object NaiveBayesText {

  /** Trained model: `weights` = (label, feature, w_e4) for observed
    * (class, bucket) pairs; `classes` = (label, prior_e4, default_e4)
    * — one row per class, including classes whose docs had no tokens.
    * Both are classes×buckets-bounded and broadcastable. The model
    * CARRIES its bucket count so scoring cannot hash features into a
    * different space than the one the weights were trained in.
    */
  final case class Model(weights: DataFrame, classes: DataFrame,
      numBuckets: Int)

  /** The portable token feature: the house md5 bucket
    * ([[Dsir.bucketOf]]; DuckDB form
    * `CAST(('0x'||substr(md5(tok),1,6)) AS BIGINT) % numBuckets`).
    */
  private def bucket(tok: Column, numBuckets: Int): Column =
    Dsir.bucketOf(tok, numBuckets)

  private def lnE4(c: Column): Column = round(log(c) * 10000).cast("long")

  /** Character n-grams of the lowercased, whitespace-collapsed text —
    * the fastText/CLD-class feature for LANGUAGE identification, where
    * token features fail (an unseen language shares few whole words
    * with the training corpus but its character statistics are
    * stable). NON-distinct (multinomial NB counts occurrences), with
    * the same short-text clamp as the shingle tier: text shorter than
    * `n` yields itself as the single gram. Portable: DuckDB replays as
    * `substring(s, i, n)` over `generate_series(1,
    * greatest(length(s)-n+1, 1))` on the identically normalized
    * string.
    */
  def charGrams(textCol: Column, n: Int): Column = {
    // whitespace is pinned to the EXPLICIT ASCII class, not `\s`:
    // Java's \s includes \x0B (vertical tab) while DuckDB/RE2's does
    // not, so a corpus document carrying \x0B would silently diverge
    // engine from oracle under the shorthand. Both sides replay this
    // exact class (q127/q128/q131 oracles). Unicode whitespace
    // (U+00A0, U+3000 — common in CJK web text) deliberately SURVIVES
    // into grams on both sides: it is signal for language
    // identification, unlike the WhitespaceTokens tier where it would
    // corrupt token boundaries.
    val s = regexp_replace(lower(trim(textCol)), "[ \\t\\n\\x0B\\f\\r]+", " ")
    // codegen'd one-codepoint-walk kernel — the declarative
    // transform+substring form is O(len²) per doc (substring seeks
    // from the start per window); bit-identical output, spec-pinned
    org.apache.spark.sql.graftshim.ColumnExpr.column(
      graft.functions.CharNGrams(
        org.apache.spark.sql.graftshim.ColumnExpr.expr(s), n))
  }

  def train(df: DataFrame, labelCol: String, textCol: String,
      numBuckets: Int = 1024): Model =
    trainFeatures(df, labelCol,
      TextAnalysis.tokens(col(textCol)), numBuckets)

  /** NB over character n-gram features — the trained LANGUAGE-ID tier
    * (q127), next to the heuristic stopword tier
    * ([[TextAnalysis.langId]]). Same one-pass training shape; state is
    * still classes × numBuckets.
    */
  def trainCharGrams(df: DataFrame, labelCol: String, textCol: String,
      n: Int = 3, numBuckets: Int = 256): Model =
    trainFeatures(df, labelCol, charGrams(col(textCol), n), numBuckets)

  /** Per-(label, bucket) feature counts of a labeled corpus — the
    * sufficient statistics of the classifier, and its PERSISTENCE
    * format (the bundled language profiles,
    * [[LangProfiles]], are exactly these rows rendered to a text
    * resource).
    */
  private[graft] def featureCounts(df: DataFrame, labelCol: String,
      features: Column, numBuckets: Int): DataFrame =
    df.select(col(labelCol).as("__lbl"), explode(features).as("__tok"))
      .select(col("__lbl"), bucket(col("__tok"), numBuckets).as("__f"))
      .groupBy("__lbl", "__f").agg(count(lit(1)).as("__n"))

  /** Build a [[Model]] from sufficient statistics — `counts` =
    * `(__lbl, __f, __n)` per-(class, bucket) feature counts,
    * `docCounts` = `(__lbl, __D)` per-class document counts. Training
    * derives the statistics from a labeled corpus and routes through
    * here; a STORED profile (the bundled language tier) loads its
    * rows and routes through the same arithmetic — so pretrained ==
    * retrained over the same text, bit for bit (LangProfilesSpec pins
    * it).
    */
  def fromCounts(counts: DataFrame, docCounts: DataFrame,
      numBuckets: Int): Model = {
    require(numBuckets >= 2, s"numBuckets must be >= 2, got $numBuckets")
    val totals = counts.groupBy("__lbl").agg(sum("__n").as("__tc"))
    // class universe from the DOCS (a class whose docs are all empty
    // still gets a prior and a default weight), token totals joined in
    val totalDocs = docCounts.agg(sum("__D").as("__Dt"))
    val classes = docCounts
      .join(totals, Seq("__lbl"), "left")
      .withColumn("__tc", coalesce(col("__tc"), lit(0L)))
      .crossJoin(broadcast(totalDocs))
      .select(col("__lbl"),
        lnE4(col("__D").cast("double") / col("__Dt").cast("double"))
          .as("prior_e4"),
        lnE4(lit(1.0) / (col("__tc") + numBuckets).cast("double"))
          .as("default_e4"))
    val weights = counts.join(totals, "__lbl")
      .select(col("__lbl"), col("__f"),
        lnE4((col("__n") + 1).cast("double") /
          (col("__tc") + numBuckets).cast("double")).as("w_e4"))
    Model(weights, classes, numBuckets)
  }

  private def trainFeatures(df: DataFrame, labelCol: String,
      features: Column, numBuckets: Int): Model = {
    require(numBuckets >= 2, s"numBuckets must be >= 2, got $numBuckets")
    val docCounts = df.groupBy(col(labelCol).as("__lbl"))
      .agg(count(lit(1)).as("__D"))
    fromCounts(featureCounts(df, labelCol, features, numBuckets),
      docCounts, numBuckets)
  }

  /** Per-document argmax classification: (idCol, pred, score_e4) —
    * `pred` the winning label with `(score DESC, label ASC)`
    * tie-break, `score_e4` its exact integer score. Documents with no
    * tokens score on priors alone.
    */
  def classify(df: DataFrame, idCol: String, textCol: String,
      model: Model): DataFrame =
    classifyFeatures(df, idCol, TextAnalysis.tokens(col(textCol)), model)
      .select(col(idCol), col("pred"), col("score_e4"))

  /** Char-n-gram classification with the top-2 MARGIN — the
    * language-ID confidence signal a gating pipeline thresholds on
    * (a low margin means "ambiguous, route to the fallback"). Returns
    * `(idCol, pred, score_e4, margin_e4)`; margin is the exact integer
    * gap to the runner-up (0 when the top two scores tie).
    */
  def classifyCharGramsWithMargin(df: DataFrame, idCol: String,
      textCol: String, model: Model, n: Int = 3): DataFrame =
    classifyFeatures(df, idCol, charGrams(col(textCol), n), model)

  private def classifyFeatures(df: DataFrame, idCol: String,
      features: Column, model: Model): DataFrame = {
    // explode_outer keeps zero-feature docs in the frame as one
    // null-bucket row (scored 0 below, so they land on priors alone) —
    // the doc universe never needs the separate df×classes crossJoin +
    // re-join the previous shape paid (one whole exchange + a second
    // source scan, guide §2.4)
    val db = df
      .select(col(idCol), explode_outer(features).as("__tok"))
      .select(col(idCol), bucket(col("__tok"), model.numBuckets).as("__f"))
      .groupBy(col(idCol), col("__f")).agg(count(lit(1)).as("__c"))
    // prior folded into the per-(doc, class) aggregation: it is
    // constant within the group, so `max` re-attaches it for free
    val scores = db
      .crossJoin(broadcast(model.classes))
      .join(broadcast(model.weights), Seq("__lbl", "__f"), "left")
      .select(col(idCol), col("__lbl"), col("prior_e4"),
        when(col("__f").isNull, lit(0L))
          .otherwise(col("__c") * coalesce(col("w_e4"), col("default_e4")))
          .as("__s"))
      .groupBy(col(idCol), col("__lbl"))
      .agg((sum("__s") + max("prior_e4")).as("score_e4"))
    // argmax + runner-up from ONE aggregation over the `classes` rows
    // per doc — sorting the (−score, label) structs replays the exact
    // (score DESC, label ASC) tie-break the old window used, without
    // the window's extra exchange + sort (the groupBy above hashes on
    // (id, label), so the window re-shuffled on id every time)
    scores
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(
        (-col("score_e4")).as("n"), col("__lbl").as("l")))).as("__a"))
      .select(col(idCol),
        col("__a")(0).getField("l").as("pred"),
        (-col("__a")(0).getField("n")).as("score_e4"),
        coalesce(col("__a")(1).getField("n") - col("__a")(0).getField("n"),
          lit(0L)).as("margin_e4"))
  }
}
