package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interpolated bigram language-model scoring — the CCNet/KenLM-shaped
  * quality signal: train count tables on a corpus, score each document
  * by its per-token log-probability under the model. Documents whose
  * constructions the model finds surprising (boilerplate, gibberish,
  * off-domain text) score low and get filtered or down-weighted.
  *
  * Model, chosen so every term is exactly replayable by any engine:
  * for each bigram occurrence (w1, w2),
  * `p = ((cb(w1,w2) + 1) / (cu(w1) + V) + (cu(w2) + 1) / (T + V)) / 2`
  * — an even interpolation of the add-one-smoothed conditional and the
  * add-one unigram — and the doc score is
  * `Σ round(1e4 · ln p)` (per-TERM integer scaling, so the per-doc sum
  * adds longs and is partitioning-order independent).
  *
  * Scale shape: train = two map-side-combined groupBys (unigram and
  * bigram count tables, each bounded by the corpus's TYPE counts, not
  * its size); score = three shuffled equi-joins of the occurrence
  * stream against those tables on token keys (broadcast them instead
  * when the vocabulary is small — Spark decides via AQE/thresholds) and
  * one per-doc sum. No driver-side materialization anywhere.
  */
object NgramLm {

  /** Score every document of `df` under a bigram LM trained on `df`
    * itself (self-scoring — the usual corpus-cleaning setup; pass a
    * different training frame through `scoreAgainst` for
    * train-on-reference scoring). Output: `doc_id`, `n_bigrams`,
    * `logprob_e4` (Σ per-term round(1e4·ln p), long; 0 for docs with
    * fewer than two tokens).
    */
  def score(df: DataFrame, idCol: String, textCol: String): DataFrame =
    scoreAgainst(df, df, idCol, textCol)

  /** Score `docs` under a bigram LM trained on `train`. */
  def scoreAgainst(docs: DataFrame, train: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val trainToks = train.select(
      explode(TextAnalysis.tokens(col(textCol))).as("w"))
    val cu = trainToks.groupBy("w").agg(count(lit(1)).as("cu"))
    // scalars: T = token occurrences, V = distinct types
    val tot = cu.agg(sum("cu").as("t_total"),
      count(lit(1)).as("v_size"))
    // tokens materialized BEFORE bigramsOf — element_at inside the
    // lambda re-evaluates its array child per element otherwise (see
    // Dsir.occurrences)
    val cb = train
      .select(TextAnalysis.tokens(col(textCol)).as("__toks"))
      .select(explode(Dsir.bigramsOf(col("__toks"))).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("cb"))

    val occ = docs.select(col(idCol).cast("long").as("doc_id"),
        TextAnalysis.tokens(col(textCol)).as("__toks"))
      .select(col("doc_id"), explode(Dsir.bigramsOf(col("__toks"))).as("bg"))
      .select(col("doc_id"), col("bg"),
        split(col("bg"), " ").getItem(0).as("w1"),
        split(col("bg"), " ").getItem(1).as("w2"))

    // Term order and association mirror the oracle SQL exactly so both
    // engines round the same IEEE double.
    val scored = occ
      .join(cb, Seq("bg"), "left")
      .join(cu.select(col("w").as("w1"), col("cu").as("cu1")), Seq("w1"), "left")
      .join(cu.select(col("w").as("w2"), col("cu").as("cu2")), Seq("w2"), "left")
      .crossJoin(broadcast(tot))
      .select(col("doc_id"),
        round(log(
          ((coalesce(col("cb"), lit(0L)) + lit(1)).cast("double")
            / (coalesce(col("cu1"), lit(0L)) + col("v_size")).cast("double")
            + (coalesce(col("cu2"), lit(0L)) + lit(1)).cast("double")
              / (col("t_total") + col("v_size")).cast("double"))
            / lit(2).cast("double")) * lit(10000))
          .cast("long").as("term_e4"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum("term_e4").as("logprob_e4"))

    docs.select(col(idCol).cast("long").as("doc_id")).distinct()
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("logprob_e4"), lit(0L)).as("logprob_e4"))
  }
}
