package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** DSIR-style importance resampling (Xie et al. 2023, "Data Selection
  * for Language Models via Importance Resampling"): score every RAW
  * document by how target-like its hashed n-gram profile is —
  * `w(doc) = Σ_bigram ln(p_target(bucket)/p_raw(bucket))` under
  * +1-smoothed hashed-bigram unigram models — then keep the top slice.
  * The standard recipe for carving a domain-matched subcorpus out of a
  * web-scale crawl.
  *
  * Scale shape (the part that matters at 100 TB):
  *   - Each corpus is scanned ONCE; the only shuffles are two
  *     map-side-combined groupBys onto the m-bucket key space (≤ m
  *     rows reach the reduce side per corpus, regardless of input
  *     size) and one per-doc sum.
  *   - The fitted model is a ≤ m-row log-ratio table that rides a
  *     BROADCAST to the raw-side occurrence join — the corpus-sized
  *     side never shuffles for the scoring join.
  *   - Weights are integer-scaled per BUCKET (round(1e4·lr) as long)
  *     and per-doc sums add integers, so scores are bit-stable under
  *     any partitioning / summation order — and replayable by any
  *     engine with md5 + ln (the oracle re-derives them in SQL).
  *   - The gate's `selected` flag uses an exact global top-k rank
  *     (fixture-sized); at petabyte scale replace it with an
  *     approx-quantile weight threshold — one extra constant-size
  *     pass, no global sort.
  */
object Dsir {

  /** Adjacent word-bigram strings ("w1 w2") of a token array. */
  def bigramsOf(toks: Column): Column =
    when(size(toks) < 2, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(toks) - 1),
        i => concat(element_at(toks, i), lit(" "), element_at(toks, i + 1))))

  /** Portable feature bucket of a bigram: first 24 md5 bits mod m —
    * reproducible by any engine with md5 and integer ops.
    */
  def bucketOf(bg: Column, m: Int): Column =
    (conv(substring(md5(bg), 1, 6), 16, 10).cast("long") % m).cast("int")

  /** Per-doc (id, bucket) bigram occurrences. The token array is
    * materialized in its own projection BEFORE `bigramsOf` touches it:
    * `element_at` inside a higher-order-function lambda re-evaluates
    * its array child per element (no common-subexpression elimination
    * across the lambda boundary), so feeding `tokens(text)` in
    * directly would re-tokenize the document O(tokens) times per row —
    * measured 10× slower at sf0.1.
    */
  private def occurrences(df: DataFrame, idCol: String, textCol: String,
      m: Int): DataFrame =
    df.select(col(idCol).cast("long").as("doc_id"),
        TextAnalysis.tokens(col(textCol)).as("__toks"))
      .select(col("doc_id"), explode(bigramsOf(col("__toks"))).as("bg"))
      .select(col("doc_id"), bucketOf(col("bg"), m).as("b"))

  /** Score every `raw` document against the `target` corpus. Output:
    * `doc_id`, `n_bigrams`, `weight_e4` (Σ per-bucket
    * round(1e4·log-ratio), a long), `selected` (1 for the global
    * top-`keep` by (weight desc, doc_id), else 0).
    */
  def importanceWeights(raw: DataFrame, target: DataFrame,
      idCol: String, textCol: String, m: Int = 256,
      keep: Int = 100): DataFrame = {
    val tOcc = occurrences(target, idCol, textCol, m)
    val rOcc = occurrences(raw, idCol, textCol, m)
    val tc = tOcc.groupBy("b").agg(count(lit(1)).as("ct"))
    val rc = rOcc.groupBy("b").agg(count(lit(1)).as("cr"))
    val tTot = tOcc.agg(count(lit(1)).as("tt"))
    val rTot = rOcc.agg(count(lit(1)).as("rt"))
    // ≤ m-row fitted model; raw-side buckets always have cr ≥ 1, the
    // +1 smoothing absorbs target buckets never seen. Term order in
    // the double expression mirrors the oracle SQL exactly so both
    // engines round the same IEEE value.
    val lr = rc.join(tc, Seq("b"), "left")
      .crossJoin(tTot).crossJoin(rTot)
      .select(col("b"),
        round((log(coalesce(col("ct"), lit(0L)) + lit(1))
          - log(col("tt") + lit(m))
          - log(col("cr") + lit(1))
          + log(col("rt") + lit(m))) * lit(10000))
          .cast("long").as("lr_e4"))
    val scored = rOcc.join(broadcast(lr), Seq("b"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum("lr_e4").as("weight_e4"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("weight_e4").desc, col("doc_id").asc)
    scored
      .withColumn("selected",
        when(row_number().over(w) <= keep, lit(1)).otherwise(lit(0)))
      .select("doc_id", "n_bigrams", "weight_e4", "selected")
  }
}
