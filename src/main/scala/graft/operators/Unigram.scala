package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer (Kudo 2018, "Subword Regularization:
  * Improving Neural Network Translation Models with Multiple Subword
  * Candidates" — the SentencePiece unigram model, the OTHER half of
  * real pretraining tokenization next to [[Bpe]]): a vocabulary of
  * pieces with log-probabilities, trained by EM over the corpus, and
  * Viterbi (max-probability) segmentation at encode time.
  *
  * Scale split (the [[Bpe]] precedent): TRAINING's corpus-sized work
  * is ONE distributed word-frequency aggregation; the EM loop folds
  * over the capped word-TYPE table on the driver (metadata-sized,
  * capped deterministically by (count desc, word asc)). ENCODING is
  * embarrassingly parallel: the vocab rides a broadcast and a
  * per-partition word→pieces memo collapses repeated word types.
  *
  * Faithfulness and simplifications, stated plainly:
  *   - seeding uses weighted substring counts over the word types
  *     (capped, most-frequent-first) instead of Kudo's enhanced
  *     suffix array — same candidate family, simpler machinery;
  *   - the E-step uses Viterbi (hard-EM) counts rather than
  *     forward-backward expected counts — the standard hard-EM
  *     simplification; pruning keeps every single character so any
  *     word stays segmentable (the character-fallback invariant
  *     SentencePiece maintains).
  *
  * Determinism contract (what the q124 oracle replays): the FROZEN
  * vocab carries integer e6-scaled log-probs, so Viterbi maximizes an
  * exact integer sum; ties break by fewer pieces, then the
  * lexicographically smallest space-joined segmentation (a valid DP
  * order: two segmentations of one span can never be prefixes of each
  * other, so prefix comparison survives identical suffix appends).
  * Same vocab → same tokens, on any engine and any partitioning.
  */
object Unigram {

  /** Whitespace word-frequency table, capped deterministically —
    * the same contract as the BPE trainer's.
    */
  private def wordCounts(df: DataFrame, textCol: String,
      maxWordTypes: Int): Seq[(String, Long)] =
    df.select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w").asc)
      .limit(maxWordTypes)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  /** Viterbi best segmentation of `word` under integer piece scores —
    * shared by the trainer (on its interim integer-scaled scores),
    * [[encode]], and the spec's reference checks. Returns null when
    * some character has no covering piece (cannot happen for a vocab
    * that keeps all single chars of its training corpus; encode maps
    * it to the whole word as one out-of-vocabulary piece).
    */
  def viterbi(word: String, scores: collection.Map[String, Long],
      maxPieceLen: Int): Array[String] = {
    val L = word.length
    val NEG = Long.MinValue / 4
    val dpScore = Array.fill(L + 1)(NEG)
    val dpPieces = Array.fill(L + 1)(Int.MaxValue)
    val dpBack = Array.fill(L + 1)(-1)
    dpScore(0) = 0L
    dpPieces(0) = 0
    var i = 1
    while (i <= L) {
      var j = math.max(0, i - maxPieceLen)
      while (j < i) {
        if (dpScore(j) > NEG) {
          val piece = word.substring(j, i)
          scores.get(piece) match {
            case Some(s) =>
              val cs = dpScore(j) + s
              val cp = dpPieces(j) + 1
              // (score desc, pieces asc, segmentation-string asc):
              // for the string key it suffices to compare the two
              // candidate PREFIX segmentations; at equal (score,
              // pieces) the smaller back-pointer j yields the
              // lexicographically smaller full string only when the
              // prefix strings compare that way, so materialize the
              // comparison lazily via reconstruct()
              val better =
                cs > dpScore(i) ||
                (cs == dpScore(i) && cp < dpPieces(i)) ||
                (cs == dpScore(i) && cp == dpPieces(i) && dpBack(i) >= 0 && {
                  val cur = reconstruct(word, dpBack, i)
                  val cand = reconstruct(word, dpBack, j) match {
                    case "" => piece
                    case p => p + " " + piece
                  }
                  cand < cur
                })
              if (better) {
                dpScore(i) = cs; dpPieces(i) = cp; dpBack(i) = j
              }
            case None => ()
          }
        }
        j += 1
      }
      i += 1
    }
    if (dpScore(L) <= NEG) null
    else {
      val out = mutable.ArrayBuffer.empty[String]
      var p = L
      while (p > 0) { out += word.substring(dpBack(p), p); p = dpBack(p) }
      out.reverseIterator.toArray
    }
  }

  /** The space-joined segmentation of `word`'s first `upTo` chars
    * implied by the back-pointer table (tie-break comparisons only —
    * ties are rare, so the rebuild cost never shows).
    */
  private def reconstruct(word: String, back: Array[Int],
      upTo: Int): String = {
    if (upTo == 0) return ""
    val parts = mutable.ArrayBuffer.empty[String]
    var p = upTo
    while (p > 0) { parts += word.substring(back(p), p); p = back(p) }
    parts.reverseIterator.mkString(" ")
  }

  /** Train a unigram-LM vocabulary of (up to) `vocabSize` pieces.
    * Returns `(piece, score_e6)` pairs, score_e6 = round(ln p × 1e6),
    * sorted (score desc, piece asc) — the freeze-and-embed artifact
    * the q72 merge table established.
    */
  def train(df: DataFrame, textCol: String, vocabSize: Int,
      maxPieceLen: Int = 6, maxWordTypes: Int = 65536,
      emIters: Int = 4, seedFactor: Int = 4): Seq[(String, Long)] = {
    require(vocabSize >= 2, s"vocabSize must be >= 2, got $vocabSize")
    require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")
    val types = wordCounts(df, textCol, maxWordTypes)
    require(types.nonEmpty, "unigram training needs a non-empty corpus")
    // seed: weighted substring occurrence counts over the word types
    val subCounts = mutable.HashMap.empty[String, Long]
    types.foreach { case (w, n) =>
      var i = 0
      while (i < w.length) {
        var l = 1
        while (l <= maxPieceLen && i + l <= w.length) {
          val s = w.substring(i, i + l)
          subCounts.update(s, subCounts.getOrElse(s, 0L) + n)
          l += 1
        }
        i += 1
      }
    }
    val chars = subCounts.keysIterator.filter(_.length == 1).toSeq.sorted
    def topPieces(counts: collection.Map[String, Long], keep: Int): Seq[String] = {
      val multi = counts.iterator.filter(_._1.length > 1).toSeq
        .sortBy { case (p, c) => (-c, p) }
        .take(math.max(0, keep - chars.length)).map(_._1)
      chars ++ multi
    }
    var vocab = topPieces(subCounts, vocabSize * seedFactor)
    var counts: collection.Map[String, Long] = subCounts
    var iter = 0
    while (iter < emIters) {
      // interim scores: ln of the count share, e6-scaled to reuse the
      // integer Viterbi (training-internal representation only)
      val total = vocab.iterator.map(counts.getOrElse(_, 1L).max(1L)).sum
      val scores = vocab.iterator.map { p =>
        val c = counts.getOrElse(p, 1L).max(1L)
        p -> math.round(math.log(c.toDouble / total) * 1e6)
      }.toMap
      // hard-EM E-step: Viterbi piece counts over the type table
      val next = mutable.HashMap.empty[String, Long]
      types.foreach { case (w, n) =>
        val pieces = viterbi(w, scores, maxPieceLen)
        if (pieces != null) pieces.foreach { p =>
          next.update(p, next.getOrElse(p, 0L) + n)
        }
      }
      counts = next
      // prune toward the target size, never dropping single chars
      val target = if (iter == emIters - 1) vocabSize
        else math.max(vocabSize, vocab.size / 2)
      vocab = topPieces(counts, target)
      iter += 1
    }
    val total = vocab.iterator.map(counts.getOrElse(_, 1L).max(1L)).sum
    vocab.map { p =>
      val c = counts.getOrElse(p, 1L).max(1L)
      p -> math.round(math.log(c.toDouble / total) * 1e6)
    }.sortBy { case (p, s) => (-s, p) }
  }

  /** One encoded document: ordered pieces + count. */
  case class Encoded(id: Long, pieces: Seq[String], n_pieces: Long)

  /** Encode `textCol` of every row with a frozen vocab: `pieces`
    * (ordered subword strings) and `n_pieces`. A word no piece set
    * covers (impossible under the trainer's char-fallback invariant,
    * possible with a hand-built vocab) passes through whole as one
    * out-of-vocabulary piece.
    */
  def encode(df: DataFrame, idCol: String, textCol: String,
      vocab: Seq[(String, Long)]): DataFrame = {
    require(vocab.nonEmpty, "unigram encode needs a vocab")
    val spark = df.sparkSession
    import spark.implicits._
    val maxLen = vocab.iterator.map(_._1.length).max
    val vocabB = spark.sparkContext.broadcast(vocab.toMap)
    df.select(col(idCol).cast("long"),
        TextAnalysis.tokens(col(textCol)))
      .as[(Long, Seq[String])]
      .mapPartitions { rows =>
        val scores = vocabB.value
        val memo = mutable.HashMap.empty[String, Array[String]]
        rows.map { case (id, words) =>
          val toks = words.iterator.flatMap { w =>
            memo.getOrElseUpdate(w, {
              val v = viterbi(w, scores, maxLen)
              if (v == null) Array(w) else v
            })
          }.toVector
          Encoded(id, toks, toks.length.toLong)
        }
      }
      .toDF("id", "pieces", "n_pieces")
  }
}
