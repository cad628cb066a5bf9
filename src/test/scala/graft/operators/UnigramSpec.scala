package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Unigram-LM tokenizer ([[Unigram]]): Viterbi segmentation under
  * integer scores with the documented tie-breaks, the trainer's
  * char-fallback invariant, and partitioning-independence of encode.
  */
class UnigramSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("viterbi: max integer score wins, ties break by fewer pieces then lex") {
    // 'ab' two ways: [ab] score -10, [a b] score -4-4=-8 → [a b]
    val v1 = Map("a" -> -4L, "b" -> -4L, "ab" -> -10L)
    assert(Unigram.viterbi("ab", v1, 2).toSeq == Seq("a", "b"))
    // equal scores: [ab] -8 vs [a b] -8 → fewer pieces wins
    val v2 = Map("a" -> -4L, "b" -> -4L, "ab" -> -8L)
    assert(Unigram.viterbi("ab", v2, 2).toSeq == Seq("ab"))
    // 'abc': [ab c] and [a bc] both -10 and both 2 pieces →
    // lexicographically smaller segmentation 'a bc' < 'ab c'
    val v3 = Map("a" -> -4L, "c" -> -4L, "ab" -> -6L, "bc" -> -6L)
    assert(Unigram.viterbi("abc", v3, 2).toSeq == Seq("a", "bc"))
    // uncoverable word → null (encode wraps it as one OOV piece)
    assert(Unigram.viterbi("xyz", v1, 2) == null)
  }

  test("train: char fallback kept, vocab capped, frequent multigram survives") {
    val docs = Seq.fill(50)("the cat sat on the mat") ++ Seq.fill(5)("dog")
    val vocab = Unigram.train(docs.toDF("text"), "text",
      vocabSize = 12, maxPieceLen = 3, emIters = 3)
    val pieces = vocab.map(_._1).toSet
    // every corpus character survives pruning (segmentability)
    "thecatsonmdg".foreach { ch =>
      assert(pieces.contains(ch.toString), s"char fallback lost '$ch'")
    }
    assert(vocab.size <= 12 + 0) // chars (11) + capped multigrams
    // scores are negative log-probs (e6-scaled): all < 0, and a piece
    // list sorted (score desc, piece asc) as documented
    assert(vocab.forall(_._2 < 0L))
    assert(vocab == vocab.sortBy { case (p, s) => (-s, p) })
  }

  test("encode: roundtrip, memo correctness, partitioning independence") {
    val vocab = Seq("the" -> -2000000L, "ta" -> -3000000L,
      "t" -> -4000000L, "h" -> -4000000L, "e" -> -4000000L,
      "b" -> -4000000L, "l" -> -4000000L, "a" -> -4000000L)
    val docs = Seq((1L, "the table"), (2L, "the the blah"))
      .toDF("doc_id", "text")
    val got = Unigram.encode(docs, "doc_id", "text", vocab)
      .orderBy("id")
      .select(col("id"), array_join(col("pieces"), " "), col("n_pieces"))
      .as[(Long, String, Long)].collect().toList
    // 'table' → ta b l e (-15e5·…): [t a b l e] -20M vs [ta b l e] -15M
    assert(got(0) == (1L, "the ta b l e", 5L))
    // 'blah' has no 'h'-free cover problem: b l a h all present
    assert(got(1) == (2L, "the the b l a h", 6L))
    // concatenating pieces restores the word stream
    val flat = got.map(_._2.replace(" ", "")).mkString
    assert(flat == "thetablethetheblah")
    // same result at a different partitioning
    val re = Unigram.encode(docs.repartition(7), "doc_id", "text", vocab)
      .orderBy("id")
      .select(col("id"), array_join(col("pieces"), " "), col("n_pieces"))
      .as[(Long, String, Long)].collect().toList
    assert(re == got)
    // OOV word (hand-built vocab without 'z') passes through whole
    val oov = Unigram.encode(Seq((1L, "zz the")).toDF("doc_id", "text"),
      "doc_id", "text", vocab)
      .select(array_join(col("pieces"), " ")).as[String].head()
    assert(oov == "zz the")
  }
}
