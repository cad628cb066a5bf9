package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class BpeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // Sennrich et al.'s classic corpus: frequencies low:5 lower:2
  // newest:6 widest:3
  private def classicCorpus = Seq(
    (1L, "low low low low low"),
    (2L, "lower lower"),
    (3L, "newest newest newest newest newest newest"),
    (4L, "widest widest widest")).toDF("id", "text")

  /** Independent naive reference: re-derives merges from a plain
    * word->count map with no Spark involved.
    */
  private def refTrain(counts: Map[String, Long], n: Int): Seq[(String, String)] = {
    var words = counts.map { case (w, c) => (w.map(_.toString).toList, c) }.toList
    var out = List.empty[(String, String)]
    for (_ <- 0 until n) {
      val pc = words.flatMap { case (s, c) =>
        s.zip(s.drop(1)).map(p => (p, c))
      }.groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum }
      if (pc.nonEmpty) {
        val best = pc.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        out = out :+ best
        def apply(s: List[String]): List[String] = s match {
          case a :: b :: rest if (a, b) == best => (a + b) :: apply(rest)
          case a :: rest => a :: apply(rest)
          case Nil => Nil
        }
        words = words.map { case (s, c) => (apply(s), c) }
      }
    }
    out
  }

  test("train matches the independent reference on the classic corpus") {
    val merges = Bpe.train(classicCorpus, "text", 8)
    val ref = refTrain(
      Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L), 8)
    assert(merges == ref)
    // the famous first merges: 'es' (9 = 6+3), then 'est' (9)
    assert(merges.take(2) == Seq(("e", "s"), ("es", "t")))
  }

  test("encode fuses by rank, leftmost-first, and memoizes correctly") {
    val merges = Bpe.train(classicCorpus, "text", 8)
    val enc = Bpe.encode(classicCorpus, "id", "text", merges)
      .collect().map(r => r.getLong(0) ->
        (r.getSeq[String](1), r.getLong(2))).toMap
    // every word's encoding must equal the scalar reference algorithm
    val ranks = merges.zipWithIndex.map { case (p, i) => p -> i }.toMap
    for ((id, word, reps) <- Seq((1L, "low", 5), (2L, "lower", 2),
        (3L, "newest", 6), (4L, "widest", 3))) {
      val one = Bpe.encodeWord(word, ranks).toSeq
      assert(enc(id)._1 == Seq.fill(reps)(one).flatten,
        s"doc $id: ${enc(id)._1} vs $reps × $one")
      assert(enc(id)._2 == one.length.toLong * reps)
    }
    // after 8 merges 'newest' must be a single token
    assert(Bpe.encodeWord("newest", ranks).toSeq == Seq("newest"))
  }

  test("encoding never crosses word boundaries and handles unseen chars") {
    val merges = Bpe.train(classicCorpus, "text", 8)
    val ranks = merges.zipWithIndex.map { case (p, i) => p -> i }.toMap
    // 'stlow': 'st' would only fuse if ranks crossed the boundary of
    // adjacent words — encode as one word to show in-word fusing only
    val df = Seq((1L, "low est")).toDF("id", "text")
    val out = Bpe.encode(df, "id", "text", merges)
      .collect().head.getSeq[String](1)
    assert(out == Bpe.encodeWord("low", ranks).toSeq ++
      Bpe.encodeWord("est", ranks).toSeq)
    // unseen characters fall through as single-char tokens
    assert(Bpe.encodeWord("zq", ranks).toSeq == Seq("z", "q"))
  }

  test("train is deterministic and stops when pairs are exhausted") {
    val a = Bpe.train(classicCorpus, "text", 1000)
    val b = Bpe.train(classicCorpus, "text", 1000)
    assert(a == b)
    // 4 word types fully fused is the fixpoint: merges stop there
    assert(a.size < 30)
    val ranks = a.zipWithIndex.map { case (p, i) => p -> i }.toMap
    for (w <- Seq("low", "lower", "newest", "widest"))
      assert(Bpe.encodeWord(w, ranks).toSeq == Seq(w))
  }

  test("maxWordTypes caps the training table deterministically") {
    // cap to 2 types: only the 2 highest-count words train the merges
    val merges = Bpe.train(classicCorpus, "text", 8, maxWordTypes = 2)
    val ref = refTrain(Map("newest" -> 6L, "low" -> 5L), 8)
    assert(merges == ref)
  }

  test("vocab lists chars then fused symbols in rank order") {
    val merges = Seq(("e", "s"), ("es", "t"))
    assert(Bpe.vocab(merges) == Seq("e", "s", "t", "es", "est"))
  }

  test("real corpus smoke: encoding shrinks token count vs chars") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val merges = Bpe.train(docs, "text", 64)
    assert(merges.size == 64)
    val enc = Bpe.encode(docs, "doc_id", "text", merges)
    val row = enc.selectExpr("sum(n_bpe_tokens)").head()
    val totalBpe = row.getLong(0)
    val chars = docs.selectExpr(
      "sum(length(replace(text, ' ', '')))").head().getLong(0)
    assert(totalBpe > 0 && totalBpe < chars,
      s"BPE tokens $totalBpe should compress below char count $chars")
  }
}
