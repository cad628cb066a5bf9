package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class NgramLmSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // Scalar replay of the whole model on driver-side collections.
  private def scalarScores(docs: Seq[(Long, String)]): Map[Long, (Long, Long)] = {
    def toks(s: String) = s.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    val all = docs.flatMap { case (_, s) => toks(s) }
    val cu = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val t = all.size.toLong; val v = cu.size.toLong
    val bgs = docs.flatMap { case (_, s) =>
      val w = toks(s); w.zip(w.drop(1))
    }
    val cb = bgs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    docs.map { case (id, s) =>
      val w = toks(s)
      val terms = w.zip(w.drop(1)).map { case (w1, w2) =>
        val p = ((cb((w1, w2)) + 1).toDouble / (cu(w1) + v).toDouble
          + (cu(w2) + 1).toDouble / (t + v).toDouble) / 2.0
        BigDecimal(math.log(p) * 10000)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      }
      id -> (terms.size.toLong, terms.sum)
    }.toMap
  }

  private val docs = Seq(
    1L -> "spark table scan spark table",
    2L -> "spark table scan",
    3L -> "odd odd words here",
    4L -> "solo",
    5L -> "table scan spark table scan")

  test("self-scoring matches the independent scalar model exactly") {
    val out = NgramLm.score(docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == scalarScores(docs))
  }

  test("sub-two-token docs survive with zero bigrams and zero score") {
    val out = NgramLm.score(docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(4L) == (0L, 0L))
  }

  test("frequent constructions outscore rare ones per token") {
    val out = NgramLm.score(docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(1))).toMap
    // per-bigram average: doc 2 is made of corpus-common bigrams,
    // doc 3 of bigrams seen once — doc 2's mean term must be higher.
    val avg2 = out(2L)._1.toDouble / out(2L)._2
    val avg3 = out(3L)._1.toDouble / out(3L)._2
    assert(avg2 > avg3, s"expected common-bigram doc to outscore: $avg2 vs $avg3")
  }
}
