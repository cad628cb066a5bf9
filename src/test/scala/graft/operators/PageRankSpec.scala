package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class PageRankSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val E12 = 1000000000000L

  // Scalar replay of the exact integer fixed-point recurrence.
  private def scalarRanks(edges: Seq[(String, String, Long)],
      iters: Int): Map[String, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size.toLong
    val outw = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    var r = nodes.map(_ -> E12 / n).toMap
    for (_ <- 0 until iters) {
      val in = edges.groupBy(_._2).view.mapValues(_.map { case (u, _, w) =>
        r(u) * w / outw(u)
      }.sum).toMap
      r = nodes.map(v => v -> (15 * E12 / (100 * n)
        + 85 * in.getOrElse(v, 0L) / 100)).toMap
    }
    r
  }

  private val edges = Seq(
    ("a", "b", 3L), ("a", "c", 1L), ("b", "c", 2L),
    ("c", "a", 5L), ("d", "c", 1L)) // d is a source; no edge into d

  test("five iterations match the scalar fixed-point model exactly") {
    val out = PageRank.ranks(edges.toDF("src", "dst", "w"), iters = 5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == scalarRanks(edges, 5))
  }

  test("zero iterations is the uniform start vector") {
    val out = PageRank.ranks(edges.toDF("src", "dst", "w"), iters = 0)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.values.toSet == Set(E12 / 4))
    assert(out.keySet == Set("a", "b", "c", "d"))
  }

  test("heavily-cited node outranks a pure source; total mass bounded") {
    val out = PageRank.ranks(edges.toDF("src", "dst", "w"), iters = 5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("c") > out("d"), s"sink-of-most-edges must outrank: $out")
    assert(out.values.sum <= E12)
  }
}
