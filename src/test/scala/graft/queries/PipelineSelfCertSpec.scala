package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Pins the SELF-CERTIFYING shape of the three approximate queries the
  * driver can only rows-check (q28/q29/q40): each output embeds an
  * exact in-Spark quality signal, so these assertions — and the
  * driver's row gate — would fail if scoring broke, not just if
  * cardinality broke.
  */
class PipelineSelfCertSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("q28: per-query recall@5 vs brute-force exact is embedded and high") {
    val df = PipelineQueries.q28AnnIvf(spark, sf)
    assert(df.columns.toSeq ==
      Seq("query_id", "neighbor_id", "rk", "in_exact", "recall_k"))
    val rows = df.collect()
    assert(rows.length == 50) // 10 queries x k=5
    val byQuery = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.size == 10)
    byQuery.foreach { case (q, rs) =>
      val hits = rs.map(_.getAs[Long]("in_exact")).sum
      val recalls = rs.map(_.getAs[java.math.BigDecimal]("recall_k").doubleValue()).distinct
      assert(recalls.size == 1, s"query $q: recall_k must be constant per query")
      assert(math.abs(recalls.head - hits / 5.0) < 1e-9,
        s"query $q: recall_k must equal sum(in_exact)/k")
    }
    val meanRecall = byQuery.values
      .map(_.head.getAs[java.math.BigDecimal]("recall_k").doubleValue())
      .sum / byQuery.size
    assert(meanRecall >= 0.7, s"IVF mean recall@5 degraded: $meanRecall")
  }

  test("q29: independent 3-gram Jaccard certifies reported pairs") {
    val df = PipelineQueries.q29SimhashPairs(spark, sf)
    assert(df.columns.toSeq ==
      Seq("id_a", "id_b", "hamming", "jaccard3", "planted_hit"))
    val rows = df.collect()
    assert(rows.nonEmpty)
    val planted = rows.filter(_.getAs[Long]("planted_hit") == 1L)
    assert(planted.nonEmpty, "no planted perturbation pair recovered")
    planted.foreach { r =>
      val j = r.getAs[java.math.BigDecimal]("jaccard3").doubleValue()
      assert(j >= 0.8,
        s"planted pair (${r.get(0)},${r.get(1)}) has low exact Jaccard $j — " +
          "SimHash would be pairing unrelated docs")
    }
  }

  test("q40: planted recall is 1.0 and exact cosine certifies every pair") {
    val df = PipelineQueries.q40SemanticDedup(spark, sf)
    assert(df.columns.toSeq ==
      Seq("id_a", "id_b", "cosine_sim", "is_planted", "planted_recall"))
    val rows = df.collect()
    val planted = rows.filter(_.getAs[Long]("is_planted") == 1L)
    assert(planted.length == 20, s"expected all 20 planted pairs, got ${planted.length}")
    rows.foreach { r =>
      val c = r.getAs[java.math.BigDecimal]("cosine_sim").doubleValue()
      assert(c >= 0.999, s"pair below threshold leaked into output: $r")
    }
    val recall = rows.head.getAs[java.math.BigDecimal]("planted_recall").doubleValue()
    assert(recall == 1.0, s"planted_recall must be 1.0, got $recall")
  }
}
