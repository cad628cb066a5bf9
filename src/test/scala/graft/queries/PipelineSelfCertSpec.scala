package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Pins the embedded quality machinery of the three
  * approximate-algorithm gates (q28/q29/q40). Since round 10 all three
  * also carry full DuckDB hash oracles (their healthy outputs are
  * ground-truth-determined); what this spec adds is the SELF-CERT
  * layer the oracle can't see: q28's in-query approximate-recall
  * floor, the internal consistency of the embedded quality columns,
  * and the planted-pair guarantees at a different SF than the gate.
  */
class PipelineSelfCertSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("q28: full-probe IVF equals exact top-5; approx floor enforced") {
    // building the frame runs the embedded nprobe=6 recall require —
    // a quantizer regression would throw here before any assertion
    val df = PipelineQueries.q28AnnIvf(spark, sf)
    assert(df.columns.toSeq ==
      Seq("query_id", "neighbor_id", "rk", "in_exact", "recall_k"))
    val rows = df.collect()
    assert(rows.length == 50) // 10 queries x k=5
    val byQuery = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.size == 10)
    // full probe scans every cell: the IVF machinery must reproduce
    // brute force exactly — every row a hit, recall 1.0 everywhere
    rows.foreach { r =>
      assert(r.getAs[Long]("in_exact") == 1L,
        s"full-probe IVF missed a true neighbor: $r")
      val recall = r.getAs[java.math.BigDecimal]("recall_k").doubleValue()
      assert(recall == 1.0, s"full-probe recall must be 1.0: $r")
    }
  }

  test("q29: swap-planted pairs are all recovered with high Jaccard") {
    val df = PipelineQueries.q29SimhashPairs(spark, sf)
    assert(df.columns.toSeq ==
      Seq("id_a", "id_b", "jaccard3_e6", "planted_hit"))
    val rows = df.collect()
    // the token-swap perturbation is signature-invariant, so every
    // planted pair MUST be found (this corpus also contains genuine
    // natural near-dups — e.g. docs 8/12 at sf0.001 — which are
    // correct finds, so extras are allowed but must certify as real)
    val planted = rows.filter(_.getAs[Long]("planted_hit") == 1L)
    assert(planted.length == 30, s"expected all 30 planted pairs, got ${planted.length}")
    rows.foreach { r =>
      val j = r.getAs[Long]("jaccard3_e6")
      assert(j >= 500000L,
        s"pair (${r.get(0)},${r.get(1)}) has low exact Jaccard ${j / 1e6} — " +
          "SimHash would be pairing unrelated docs")
      assert(j <= 1000000L, s"Jaccard out of range: $r")
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
