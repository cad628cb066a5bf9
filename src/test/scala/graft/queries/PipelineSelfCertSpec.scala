package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Pins the embedded quality machinery of the three
  * approximate-algorithm gates (q28/q29/q40). All three carry full
  * DuckDB hash oracles that are CORPUS-ROBUST since round 11 (the
  * oracle derives its expectation from the data or from provable
  * invariants, never from "what this fixture happened to contain");
  * what this spec adds is the SELF-CERT layer the oracle can't see —
  * the in-plan float contracts (full-probe-equals-exact, the
  * approximate-recall floor), the hamming-0 signature invariance, and
  * the planted-pair guarantees at a different SF than the gate.
  */
class PipelineSelfCertSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("q28: integer rank, full-probe flag, recall floor all certify") {
    val df = PipelineQueries.q28AnnIvf(spark, sf)
    assert(df.columns.toSeq == Seq("query_id", "neighbor_id", "rk",
      "qcos_key", "full_probe_exact", "recall_floor_ok"))
    val rows = df.collect()
    assert(rows.length == 50) // 10 queries x k=5
    val byQuery = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.size == 10)
    byQuery.values.foreach { qr =>
      val sorted = qr.sortBy(_.getAs[Long]("rk"))
      assert(sorted.map(_.getAs[Long]("rk")).toSeq == (1L to 5L),
        "ranks must be 1..5 per query")
      val keys = sorted.map(_.getAs[Long]("qcos_key"))
      assert(keys.zip(keys.tail).forall { case (a, b) => a >= b },
        s"qcos_key must be non-increasing down the rank: ${keys.toSeq}")
    }
    // the lazy self-cert flags: float full-probe IVF == float brute
    // force, and the nprobe=6 tier holds the 0.70 recall floor —
    // both all-Spark float comparisons folded into the plan
    rows.foreach { r =>
      assert(r.getAs[Long]("full_probe_exact") == 1L,
        s"full-probe IVF diverged from exact brute force: $r")
      assert(r.getAs[Long]("recall_floor_ok") == 1L,
        s"nprobe=6 recall fell below the 0.70 floor: $r")
    }
    // the integer-quantized ranking must still be cosine-like: its
    // top-5 sets should mostly agree with the float brute force
    // (floor(v*256) quantization error ~1e-3 can flip genuine
    // near-ties, so equality is NOT required — overlap is)
    import org.apache.spark.sql.functions.col
    val emb = graft.Tables.embeddings(spark, sf)
    val floatTop = graft.operators.Similarity.bruteForceTopK(
        emb.filter(col("vec_id") < 10), emb, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val quantTop = rows.map(r =>
      (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val overlap = (floatTop & quantTop).size
    assert(overlap >= 35,
      s"quantized rank drifted too far from float cosine: $overlap/50 shared")
  }

  test("q29: swap-planted pairs all recovered, hamming 0, high Jaccard") {
    val df = PipelineQueries.q29SimhashPairs(spark, sf)
    assert(df.columns.toSeq == Seq("id_a", "id_b", "hamming", "jaccard3_e6"))
    val rows = df.collect()
    // the token-swap perturbation is signature-invariant, so every
    // planted pair MUST be found with hamming exactly 0; the gate
    // output is restricted to the planted id relationship, so the
    // rowcount is exact even on corpora with natural near-dups
    // (docs 8/12 at sf0.001 are genuine finds — DedupSpec pins them)
    assert(rows.length == 30, s"expected exactly the 30 planted pairs, got ${rows.length}")
    rows.foreach { r =>
      assert(r.getAs[Long]("id_b") - r.getAs[Long]("id_a") == 100000L)
      assert(r.getAs[Long]("hamming") == 0L,
        s"planted pair must be signature-identical: $r")
      val j = r.getAs[Long]("jaccard3_e6")
      assert(j >= 500000L,
        s"pair (${r.get(0)},${r.get(1)}) has low exact Jaccard ${j / 1e6} — " +
          "the swap should only perturb boundary trigrams")
      assert(j <= 1000000L, s"Jaccard out of range: $r")
    }
  }

  test("q40: every planted identical pair surfaces through the pipeline") {
    val df = PipelineQueries.q40SemanticDedup(spark, sf)
    assert(df.columns.toSeq ==
      Seq("id_a", "id_b", "cosine_e6", "is_planted", "planted_found"))
    val rows = df.collect()
    val planted = rows.filter(_.getAs[Long]("is_planted") == 1L)
    assert(planted.length == 20, s"expected all 20 planted pairs, got ${planted.length}")
    rows.foreach { r =>
      assert(r.getAs[Long]("cosine_e6") == 1000000L,
        s"identical-embedding pair must report cosine_e6 = 10^6: $r")
      assert(r.getAs[Long]("planted_found") == 20L, s"planted_found must be 20: $r")
    }
  }
}
