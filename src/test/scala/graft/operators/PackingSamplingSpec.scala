package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class PackingSamplingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("packSequences: contiguous chunk assignment within each shard") {
    // one shard → assignment is the pure running-sum chunking
    val docs = Seq((0, 100), (1, 100), (2, 100), (3, 100), (4, 100))
      .toDF("id", "tok")
    val packed = Packing.packSequences(docs, "id", "tok", capacity = 250, numShards = 1)
      .select("id", "tok_before", "pack_id").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    // offsets 0,100,200,300,400 → packs 0,0,0,1,1
    assert(packed.toSeq == Seq((0, 0L, 0L), (1, 100L, 0L), (2, 200L, 0L),
      (3, 300L, 1L), (4, 400L, 1L)))
  }

  test("packStats: every doc lands in exactly one pack, shards partition ids") {
    val docs = (0 until 100).map(i => (i, 10 + i % 7)).toDF("id", "tok")
    val stats = Packing.packStats(docs, "id", "tok", capacity = 64, numShards = 4)
    val total = stats.agg(sum("n_docs"), sum("pack_tokens")).head()
    assert(total.getLong(0) == 100)
    assert(total.getLong(1) == (0 until 100).map(i => 10 + i % 7).sum)
    // shard of every pack's id range is consistent
    assert(stats.filter(pmod(col("first_id"), lit(4)) =!= col("shard")).count() == 0)
    // no pack exceeds capacity by more than one straddling document
    val over = Packing.packOverflow(stats, 64)
      .filter(col("overflow_tokens") >= 17).count() // max doc size 16
    assert(over == 0)
  }

  test("stratifiedSample: deterministic, respects per-stratum fractions") {
    val rows = (0 until 4000).map(i => (i.toLong, if (i % 2 == 0) "a" else "b"))
      .toDF("id", "src")
    val fr = Map("a" -> 0.5, "b" -> 0.1)
    val s1 = Sampling.stratifiedSample(rows, "src", "id", fr).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val s2 = Sampling.stratifiedSample(rows, "src", "id", fr).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(s1 == s2) // rerun selects the same rows
    val byStratum = s1.groupBy(_._2).view.mapValues(_.size).toMap
    // 2000 per stratum; hash is uniform-ish → within generous bounds
    assert(byStratum("a") > 800 && byStratum("a") < 1200, byStratum)
    assert(byStratum("b") > 100 && byStratum("b") < 300, byStratum)
    // unsampled strata default to 0
    val none = Sampling.stratifiedSample(rows, "src", "id", Map("a" -> 0.5))
      .filter($"src" === "b").count()
    assert(none == 0)
  }

  test("unitHash: ids beyond 2^33 match the exact BigInt model") {
    // the naive id * 2654435761 overflows Long from id ≈ 3.47e9 on —
    // these ids pin the ring-arithmetic formulation to exact math
    val ids = Seq(0L, 1L, 4294967295L, 4294967296L, 3470000000L,
      (1L << 33) + 12345L, 1234567890123L, (1L << 62) + 7L, Long.MaxValue)
    val got = ids.toDF("id")
      .select(col("id"), Sampling.unitHash(col("id")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    ids.foreach { id =>
      val exact = (BigInt(id) * BigInt(2654435761L)).mod(BigInt(4294967296L))
      val expect = exact.toDouble / 4294967296.0
      assert(got(id) == expect, s"id=$id: got ${got(id)}, want $expect")
    }
    // Note: a wrapped Long multiply happens to stay exact mod 2^32
    // (wrap is exact mod 2^64 and 2^32 | 2^64), so the ring form is
    // about PORTABILITY, not Spark correctness: engines with checked
    // 64-bit arithmetic (DuckDB raises an out-of-range error on BIGINT
    // overflow) cannot evaluate the naive formula at these ids at all.
  }

  test("stratifiedTopK: exactly k per stratum, stable across reruns") {
    val rows = (0 until 1000).map(i => (i.toLong, s"s${i % 5}")).toDF("id", "src")
    val k1 = Sampling.stratifiedTopK(rows, "src", "id", 7).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(k1.groupBy(_._2).values.forall(_.length == 7))
    val k2 = Sampling.stratifiedTopK(rows, "src", "id", 7).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(k1.sortBy(identity).toSeq == k2.sortBy(identity).toSeq)
    // k larger than the stratum returns the whole stratum
    val all = Sampling.stratifiedTopK(rows, "src", "id", 500).count()
    assert(all == 1000)
  }

  test("mixingFractions: hits target shares without oversampling") {
    val counts = Map("web" -> 1000L, "books" -> 100L, "code" -> 400L)
    val shares = Map("web" -> 0.5, "books" -> 0.25, "code" -> 0.25)
    val fr = Sampling.mixingFractions(counts, shares)
    assert(fr.values.forall(f => f > 0 && f <= 1.0))
    // books is the binding constraint: its fraction maxes out at 1.0
    assert(math.abs(fr("books") - 1.0) < 1e-9)
    // realized mix matches target shares
    val out = fr.map { case (k, f) => k -> counts(k) * f }
    val n = out.values.sum
    shares.foreach { case (k, s) =>
      assert(math.abs(out(k) / n - s) < 1e-9, s"$k: ${out(k) / n} vs $s")
    }
  }

  /** Exact scalar model of [[Sampling.unitHash]]. */
  private def hashModel(id: Long): Double =
    ((BigInt(id) * BigInt(2654435761L)) mod BigInt(4294967296L)).toDouble / 4294967296.0

  test("tokenBudgetSample: matches the single-walk greedy model across bucket counts") {
    val rows = (0 until 300).map { i =>
      (i.toLong, s"src${i % 3}", 10L + i % 23)
    }
    val df = rows.toDF("id", "src", "w")
    val budgets = Map("src0" -> 700L, "src1" -> 1L, "src2" -> 1000000L)
    // greedy model: walk each stratum in (hash, id) order, keep while
    // the PRECEDING weight is under budget, recording that prefix sum
    val expect = rows.groupBy(_._2).flatMap { case (src, rs) =>
      val budget = budgets(src)
      var acc = 0L
      rs.sortBy { case (id, _, _) => (hashModel(id), id) }.flatMap { case (id, _, w) =>
        val keep = acc < budget
        val row = (src, id, acc)
        acc += w
        if (keep) Some(row) else None
      }
    }.toSet
    // the two-level prefix sum must be EXACT for any bucket count,
    // including buckets = 1 (degenerates to the single window)
    for (b <- Seq(1, 4, 64)) {
      val got = Sampling.tokenBudgetSample(df, "src", "id", "w", budgets, buckets = b)
        .select("src", "id", "tok_before").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == expect, s"buckets=$b")
    }
    // src1 budget 1: exactly the first doc in hash order survives
    val first = Sampling.tokenBudgetSample(df, "src", "id", "w", budgets, buckets = 16)
      .filter($"src" === "src1").collect()
    assert(first.length == 1)
    // strata without a budget are dropped
    val none = Sampling.tokenBudgetSample(df, "src", "id", "w", Map("src0" -> 10L))
      .filter($"src" =!= "src0").count()
    assert(none == 0)
  }

  test("tokenBudgetSample: offsets frame joins broadcast, data side never re-shuffles for it") {
    val rows = (0 until 300).map(i => (i.toLong, s"src${i % 3}", 10L))
    val plan = Sampling.tokenBudgetSample(rows.toDF("id", "src", "w"),
        "src", "id", "w", Map("src0" -> 100L, "src1" -> 100L, "src2" -> 100L))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }
}
