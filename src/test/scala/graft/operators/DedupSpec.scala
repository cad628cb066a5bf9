package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class DedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val base = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again today"),
    (2L, "completely different content about spark query engines and columnar io"),
    (3L, "a third document that talks about minhash signatures and lsh banding"),
    (4L, "the quick brown fox jumps over the lazy dog again and again todaX"), // near-dup of 1
    (5L, "unrelated fifth text mentioning parquet footers and file statistics"))
    .toDF("id", "text")

  test("exactDedup keeps the smallest id per distinct content") {
    val df = base.union(Seq(
      (11L, "the quick brown fox jumps over the lazy dog again and again today"),
      (12L, "completely different content about spark query engines and columnar io"))
      .toDF("id", "text"))
    val out = Dedup.exactDedup(df, "id", "text")
    assert(out.count() == 5)
    assert(out.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("minhash-LSH finds planted near-dups at Jaccard >= 0.8, no false pairs") {
    val pairs = Dedup.nearDupPairs(base, "id", "text", threshold = 0.8)
    val found = pairs.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(found == Set((1L, 4L)), s"expected exactly the planted pair, got $found")
    val j = pairs.filter(col("id_a") === 1).select("jaccard").head().getDouble(0)
    assert(j >= 0.8 && j <= 1.0)
  }

  test("nearDupAgainst finds only cross-corpus matches and decontaminates") {
    val reference = Seq(
      (101L, "the quick brown fox jumps over the lazy dog again and again today"),
      (102L, "benchmark question about the capital of france and its rivers ok"))
      .toDF("id", "text")
    // corpus doc 1 near-matches ref 101; 4 is a near-dup of 1 so it
    // matches 101 too; nothing matches 102
    val hits = Dedup.nearDupAgainst(base, reference, "id", "text",
      threshold = 0.8)
    val got = hits.select("corpus_id", "ref_id").as[(Long, Long)]
      .collect().toSet
    assert(got == Set((1L, 101L), (4L, 101L)), s"got $got")

    val clean = Dedup.removeNearDuplicatesOf(base, reference, "id", "text")
    assert(clean.select("id").as[Long].collect().sorted.toSeq ==
      Seq(2L, 3L, 5L))
  }

  test("near-dup plan contains no cartesian product") {
    val plan = Dedup.nearDupPairs(base, "id", "text", materialize = false)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "LSH candidate generation must never degrade to an all-pairs product")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "candidate join must be an equi-join on (band, bucket)")
  }

  test("dropNearDuplicates keeps the smaller id of each near-dup pair") {
    val out = Dedup.dropNearDuplicates(base, "id", "text")
    assert(out.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L, 5L))
  }

  test("simhash: near-identical docs within hamming 3, different docs far") {
    // simhash needs long docs: a 1-token change must be a small fraction
    // of the token stream for the fingerprint to stay within hamming 3
    val longA = (1 to 300).map(i => s"word$i").mkString(" ")
    val longB = (1 to 300).map(i => if (i == 150) "CHANGED" else s"word$i").mkString(" ")
    val longC = (1 to 300).map(i => s"other$i").mkString(" ")
    val docs = Seq((1L, longA), (2L, longB), (3L, longC)).toDF("id", "text")
    val pairs = Dedup.simHashPairs(docs, "id", "text", maxHamming = 3)
    val found = pairs.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(found.contains((1L, 2L)), s"planted near-dup must collide, got $found")
    assert(!found.contains((1L, 3L)) && !found.contains((2L, 3L)))
  }

  test("portable simhash: planted near-dup found, far docs apart, no cross product") {
    val longA = (1 to 300).map(i => s"word$i").mkString(" ")
    val longB = (1 to 300).map(i => if (i == 150) "CHANGED" else s"word$i").mkString(" ")
    val longC = (1 to 300).map(i => s"other$i").mkString(" ")
    val docs = Seq((1L, longA), (2L, longB), (3L, longC)).toDF("id", "text")
    val pairs = Dedup.simHashPortablePairs(docs, "id", "text", maxHamming = 2)
    val found = pairs.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(found.contains((1L, 2L)), s"planted near-dup must collide, got $found")
    assert(!found.contains((1L, 3L)) && !found.contains((2L, 3L)))
    val plan = Dedup.simHashPortablePairs(docs, "id", "text", materialize = false)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("portable simhash: identical docs are hamming 0; banding finds every close pair") {
    // two identical docs + one 1-token variant: (1,2) at hamming 0,
    // and the variant within the maxHamming=2 exactness window must
    // appear regardless of which bands its flipped bits land in
    val text = (1 to 200).map(i => s"tok$i").mkString(" ")
    val variant = (1 to 200).map(i => if (i == 7) "swap" else s"tok$i").mkString(" ")
    val docs = Seq((1L, text), (2L, text), (3L, variant)).toDF("id", "text")
    val got = Dedup.simHashPortablePairs(docs, "id", "text", maxHamming = 2)
      .select("id_a", "id_b", "hamming")
      .as[(Long, Long, Long)].collect()
      .map { case (a, b, h) => ((a, b), h) }.toMap
    assert(got.get((1L, 2L)).contains(0L), s"identical docs must be hamming 0: $got")
    // the variant pairs with BOTH identical docs at the same distance
    assert(got.get((1L, 3L)) == got.get((2L, 3L)))
  }

  test("hot bucket: pairs distribute, oversized buckets drop, dups still found") {
    // 300 identical docs put 300 members into the same bucket in every
    // band; pair generation must distribute (bucket self-join) instead
    // of materializing one O(n²) in-row array
    val hot = (100L to 399L)
      .map(i => (i, "identical hot bucket document body repeated verbatim"))
    val df = base.union(hot.toDF("id", "text"))
    val pairs = Dedup.nearDupPairs(df, "id", "text", threshold = 0.8)
    // all C(300,2) identical pairs plus the planted (1,4)
    assert(pairs.count() == 300L * 299 / 2 + 1)
    // the plan must generate pairs via a join, not an in-row flatten
    // (materialize=false exposes the lazy plan instead of a checkpoint scan)
    val plan = Dedup.nearDupPairs(df, "id", "text", materialize = false)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("flatten("), "in-row pair materialization crept back")

    // capped: the hot bucket is dropped entirely, small dups survive
    val capped = Dedup.nearDupPairs(df, "id", "text",
      threshold = 0.8, maxBucketSize = 100)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(capped == Set((1L, 4L)),
      s"cap must drop the degenerate bucket but keep small ones, got ${capped.size} pairs")

    // same guarantees for the simhash path
    val sim = Dedup.simHashPairs(df, "id", "text", maxBucketSize = 100)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(!sim.exists { case (a, b) => a >= 100 && b >= 100 },
      "simhash cap must drop the degenerate bucket")
  }

  test("ngramJaccard: identical=1, disjoint=0, near-dup high") {
    val df = Seq((
      "the quick brown fox jumps over the lazy dog",
      "the quick brown fox jumps over the lazy dog",
      "totally unrelated words here without overlap",
      "the quick brown fox jumps over the lazy cat"))
      .toDF("a", "b", "c", "d")
    val r = df.select(
      Dedup.ngramJaccard(col("a"), col("b"), 2).as("same"),
      Dedup.ngramJaccard(col("a"), col("c"), 2).as("disjoint"),
      Dedup.ngramJaccard(col("a"), col("d"), 2).as("near")).head()
    assert(r.getDouble(0) == 1.0)
    assert(r.getDouble(1) == 0.0)
    assert(r.getDouble(2) > 0.6 && r.getDouble(2) < 1.0)
  }

  test("fuzzyBlockedPairs: exact pair set within the block, a_id < b_id") {
    val df = Seq(
      (1L, "record-alpha"), (2L, "record-alphX"), // dist 1
      (3L, "record-alXhX"), // dist 2 of 1, dist 1 of 2... but capped at 1
      (4L, "totally-other"), (5L, "record-alpha")) // 5 dups 1 (dist 0)
      .toDF("id", "name")
    val got = Dedup.fuzzyBlockedPairs(df, "id", "name", lit("one-block"), 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // brute-force model at threshold 1
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val rows = Seq((1L, "record-alpha"), (2L, "record-alphX"),
      (3L, "record-alXhX"), (4L, "totally-other"), (5L, "record-alpha"))
    val want = (for {
      (ai, as) <- rows; (bi, bs) <- rows
      if ai < bi && lev(as, bs) <= 1
    } yield (ai, bi, lev(as, bs))).toSet
    assert(got == want)
    assert(got.forall { case (a, b, _) => a < b })
  }

  test("fuzzyBlockedPairs: candidates never cross blocks") {
    val df = Seq((1L, "aaaa"), (2L, "aaab"), (3L, "aaac"))
      .toDF("id", "name")
    val out = Dedup.fuzzyBlockedPairs(df, "id", "name",
      col("id") % 2, maxDist = 2) // 1,3 share block; 2 alone
    val pairs = out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 3L)))
  }

  test("fuzzyBlockedPairs: oversized blocks are dropped whole, not exploded") {
    val big = (1L to 50L).map(i => (i, s"x$i")).toDF("id", "name")
    val out = Dedup.fuzzyBlockedPairs(big, "id", "name", lit("hot"),
      maxDist = 5, maxBlock = 10)
    assert(out.count() == 0, "block of 50 over cap 10 must contribute no pairs")
  }
}
