package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.Tables

class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.01"

  test("cosine: orthogonal=0, identical=1, opposite=-1") {
    val df = Seq((
      Array(1.0f, 0.0f), Array(0.0f, 1.0f), Array(1.0f, 0.0f), Array(-2.0f, 0.0f)))
      .toDF("a", "b", "c", "d")
    val r = df.select(
      Similarity.cosine(col("a"), col("b")),
      Similarity.cosine(col("a"), col("c")),
      Similarity.cosine(col("a"), col("d"))).head()
    assert(math.abs(r.getDouble(0)) < 1e-12)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(2) + 1.0) < 1e-12)
  }

  test("LSH top-k reaches recall >= 0.9 vs exact top-k at sf0.01") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") < 20)
    val k = 10
    val exact = Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", k)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshTopK(queries, emb, "vec_id", "embedding", k)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    info(f"ANN recall@$k = $recall%.3f (exact=${exact.size}, approx=${approx.size})")
    assert(recall >= 0.9, f"recall $recall%.3f below 0.9")
  }

  test("IVF top-k reaches recall >= 0.9 vs exact at sf0.01") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") < 20)
    val k = 10
    val exact = Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", k)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(queries, emb, "vec_id", "embedding", k,
        numCells = 16, nprobe = 8)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    info(f"IVF recall@$k = $recall%.3f (nprobe=8/16 cells)")
    assert(recall >= 0.9, f"recall $recall%.3f below 0.9")
  }

  test("quantize8: scale symmetry, clamp, zero vector, cosine fidelity") {
    val df = Seq((Array(0.5f, -1.0f, 0.25f), Array(0.0f, 0.0f)))
      .toDF("v", "z")
    val r = df.select(Similarity.quantize8(col("v")),
      Similarity.quantize8(col("z"))).head()
    assert(r.getSeq[Byte](0) == Seq[Byte](64, -127, 32))
    assert(r.getSeq[Byte](1) == Seq[Byte](0, 0))
    // non-finite vectors quantize to null, never to silent zeros
    val bad = Seq((Array(Float.NaN, 1.0f), Array(Float.PositiveInfinity, 1.0f)))
      .toDF("nan", "inf")
      .select(Similarity.quantize8(col("nan")), Similarity.quantize8(col("inf")))
      .head()
    assert(bad.isNullAt(0) && bad.isNullAt(1))
    // int8 cosine tracks float cosine closely on real embeddings
    val emb = Tables.embeddings(spark, sf).limit(200)
    val err = emb.as("a").join(emb.as("b"),
        col("a.vec_id") === col("b.vec_id") - 1)
      .select(abs(
        Similarity.cosine(col("a.embedding"), col("b.embedding")) -
        Similarity.cosine(Similarity.quantize8(col("a.embedding")),
          Similarity.quantize8(col("b.embedding")))).as("e"))
      .agg(max("e")).head().getDouble(0)
    assert(err < 0.01, f"int8 cosine error $err%.4f too large")
  }

  test("quantized top-k with rescoring reaches recall >= 0.95 vs exact") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") < 20)
    val k = 10
    val exact = Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", k)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val quant = Similarity.bruteForceTopKQuantized(
        queries, emb, "vec_id", "embedding", k)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & quant).size.toDouble / exact.size
    info(f"quantized recall@$k = $recall%.3f")
    assert(recall >= 0.95, f"recall $recall%.3f below 0.95")
  }

  test("LSH plan has no cartesian product; exact plan broadcasts queries") {
    val emb = Tables.embeddings(spark, sf)
    val q = emb.filter(col("vec_id") < 5)
    val lshPlan = Similarity.lshTopK(q, emb, "vec_id", "embedding", 5)
      .queryExecution.executedPlan.toString
    assert(!lshPlan.contains("CartesianProduct"))
    assert(!lshPlan.contains("BroadcastNestedLoopJoin"),
      "bucket join must be a hash equi-join")
    val bfPlan = Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", 5)
      .queryExecution.executedPlan.toString
    assert(bfPlan.contains("BroadcastNestedLoopJoin") || bfPlan.contains("Broadcast"),
      "brute force must broadcast the query side, never shuffle the corpus")
  }

  test("cosineNearDupPairs finds planted duplicate vectors") {
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    // plant: copies of vectors 0..4 with ids +10000 (cosine exactly 1)
    val planted = emb.filter(col("vec_id") < 5)
      .select((col("vec_id") + 10000).as("vec_id"), col("embedding"))
    val pairs = Similarity.cosineNearDupPairs(
      emb.unionByName(planted), "vec_id", "embedding", threshold = 0.999)
    val found = pairs.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert((0L until 5L).forall(i => found.contains((i, i + 10000))),
      s"all 5 planted duplicate vectors must be found, got $found")
  }

  test("cosineNearDupPairs: hot bucket capped, pair generation distributed") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    // 200 exact copies of vector 0: a degenerate all-similar region
    val base0 = emb.filter(col("vec_id") === 0)
    val hot = (1 to 200).map(i => base0
      .select((col("vec_id") + 20000 + i).as("vec_id"), col("embedding")))
      .reduce(_ unionByName _)
    val df = emb.unionByName(hot)

    // capped low: the hot region's buckets are dropped; the query
    // completes without forming its O(n²) pairs
    val capped = Similarity.cosineNearDupPairs(df, "vec_id", "embedding",
      threshold = 0.999, maxBucketSize = 50)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(!capped.exists { case (a, b) => a > 20000 && b > 20000 },
      "cap must drop the degenerate bucket")

    // pair generation is a join, never an in-row array
    // (materialize=false exposes the lazy plan instead of a checkpoint scan)
    val plan = Similarity.cosineNearDupPairs(df, "vec_id", "embedding", 0.9,
        materialize = false)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
           !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("cosineNearDupPairs multi-table amplification beats one table's recall") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
      .filter(col("vec_id") < 500)
    // plant 50 slightly-perturbed copies (high cosine, not identical):
    // scale each vector by 1.01 — cosine exactly 1 survives float noise,
    // so perturb one dimension instead
    val planted = emb.filter(col("vec_id") < 50)
      .select((col("vec_id") + 10000).as("vec_id"),
        transform(col("embedding"),
          (v, i) => when(i === 0, v * 0.7f).otherwise(v)).as("embedding"))
    val df = emb.unionByName(planted)
    val exactPairs = (0L until 50L).map(i => (i, i + 10000)).toSet
    def recallAt(tables: Int): Double = {
      val found = Similarity.cosineNearDupPairs(df, "vec_id", "embedding",
        threshold = 0.95, planes = 8, tables = tables)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      (found & exactPairs).size.toDouble / exactPairs.size
    }
    val r1 = recallAt(1); val r4 = recallAt(4)
    info(f"cosine near-dup recall: 1 table $r1%.2f, 4 tables $r4%.2f")
    assert(r4 >= r1, "OR-amplification must not lose pairs")
    assert(r4 >= 0.9, f"4-table recall $r4%.2f below 0.9")
  }

  test("semanticDedupPairs finds planted duplicates; precision is exact") {
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
      .filter(col("vec_id") < 300)
    val planted = emb.filter(col("vec_id") < 30)
      .select((col("vec_id") + 10000).as("vec_id"), col("embedding"))
    val df = emb.unionByName(planted)
    val found = Similarity.semanticDedupPairs(df, "vec_id", "embedding",
        threshold = 0.999, numClusters = 16)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // an identical copy lands in the same KMeans cell by construction,
    // so exact-duplicate recall is 1.0; cosine >= threshold is verified
    // exactly, so precision is 1.0 too
    val wanted = (0L until 30L).map(i => (i, i + 10000)).toSet
    assert(found == wanted, s"expected exactly the planted pairs, got $found")
  }

  test("dropSemanticDuplicates keeps one representative per duplicate group") {
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
      .filter(col("vec_id") < 100)
    // two extra copies of vector 7: ids 10007 and 20007 form a chain
    val p1 = emb.filter(col("vec_id") === 7)
      .select((col("vec_id") + 10000).as("vec_id"), col("embedding"))
    val p2 = emb.filter(col("vec_id") === 7)
      .select((col("vec_id") + 20000).as("vec_id"), col("embedding"))
    val df = emb.unionByName(p1).unionByName(p2)
    val kept = Similarity.dropSemanticDuplicates(df, "vec_id", "embedding",
        threshold = 0.999, numClusters = 8)
      .select("vec_id").as[Long].collect().toSet
    assert(kept.contains(7L) && !kept.contains(10007L) && !kept.contains(20007L))
    assert(kept.size == 100, "exactly the 100 originals survive")
  }

  test("semanticDedupPairs plan has no cartesian; oversized cells dropped") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
      .filter(col("vec_id") < 200)
    val plan = Similarity.semanticDedupPairs(emb, "vec_id", "embedding",
        threshold = 0.9, numClusters = 8, materialize = false)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
           !plan.contains("BroadcastNestedLoopJoin"))
    // cap of 1: every >=2-member cell is dropped, so no pair survives
    val capped = Similarity.semanticDedupPairs(emb, "vec_id", "embedding",
      threshold = 0.0, numClusters = 2, maxClusterSize = 1)
    assert(capped.isEmpty)
  }

  test("semanticPairsPortable matches the integer brute-force model exactly") {
    import spark.implicits._
    val dims = 64
    // deterministic corpus: 40 base vectors + 5 planted near-dups of
    // the first 5 (tiny perturbation -> cosine ~0.999)
    def base(id: Int): Array[Float] =
      Array.tabulate(dims)(d => (((id * 31 + d * 7919) % 1000) / 500.0f) - 1.0f)
    val rows =
      (0 until 40).map(i => (i.toLong, base(i))) ++
      (0 until 5).map(i => (100L + i,
        base(i).zipWithIndex.map { case (v, d) => v + (if (d == 0) 0.01f else 0f) }))
    val df = rows.toDF("vec_id", "embedding")
    val got = Similarity.semanticPairsPortable(df, "vec_id", "embedding",
        thresholdNumSq = 4, thresholdDenSq = 25)
      .select("id_a", "id_b", "num")
      .as[(Long, Long, Long)].collect().toSet

    // brute-force scalar model of every stage
    def quant(v: Array[Float]): Array[Long] =
      v.map(x => math.floor(x.toDouble * 256).toLong)
    def sign(plane: Int, d: Int): Long =
      1L - 2L * (((plane.toLong * 2654435761L + d.toLong * 40503L) >> 16) & 1L)
    def key(q: Array[Long], b: Int): Long =
      (0 until 4).map { p =>
        val dot = q.zipWithIndex.map { case (x, d) => x * sign(b * 4 + p, d) }.sum
        if (dot > 0) 1L << p else 0L
      }.sum
    val qs = rows.map { case (id, v) => id -> quant(v) }.toMap
    val expect = (for {
      (a, qa) <- qs.toSeq; (b, qb) <- qs.toSeq if a < b
      if (0 until 6).exists(band => key(qa, band) == key(qb, band))
      num = qa.zip(qb).map { case (x, y) => x * y }.sum
      na = qa.map(x => x * x).sum; nb = qb.map(x => x * x).sum
      if num > 0 && num * num * 25 >= 4 * na * nb
    } yield (a, b, num)).toSet
    assert(got == expect)
    // the planted near-dups must actually be found
    (0 until 5).foreach { i =>
      assert(got.exists { case (a, b, _) => a == i.toLong && b == 100L + i },
        s"planted pair ($i, ${100 + i}) missing")
    }
    val plan = Similarity.semanticPairsPortable(df, "vec_id", "embedding")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("annIvfPortable: exact over probed cells, deterministic, sane recall") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") < 10)
    val got = Similarity.annIvfPortable(emb, queries, "vec_id", "embedding",
        nprobe = 4)
      .select("query_id", "neighbor_id", "rk")
      .as[(Long, Long, Long)].collect()
    assert(got.length == 50, s"10 queries x top-5, got ${got.length}")
    // deterministic across reruns (content-addressed pivots, id ties)
    val again = Similarity.annIvfPortable(emb, queries, "vec_id", "embedding",
        nprobe = 4)
      .select("query_id", "neighbor_id", "rk")
      .as[(Long, Long, Long)].collect()
    assert(got.sorted.toSeq == again.sorted.toSeq)
    // recall@5 vs exact integer-L2 brute force over the same geometry
    def quant(v: Array[Float]): Array[Long] =
      v.map(x => math.floor(x.toDouble * 256).toLong)
    val all = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().map { case (id, v) => id -> quant(v) }
    val hits = (0L until 10L).map { qid =>
      val qv = all.find(_._1 == qid).get._2
      def d(a: Array[Long], b: Array[Long]): Long = {
        var i = 0; var na = 0L; var nb = 0L; var dt = 0L
        while (i < a.length) { na += a(i)*a(i); nb += b(i)*b(i); dt += a(i)*b(i); i += 1 }
        na + nb - 2 * dt
      }
      val exact = all.filter(_._1 != qid)
        .map { case (id, v) => (d(qv, v), id) }.sorted.take(5).map(_._2).toSet
      val approx = got.filter(_._1 == qid).map(_._2).toSet
      exact.intersect(approx).size
    }.sum
    // nprobe=4 of 16 hash-chosen cells over near-uniform synthetic
    // vectors (max pairwise cosine ~0.5 — no planted structure, the
    // hardest case for any IVF): candidate coverage alone would give
    // ~12.5/50, Voronoi locality must beat it clearly (measured 19);
    // the oracle pins exactness of the ALGORITHM, this pins that the
    // index is better than random probing
    assert(hits >= 16, s"recall@5 not above the coverage line: $hits/50")
  }

  test("pqTrain: model shape, codes in range, encode deterministic") {
    val emb = Tables.embeddings(spark, sf)
    val model = Similarity.pqTrain(emb, "embedding", m = 8, numCodes = 16)
    assert(model.m === 8 && model.numCodes === 16 && model.dsub === 8)
    assert(model.codebooks.length === 8)
    assert(model.codebooks.forall(_.length === 16))
    assert(model.codebooks.forall(_.forall(_.length === 8)))
    val enc = Similarity.pqEncode(emb, "vec_id", "embedding", model)
    val codes = enc.select(col("vec_id"), col("codes")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes.values.forall(c => c.length == 8 && c.forall(x => x >= 0 && x < 16)))
    val again = Similarity.pqEncode(emb, "vec_id", "embedding", model)
      .select(col("vec_id"), col("codes")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes === again, "encoding must be deterministic")
  }

  test("PQ ADC top-k with rescore reaches recall >= 0.8 vs exact at sf0.01") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") < 20)
    val k = 5
    val exact = Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", k)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    // near-random embeddings are PQ's worst case (no subspace
    // structure to exploit): measured recall@5 at sf0.01 —
    // m=8/nc=16/rf=8 0.73, m=16/nc=16/rf=8 0.89, m=16/nc=16/rf=16
    // 0.99 — so the production config is 16 subspaces of 4 dims
    val model = Similarity.pqTrain(emb, "embedding", m = 16, numCodes = 16)
    val approx = Similarity.pqAdcTopK(queries, emb, "vec_id", "embedding",
        model, k, rescoreFactor = 16)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    info(f"PQ+rescore recall@$k = $recall%.3f")
    assert(recall >= 0.8, f"recall $recall%.3f below 0.8")
    // raw ADC (no rescore) must itself beat random probing
    val raw = Similarity.pqAdcTopK(queries, emb, "vec_id", "embedding",
        model, k, rescoreFactor = 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val rawRecall = (exact & raw).size.toDouble / exact.size
    info(f"PQ raw ADC recall@$k = $rawRecall%.3f")
    assert(rawRecall > 0.1)
  }

  test("IVF×PQ composed index: recall floor vs exact; full probe recovers PQ-only") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") < 20)
    val k = 5
    val exact = Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", k)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    // production config from the PQ test (16 subspaces of 4 dims) at
    // half probe: measured 0.92 on the near-random sf0.01 corpus —
    // the compounding of cell misses × ADC ranking noise
    val half = Similarity.ivfPqTopK(queries, emb, "vec_id", "embedding", k,
        numCells = 16, nprobe = 8, m = 16, numCodes = 16, rescoreFactor = 16)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val halfRecall = (exact & half).size.toDouble / exact.size
    info(f"IVF×PQ recall@$k at nprobe=8/16 = $halfRecall%.3f")
    assert(halfRecall >= 0.8, f"recall $halfRecall%.3f below 0.8")
    // full probe removes the cell-miss term: what remains is exactly
    // the PQ ADC approximation (measured 0.99 — the PQ-only number)
    val full = Similarity.ivfPqTopK(queries, emb, "vec_id", "embedding", k,
        numCells = 16, nprobe = 16, m = 16, numCodes = 16, rescoreFactor = 16)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val fullRecall = (exact & full).size.toDouble / exact.size
    info(f"IVF×PQ recall@$k at full probe = $fullRecall%.3f")
    assert(fullRecall >= halfRecall,
      "widening the probe must never lose recall")
    assert(fullRecall >= 0.9)
    // the scoring pass must stay a bucket join: no cartesian anywhere
    val plan = Similarity.ivfPqTopK(queries, emb, "vec_id", "embedding", k,
        numCells = 16, nprobe = 8, m = 16, numCodes = 16,
        rescoreFactor = 16)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
  }

  test("IVF×PQ residual encoding >= raw encoding on clustered data (A/B)") {
    // 16 well-separated 64-dim clusters (xxhash-derived centers scaled
    // ×4) with small per-member noise — the regime real embedding
    // corpora live in, and the one where raw-vector PQ collapses: all
    // members of a cluster quantize to nearly the SAME raw codes, so
    // within-cell ADC ranking degenerates to ties, while residual
    // codes spend all m·log₂(numCodes) bits on the within-cell offset
    // (the Jégou et al. 2011 argument, pinned empirically here).
    // members vary around their center along TWO latent directions
    // (a·u + b·w, the low-rank residual structure real embedding
    // corpora exhibit): residual PQ quantizes that 2-dof patch finely,
    // raw PQ spends its codes separating the 16 centers and leaves the
    // within-cell variation below quantization resolution
    val embDf = spark.range(0L, 2000L, 1L, 8)
      .withColumn("__c", expr("CAST(id % 16 AS BIGINT)"))
      .withColumn("__a", expr(
        "CAST(pmod(xxhash64(id, 9991), 1000) AS FLOAT) / 1000.0f"))
      .withColumn("__b", expr(
        "CAST(pmod(xxhash64(id, 7777), 1000) AS FLOAT) / 1000.0f"))
      .withColumn("embedding", expr(
        "transform(sequence(0, 63), j -> " +
        "CAST(pmod(xxhash64(__c, j), 1000) AS FLOAT) / 125.0f - 4.0f + " +
        "__a * (CAST(pmod(xxhash64(j, 101), 1000) AS FLOAT) / 2000.0f) + " +
        "__b * (CAST(pmod(xxhash64(j, 202), 1000) AS FLOAT) / 2000.0f))"))
      .select(col("id").as("vec_id"), col("embedding"))
      .cache()
    val queries = embDf.filter(col("vec_id") < 20)
    val k = 5
    // ADC approximates the INNER PRODUCT, so the encoding A/B is
    // measured against exact dot-product top-k (driver math over the
    // 2000-vector fixture) with rescoreFactor=1 — the returned SET is
    // exactly the ADC top-k, no cosine-rescore slack to hide behind
    val all = embDf
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Array[Double])].collect().sortBy(_._1)
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var j = 0
      while (j < a.length) { s += a(j).toDouble * b(j); j += 1 }
      s
    }
    val exactDot: Set[(Long, Long)] = (for {
      (qid, qv) <- all.take(20).toSeq
      (nid, _) <- all.iterator
        .filter(_._1 != qid)
        .map { case (nid, nv) => (nid, dot(qv, nv)) }.toSeq
        .sortBy { case (nid, d) => (-d, nid) }.take(k)
    } yield (qid, nid)).toSet
    // capture rate: is the exact top-5 inside the ADC top-20 — the
    // candidate set a production rescore (rescoreFactor=4) would see
    def recallOf(residual: Boolean): Double = {
      val got = Similarity.ivfPqTopK(queries, embDf, "vec_id", "embedding",
          k = 4 * k, numCells = 16, nprobe = 16, m = 16, numCodes = 16,
          rescoreFactor = 1, residual = residual)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      (exactDot & got).size.toDouble / exactDot.size
    }
    val raw = recallOf(residual = false)
    val res = recallOf(residual = true)
    info(f"IVF×PQ ADC top-20 capture of exact-dot top-$k: " +
      f"residual=$res%.3f raw=$raw%.3f")
    // measured: residual 0.57 vs raw 0.13 (deterministic: seeded fits,
    // xxhash fixture). The absolute number is capped by 16 codes
    // resolving a continuous 2-dof patch — at numCodes=64 both rise
    // (0.76 vs 0.65) — so the pin is the GAP, with a generous margin
    // under the measured 4.4x
    assert(res >= raw + 0.2,
      f"residual capture $res%.3f must clearly beat raw $raw%.3f at equal " +
        "m/numCodes/nprobe on clustered data")
    assert(res >= 0.5, f"residual capture $res%.3f collapsed below 0.5")
    embDf.unpersist(blocking = false)
  }

  test("IVF×PQ build/query split: one persisted index serves many batches") {
    val emb = Tables.embeddings(spark, sf)
    val idx0 = Similarity.ivfPqBuild(emb, "vec_id", "embedding",
      numCells = 16, m = 16, numCodes = 16)
    val idx = idx0.copy(index = idx0.index.persist())
    try {
      def run(qs: org.apache.spark.sql.DataFrame) =
        Similarity.ivfPqQuery(idx, qs, emb, "vec_id", "embedding",
            k = 3, nprobe = 8, rescoreFactor = 8)
          .select("query_id", "neighbor_id", "rk")
          .as[(Long, Long, Int)].collect().toSet
      val batch1 = run(emb.filter(col("vec_id") < 10))
      val batch2 = run(emb.filter(col("vec_id") >= 10 && col("vec_id") < 20))
      assert(batch1.map(_._1) == (0L until 10L).toSet)
      assert(batch2.map(_._1) == (10L until 20L).toSet)
      // the one-shot compose must equal build+query for the same batch
      val oneShot = Similarity.ivfPqTopK(emb.filter(col("vec_id") < 10),
          emb, "vec_id", "embedding", k = 3, numCells = 16, nprobe = 8,
          m = 16, numCodes = 16, rescoreFactor = 8)
        .select("query_id", "neighbor_id", "rk")
        .as[(Long, Long, Int)].collect().toSet
      assert(batch1 == oneShot,
        "ivfPqTopK must be exactly ivfPqQuery(ivfPqBuild(...))")
    } finally idx.index.unpersist(blocking = false)
  }

  test("pqPortable: ADC decomposition is exactly the reconstructed dot product") {
    val emb = Tables.embeddings(spark, sf).filter(col("vec_id") < 200)
    val queries = emb.filter(col("vec_id") < 5)
    val out = Similarity.pqPortable(emb, queries, "vec_id", "embedding",
      topK = 200).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    // independent reference: quantize, encode by integer argmin,
    // reconstruct, dot — pure Scala, no Spark
    val cb = Similarity.pqPortableCodebook(8, 16, 8)
    val vecs = emb.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 256).toLong).toArray)
      .toMap
    def encode(v: Array[Long]): Array[Int] = Array.tabulate(8) { sub =>
      (0 until 16).minBy { code =>
        val d = (0 until 8).map(j => v(sub * 8 + j) - cb(sub)(code)(j))
        (d.map(x => x * x).sum, code)
      }
    }
    for (((q, n), got) <- out) {
      val qs = vecs(q); val codes = encode(vecs(n))
      val want = (0 until 8).map(sub =>
        (0 until 8).map(j => qs(sub * 8 + j) * cb(sub)(codes(sub))(j)).sum).sum
      assert(got === want, s"query=$q neighbor=$n")
    }
    assert(out.nonEmpty)
  }

  test("OPQ rotation: orthonormal, and cuts PQ error on variance-skewed data") {
    // The OPQ paper's motivating regime: ALL the variance lives in one
    // subspace (dims 0-3 of d=16 at m=4), so plain PQ burns three
    // subspaces' codebooks on noise while subspace 0's 8 codes must
    // cover a 4-dof Gaussian. The learned rotation spreads the
    // informative directions across subspaces — each codebook then
    // quantizes ~1 dof — and reconstruction error collapses.
    val rnd = new scala.util.Random(7)
    val d = 16; val m = 4; val dsub = 4
    val sample = Array.fill(400) {
      Array.tabulate(d)(j =>
        if (j < 4) rnd.nextGaussian() * 4.0 else rnd.nextGaussian() * 0.05)
    }
    val r = Similarity.opqTrainRotation(sample, m, numCodes = 8,
      dsub = dsub, seed = 42L, iters = 8)
    // orthonormality: max |RᵀR − I| (a non-rotation would warp space)
    var dev = 0.0
    for (i <- 0 until d; j <- 0 until d) {
      val s = (0 until d).map(k => r(k)(i) * r(k)(j)).sum
      dev = math.max(dev, math.abs(s - (if (i == j) 1.0 else 0.0)))
    }
    assert(dev < 1e-8, s"rotation not orthonormal: max dev $dev")
    def mse(vs: Array[Array[Double]], pq: Similarity.PqModel): Double =
      vs.map { v =>
        val q = Similarity.pqReconstruct(v, pq)
        v.indices.map(j => (v(j) - q(j)) * (v(j) - q(j))).sum
      }.sum / vs.length
    val plainPq = Similarity.pqTrain(
      spark.createDataset(sample.map(_.toSeq)).toDF("__v")
        .select(col("__v").cast("array<double>").as("v")),
      "v", m = m, numCodes = 8, seed = 42L)
    val errPlain = mse(sample, plainPq)
    val rotated = sample.map(Similarity.matVec(r, _))
    val opqPq = Similarity.pqTrain(
      spark.createDataset(rotated.map(_.toSeq)).toDF("__v")
        .select(col("__v").cast("array<double>").as("v")),
      "v", m = m, numCodes = 8, seed = 42L)
    val errOpq = mse(rotated, opqPq)
    // rotation preserves norms, so the two MSEs share units; demand a
    // real win, not noise
    assert(errOpq < errPlain * 0.8,
      s"OPQ did not improve: plain $errPlain vs opq $errOpq")
  }

  test("OPQ IVF×PQ end-to-end: rotated index + rotated queries, recall vs exact") {
    // clustered 64-dim corpus (the residual-A/B fixture shape); the
    // check is PLUMBING consistency: an index in rotated space probed
    // with unrotated queries (or vice versa) craters recall, so a
    // healthy floor pins that build and query rotate consistently
    val embDf = spark.range(0L, 500L, 1L, 4)
      .withColumn("__c", expr("CAST(id % 8 AS BIGINT)"))
      .withColumn("embedding", expr(
        "transform(sequence(0, 63), j -> " +
        "CAST(pmod(xxhash64(__c, j), 1000) AS FLOAT) / 125.0f - 4.0f + " +
        "CAST(pmod(xxhash64(id, j), 1000) AS FLOAT) / 4000.0f)"))
      .select(col("id").as("vec_id"), col("embedding"))
      .cache()
    val queries = embDf.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(queries, embDf, "vec_id",
        "embedding", k = 5)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    val got = Similarity.ivfPqTopK(queries, embDf, "vec_id", "embedding",
        k = 5, numCells = 8, nprobe = 8, m = 8, numCodes = 16,
        rescoreFactor = 16, opqIters = 2)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    val recall = (got intersect exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"OPQ IVF×PQ recall $recall vs exact")
  }
}
