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
}
