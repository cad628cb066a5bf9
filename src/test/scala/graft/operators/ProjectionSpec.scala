package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class ProjectionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def vecs(n: Int, dims: Int) =
    (0 until n).map { i =>
      (i.toLong, Array.tabulate(dims)(j =>
        math.sin(i * 31 + j).toFloat))
    }.toDF("vec_id", "embedding")

  test("sign matrix is ±1, dense, and a pure function of the indices") {
    val m = Projection.signMatrix(spark, 8, 4)
    assert(m.count() == 32)
    assert(m.filter(abs(col("s")) =!= 1).count() == 0)
    val a = m.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val b = Projection.signMatrix(spark, 8, 4).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(a == b, "matrix must regenerate identically")
    // not degenerate: both signs occur
    assert(a.values.toSet == Set(1L, -1L))
  }

  test("project matches a local integer reference computation") {
    val dims = 8; val k = 4
    val df = vecs(5, dims)
    val signs = Projection.signMatrix(spark, dims, k).collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1).toInt) -> r.getLong(2)).toMap
    val local = df.collect().map { r =>
      val id = r.getLong(0)
      val emb = r.getSeq[Float](1)
      val q = emb.map(v => math.round(v.toDouble * 1000))
      id -> (0 until k).map(j =>
        (1 to dims).map(i => signs((i, j)) * q(i - 1)).sum).mkString(" ")
    }.toMap
    val got = Projection.project(df, "vec_id", "embedding", dims, k)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == local)
  }

  test("projection approximately preserves relative distances (JL property)") {
    val dims = 64; val k = 16
    val df = vecs(40, dims)
    val proj = Projection.project(df, "vec_id", "embedding", dims, k)
      .collect().map(r => r.getLong(0) ->
        r.getString(1).split(" ").map(_.toDouble)).toMap
    val raw = df.collect().map(r => r.getLong(0) ->
      r.getSeq[Float](1).map(_.toDouble * 1000).toArray).toMap
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    // each output coordinate has E[(Σ sᵢdᵢ)²] = Σ dᵢ² = ||d||², so
    // E[||P·d||²] = k·||d||²: the k-normalized ratio concentrates
    // around 1 for a sample of pairs (JL concentration, loose band)
    val ids = raw.keys.toSeq.sorted
    val ratios = for {
      a <- ids.take(10); b <- ids.take(10) if a < b
    } yield d2(proj(a), proj(b)) / (k * d2(raw(a), raw(b)) + 1e-9)
    val mean = ratios.sum / ratios.size
    assert(mean > 0.3 && mean < 3.0 &&
      ratios.count(r => r > 0.15 && r < 6.0) > ratios.size * 0.8,
      s"mean ratio $mean; spread ${ratios.min}..${ratios.max}")
  }

  test("plan: sign matrix rides a broadcast, one shuffle on the vector id") {
    val df = vecs(20, 8)
    val out = Projection.project(df, "vec_id", "embedding", 8, 4)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"sign matrix must broadcast:\n$plan")
  }
}
