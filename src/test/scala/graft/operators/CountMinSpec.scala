package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class CountMinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // Scalar model of the whole sketch on a driver-side collection.
  private def scalarCells(key: String, depth: Int, width: Int): Seq[(Int, Int)] = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString
    (0 until depth).map(j =>
      j -> (java.lang.Long.parseLong(hex.substring(j * 6, j * 6 + 6), 16)
        % width).toInt)
  }

  private val keys: Seq[Long] =
    Seq.fill(50)(7L) ++ Seq.fill(20)(13L) ++ (100L to 199L)

  test("sketch counters match the scalar model exactly") {
    val sk = CountMin.sketch(keys.toDF("k"), col("k"), depth = 4, width = 64)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val expect = keys.flatMap(k => scalarCells(k.toString, 4, 64))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(sk == expect)
    assert(sk.size <= 4 * 64, "cell count must be bounded by depth*width")
  }

  test("estimates are one-sided: est >= truth for every key") {
    val df = keys.toDF("k")
    val sk = CountMin.sketch(df, col("k"), depth = 4, width = 64)
    val est = CountMin.estimate(sk, df, col("k"), depth = 4, width = 64)
      .collect().map(r => r.getString(0).toLong -> r.getLong(1)).toMap
    val truth = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
    truth.foreach { case (k, n) =>
      assert(est(k) >= n, s"underestimate for $k: ${est(k)} < $n")
    }
    // heavy hitters stand out even with collisions
    assert(est(7L) >= 50 && est(13L) >= 20)
  }

  test("the sketch rides a broadcast to the probe side") {
    val df = keys.toDF("k")
    val sk = CountMin.sketch(df, col("k"), depth = 4, width = 64)
    val plan = CountMin.estimate(sk, df, col("k"), depth = 4, width = 64)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast probe:\n$plan")
  }
}
