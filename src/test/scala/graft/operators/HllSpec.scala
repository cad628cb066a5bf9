package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class HllSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Independent scalar model of the portable 48-bit hash + register
    * split — MessageDigest, not Spark expressions.
    */
  private def modelRegisters(values: Seq[String], m: Int): Map[Int, Int] = {
    val md = MessageDigest.getInstance("MD5")
    val bits = Integer.numberOfTrailingZeros(m)
    values.distinct.map { v =>
      val hex = md.digest(v.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(12)
      val h = java.lang.Long.parseLong(hex, 16)
      val bucket = (h % m).toInt
      val rest = h >>> bits
      val w = 48 - bits
      val rho = if (rest == 0) w + 1 else w + 1 - (64 - java.lang.Long.numberOfLeadingZeros(rest))
      (bucket, rho)
    }.groupBy(_._1).map { case (b, rs) => b -> rs.map(_._2).max }
  }

  test("registers match an independent scalar model bit-for-bit") {
    val vals = (0 until 2000).map(i => (i % 700).toString)
    val df = vals.toDF("v")
    val got = Hll.registers(df, col("v"), 64)
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(got == modelRegisters(vals, 64))
  }

  test("estimate lands within HLL's expected error at m=64") {
    val n = 5000
    val vals = (0 until n).map(_.toString)
    val regs = Hll.registers(vals.toDF("v"), col("v"), 64)
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toSeq
    val est = Hll.estimate(regs, 64)
    // theoretical sigma ≈ 1.04/sqrt(64) = 13%; allow 3 sigma
    assert(math.abs(est - n) < 0.4 * n, s"estimate $est vs true $n")
  }

  test("linear counting handles the sparse range accurately") {
    val vals = (0 until 10).map(i => s"val_$i")
    val regs = Hll.registers(vals.toDF("v"), col("v"), 64)
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toSeq
    val est = Hll.estimate(regs, 64)
    assert(math.abs(est - 10) <= 2, s"linear-counting estimate $est vs 10")
  }

  test("duplicates do not move the registers") {
    val once = Hll.registers(Seq("a", "b", "c").toDF("v"), col("v"), 16)
      .collect().map(r => (r.getInt(0), r.getInt(1))).sortBy(_._1).toSeq
    val dup = Hll.registers(
        Seq("a", "b", "c", "a", "a", "b").toDF("v"), col("v"), 16)
      .collect().map(r => (r.getInt(0), r.getInt(1))).sortBy(_._1).toSeq
    assert(once == dup)
  }

  test("m must be a power of two") {
    intercept[IllegalArgumentException] {
      Hll.registers(Seq("a").toDF("v"), col("v"), 48)
    }
  }
}
