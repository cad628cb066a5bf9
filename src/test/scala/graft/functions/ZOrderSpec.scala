package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import org.apache.spark.sql.graftshim.ColumnExpr

class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("ZOrderUtil.bucket: boundary semantics (right-closed on ties)") {
    val b = Array(10.0, 20.0, 30.0)
    assert(ZOrderUtil.bucket(5.0, b) == 0)
    assert(ZOrderUtil.bucket(10.0, b) == 1)
    assert(ZOrderUtil.bucket(15.0, b) == 1)
    assert(ZOrderUtil.bucket(30.0, b) == 3)
    assert(ZOrderUtil.bucket(99.0, b) == 3)
    // duplicate boundaries collapse to the rightmost bucket
    assert(ZOrderUtil.bucket(7.0, Array(7.0, 7.0, 9.0)) == 2)
  }

  test("StringOrderPrefix preserves lexicographic order to 8-byte prefixes") {
    val ss = Seq("", "a", "ab", "abc", "b", "ba", "zzzzzzzz", "zzzzzzzza")
    val ds = ss.toDF("s")
      .select(ColumnExpr.column(StringOrderPrefix(ColumnExpr.expr(col("s")))).as("p"))
      .as[Double].collect()
    // same relative order as the strings themselves, except the two
    // sharing an 8-byte prefix, which may tie
    assert(ds.init.zip(ds.tail.init).forall { case (a, b) => a <= b })
    assert(ds(6) == ds(7), "9th byte must not affect the projection")
    assert(ds(0) < ds(1) && ds(3) < ds(4))
  }

  test("InterleaveBits matches a BigInt bit-weave model, codegen == interpreted") {
    val bits = 4
    def model(xs: Seq[Int]): Long = {
      var out = 0L
      for (j <- bits - 1 to 0 by -1; v <- xs)
        out = (out << 1) | ((v >> j) & 1)
      out
    }
    val rows = for (x <- 0 until 16; y <- 0 until 16) yield (x, y)
    val got = rows.toDF("x", "y")
      .select(col("x"), col("y"),
        ColumnExpr.column(InterleaveBits(
          Seq(ColumnExpr.expr(col("x")), ColumnExpr.expr(col("y"))), bits)).as("z"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    rows.foreach { case (x, y) =>
      assert(got((x, y)) == model(Seq(x, y)), s"($x,$y)")
    }
    // z-curve locality sanity: (0,0),(0,1),(1,0),(1,1) are the first 4
    val first4 = rows.sortBy(p => got(p)).take(4).toSet
    assert(first4 == Set((0, 0), (0, 1), (1, 0), (1, 1)))
  }

  test("zValueColumn supports date and timestamp columns") {
    // date/timestamp cannot cast to long directly — this pins the
    // unix_date/unix_micros projection path
    val rows = (0 until 200).map { i =>
      (java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i % 40)),
        java.sql.Timestamp.valueOf(s"2024-01-01 0${i % 10}:00:00"), i.toLong)
    }
    val df = rows.toDF("d", "ts", "id")
    val z = ZOrder.zValueColumn(df, Seq("d", "ts"))
    val zs = df.withColumn("z", z).select("z").as[Long].collect()
    assert(zs.distinct.length > 30, "date/timestamp z-values must spread")
  }

  test("zValueColumn: interleaved z on a skewed grid still balances buckets") {
    // x skewed (quadratic), y uniform — quantile boundaries must
    // equalize x's buckets where equi-width would collapse them
    val rows = for (i <- 0 until 64; j <- 0 until 64) yield (i.toLong * i, j.toLong)
    val df = rows.toDF("x", "y")
    val z = ZOrder.zValueColumn(df, Seq("x", "y"))
    val zs = df.withColumn("z", z).select("z").as[Long].collect()
    assert(zs.distinct.length > 1000, "z-values must spread, not collapse")
  }
}
