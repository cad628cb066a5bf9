package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class SkewSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // heavily skewed fact side: 90% of rows carry key 7
  private lazy val fact = (1 to 1000).map { i =>
    (if (i <= 900) 7L else (i % 20).toLong, i.toLong, i * 2.0)
  }.toDF("okey", "line", "v")
  private lazy val dim = (0L to 19L).map(k => (k, s"name_$k")).toDF("okey", "label")

  test("salted join reproduces the plain join's row multiset exactly") {
    val salted = Skew.saltedEquiJoin(fact, dim, "okey", col("line"), salts = 8)
      .select("okey", "line", "v", "label")
    val plain = fact.join(dim, "okey").select("okey", "line", "v", "label")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("join keys include the salt and the small side is replicated") {
    val out = Skew.saltedEquiJoin(fact, dim, "okey", col("line"), salts = 8)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), s"salt column missing from plan:\n$plan")
    // replication factor: the exploded small side is salts × |dim|
    val replicated = dim.withColumn("__salt",
      explode(array((0 until 8).map(lit): _*)))
    assert(replicated.count() == dim.count() * 8)
  }

  test("a single hot key's rows spread across multiple salt cells") {
    val salts = 8
    val cells = fact.filter(col("okey") === 7L)
      .withColumn("__salt", pmod(xxhash64(col("line")), lit(salts)).cast("int"))
      .select("__salt").distinct().count()
    assert(cells > salts / 2, s"expected hot key to spread, got $cells cells")
  }

  test("salts must be positive") {
    intercept[IllegalArgumentException] {
      Skew.saltedEquiJoin(fact, dim, "okey", col("line"), salts = 0)
    }
  }
}
