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

  test("salted join equals AQE's runtime skew split on the same skewed input") {
    // The operator doc sells saltedEquiJoin as "the manual counterpart
    // to AQE's runtime skew-join split" — this pins that claim: the
    // same skewed join run through AQE (thresholds forced low enough
    // that the 90%-hot-key partition actually splits) must produce the
    // identical row multiset, and the AQE plan must show the split
    // happened (a sort-merge join flagged skew=true), so the two
    // mechanisms are interchangeable on results and both defeat the
    // one-giant-task shape.
    val salted = Skew.saltedEquiJoin(fact, dim, "okey", col("line"), salts = 4)
      .select("okey", "line", "v", "label")
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "2KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "2KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.shuffle.partitions" -> "4")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val aqe = fact.join(dim, "okey").select("okey", "line", "v", "label")
      assert(aqe.exceptAll(salted).isEmpty && salted.exceptAll(aqe).isEmpty,
        "AQE skew join and salted join disagree on the row multiset")
      aqe.collect() // materialize so the adaptive plan is final
      val plan = aqe.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not split the skewed partition:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("salts must be positive") {
    intercept[IllegalArgumentException] {
      Skew.saltedEquiJoin(fact, dim, "okey", col("line"), salts = 0)
    }
  }
}
