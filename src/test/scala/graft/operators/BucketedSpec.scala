package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class BucketedSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val db: String = {
    val name = "graft_bucketed_spec"
    if (!spark.catalog.databaseExists(name)) {
      val loc = java.nio.file.Files.createTempDirectory("graft-bspec-wh")
      spark.sql(s"CREATE DATABASE $name LOCATION '$loc'")
    }
    name
  }

  private lazy val tables: (String, String) = {
    val fact = (1L to 2000L).map(i => (i, i % 97, i * 3.0))
      .toDF("id", "key", "v")
    val dim = (0L to 96L).map(k => (k, s"label_$k")).toDF("key", "label")
    Bucketed.writeBucketed(fact, s"$db.fact_b", "key", buckets = 8)
    Bucketed.writeBucketed(dim, s"$db.dim_b", "key", buckets = 8)
    (s"$db.fact_b", s"$db.dim_b")
  }

  test("co-located join plans with zero Exchange on either side") {
    val (f, dTab) = tables
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      // force a sort-merge join so a broadcast can't mask a shuffle
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val j = Bucketed.cojoin(spark, f, dTab, "key", "key")
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("bucketed join result equals the plain unbucketed join") {
    val (f, dTab) = tables
    // the cojoin keeps both key columns; project the unambiguous rest
    val bucketed = Bucketed.cojoin(spark, f, dTab, "key", "key")
      .select("id", "v", "label")
    val fact = (1L to 2000L).map(i => (i, i % 97, i * 3.0))
      .toDF("id", "key", "v")
    val dim = (0L to 96L).map(k => (k, s"label_$k")).toDF("key", "label")
    val plain = fact.join(dim, "key").select("id", "v", "label")
    assert(bucketed.count() == plain.count())
    assert(bucketed.exceptAll(plain).isEmpty && plain.exceptAll(bucketed).isEmpty)
  }

  test("aggregation on the bucket key also avoids the shuffle") {
    val (f, _) = tables
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val agg = spark.table(f).groupBy("key").agg(sum("v"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"groupBy on the bucket key must not shuffle:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }
}
