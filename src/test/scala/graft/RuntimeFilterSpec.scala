package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins Catalyst's runtime bloom-filter injection (InjectRuntimeFilter):
  * on a selective dim⋈fact equi-join the optimizer builds a bloom
  * filter from the filtered creation side and pushes a
  * `might_contain` probe into the fact side BEFORE its shuffle — at
  * 100 TB this is what keeps a 0.1%-selective dim filter from
  * shuffling the whole fact table. The engine relies on this built-in
  * (rather than re-implementing semi-join pushdown), so the contract
  * is spec-pinned: if a Spark upgrade or conf drift stops injecting,
  * this fails loudly.
  */
class RuntimeFilterSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("selective dim filter injects a bloom probe into the fact side") {
    val dir = java.nio.file.Files.createTempDirectory("graft-rtf").toString
    import spark.implicits._
    (1L to 100000L).map(i => (i, i % 1000, i * 2.0))
      .toDF("id", "key", "v").write.mode("overwrite")
      .parquet(s"$dir/fact")
    (0L until 1000L).map(k => (k, s"g${k % 50}"))
      .toDF("key", "grp").write.mode("overwrite")
      .parquet(s"$dir/dim")
    val prev = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold"
    ).map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // testdata-sized fact: drop the 10GB default so injection triggers
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1b")
      // the rule only targets shuffle joins (a broadcastable dim would
      // already prune at the scan via the join itself)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim").filter(col("grp") === "g7")
      val j = fact.join(dim, "key")
      val plan = j.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"),
        s"expected a runtime bloom probe on the fact side:\n$plan")
      // and it must not change the answer
      assert(j.count() == 100000L / 50)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
