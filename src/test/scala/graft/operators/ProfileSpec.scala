package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class ProfileSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val df = Seq(
    (Some(2L), Some("banana")),
    (Some(10L), Some("apple")),
    (Some(10L), None),
    (None, Some("cherry")))
    .toDF("num", "fruit")

  test("counts, distincts and NATIVE-order min/max per column") {
    val rows = Profile.profile(df, Seq("num", "fruit"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3), r.getString(4))).toMap
    // numeric min is 2 even though "10" < "2" lexicographically
    assert(rows("num") == ((3L, 2L, "2", "10")))
    assert(rows("fruit") == ((3L, 3L, "apple", "cherry")))
  }

  test("one row per profiled column, single-pass plan") {
    val out = Profile.profile(df, Seq("num", "fruit"))
    assert(out.count() == 2)
    // a single aggregate: exactly one Expand-backed scan of the input
    val scans = out.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("LocalTableScan"))
    assert(scans == 1, "profiler must not rescan the input per column")
  }

  test("custom formatter controls the min/max rendering") {
    val out = Profile.profile(df, Seq("num"),
        (_, v) => v.cast("decimal(10,2)").cast("string"))
      .collect().head
    assert(out.getString(3) == "2.00" && out.getString(4) == "10.00")
  }

  test("empty column list is rejected") {
    intercept[IllegalArgumentException] { Profile.profile(df, Nil) }
  }
}
