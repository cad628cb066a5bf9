package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class SplitsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs(n: Int) =
    (0 until n).map(i => (i.toLong, s"src${i % 4}")).toDF("doc_id", "source")

  test("assign is exhaustive, deterministic, and near the target ratios") {
    val out = Splits.assign(docs(2000), "doc_id",
      Seq(("train", 80), ("val", 10), ("test", 10)))
    assert(out.count() == 2000, "every row gets exactly one split")
    val byS = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byS.keySet == Set("train", "val", "test"))
    // md5 is uniform: 2000 rows land within generous binomial slack
    assert(byS("train") > 1450 && byS("train") < 1750, byS.toString)
    assert(byS("val") > 100 && byS("val") < 320, byS.toString)
    // same input → identical assignment, row for row
    val again = Splits.assign(docs(2000), "doc_id",
      Seq(("train", 80), ("val", 10), ("test", 10)))
    assert(out.except(again).count() == 0 && again.except(out).count() == 0)
  }

  test("assign is stable under corpus growth: old rows keep their split") {
    val small = Splits.assign(docs(500), "doc_id", Seq(("a", 50), ("b", 50)))
      .select("doc_id", "split")
    val large = Splits.assign(docs(2000), "doc_id", Seq(("a", 50), ("b", 50)))
      .select("doc_id", "split").filter(col("doc_id") < 500)
    assert(small.except(large).count() == 0 && large.except(small).count() == 0)
  }

  test("assign rejects percentages that do not sum to 100") {
    intercept[IllegalArgumentException] {
      Splits.assign(docs(10), "doc_id", Seq(("a", 60), ("b", 60)))
    }
  }

  test("mix emits whole epochs exactly and the fractional epoch proportionally") {
    val out = Splits.mix(docs(1000), "doc_id", "source",
      Map("src0" -> 2000000L, "src1" -> 500000L)) // 2.0 and 0.5 epochs
    val src0 = out.filter(col("source") === "src0")
    // rate 2.0: every src0 doc appears in epochs 0 and 1, never 2
    assert(src0.count() == 2 * 250)
    assert(src0.groupBy("doc_id").count().filter(col("count") =!= 2).count() == 0)
    assert(src0.agg(max("epoch")).head.getLong(0) == 1L)
    // rate 0.5: only epoch 0, roughly half the 250 docs
    val src1 = out.filter(col("source") === "src1")
    assert(src1.agg(max("epoch")).head.getLong(0) == 0L)
    val n1 = src1.count()
    assert(n1 > 85 && n1 < 165, s"src1 kept $n1 of 250 at rate 0.5")
    // unknown sources are dropped
    assert(out.filter(col("source").isin("src2", "src3")).count() == 0)
  }

  test("mix at rate 1.0 is the identity fan-out (one epoch, all rows)") {
    val out = Splits.mix(docs(400), "doc_id", "source",
      Map("src2" -> 1000000L))
    assert(out.count() == 100)
    assert(out.agg(max("epoch")).head.getLong(0) == 0L)
  }

  test("mix plans no shuffle: pure map-side fan-out") {
    val out = Splits.mix(docs(100), "doc_id", "source",
      Map("src0" -> 1500000L))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"mix must not shuffle:\n$plan")
  }
}
