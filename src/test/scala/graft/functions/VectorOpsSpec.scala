package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The codegen'd vector expressions must be BIT-identical to the SQL
  * higher-order-function forms they replaced: the driver oracle
  * (DuckDB list_cosine_similarity) was validated against the HOF form,
  * and the LSH bucket ids feed join keys where any drift changes
  * candidate sets.
  */
class VectorOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** The original zip_with/aggregate cosine. */
  private def cosineHof(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** The original SQL-string hyperplane sketch. */
  private def sketchHof(vecCol: String, planes: Int, salt: Int): Column = expr(
    s"""aggregate(
       |  transform(sequence(0, ${planes - 1}), j ->
       |    IF(aggregate(zip_with($vecCol, sequence(0, size($vecCol) - 1),
       |         (v, d) -> cast(v as double) *
       |           IF(pmod(xxhash64(concat('plane-$salt-', j, '-', d)), 2) = 0, 1.0D, -1.0D)),
       |       0D, (acc, x) -> acc + x) > 0D,
       |       shiftleft(1L, j), 0L)),
       |  0L, (a, b) -> a | b)""".stripMargin)

  private def randVecs(n: Int, dim: Int): Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(7)
    (1 to n).map(i => (i.toLong, Array.fill(dim)(rnd.nextFloat() * 2 - 1)))
  }

  test("CosineSimilarity is bit-identical to the zip_with/aggregate form") {
    val df = randVecs(200, 32).toDF("id", "v")
      .withColumn("w", reverse(col("v")))
    val both = df.select(
      graft.operators.Similarity.cosine(col("v"), col("w")).as("gen"),
      cosineHof(col("v"), col("w")).as("hof"))
    val rows = both.collect()
    assert(rows.length == 200)
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
             java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"bit mismatch: ${r.getDouble(0)} vs ${r.getDouble(1)}")
    }
  }

  test("CosineSimilarity edge cases") {
    // zero vector: null (try_divide semantics — ANSI Divide would throw,
    // which is useless mid-query; null drops the pair like a no-match)
    val zero = Seq((1L, Array(0f, 0f, 0f), Array(1f, 2f, 3f))).toDF("id", "a", "b")
      .select(graft.operators.Similarity.cosine(col("a"), col("b")).as("c")).head()
    assert(zero.isNullAt(0), "zero vector must yield null, not divide-by-zero")
    // self-similarity agrees with the HOF form
    val self = Seq((1L, Array(1f, 2f, 3f))).toDF("id", "a")
      .select(graft.operators.Similarity.cosine(col("a"), col("a")).as("c"),
              cosineHof(col("a"), col("a")).as("h")).head()
    assert(self.getDouble(0) == self.getDouble(1))
    // mismatched lengths -> null (zip_with pads with null)
    val mism = Seq((1L, Array(1f, 2f), Array(1f, 2f, 3f))).toDF("id", "a", "b")
      .select(graft.operators.Similarity.cosine(col("a"), col("b")).as("c")).head()
    assert(mism.isNullAt(0))
  }

  test("HyperplaneSketch is bit-identical to the SQL form across salts") {
    val df = randVecs(300, 24).toDF("id", "v")
    for (salt <- Seq(0, 3, 13); planes <- Seq(3, 8, 16)) {
      val cmp = df.select(
        graft.operators.Similarity.hyperplaneSketch("v", planes, salt).as("gen"),
        sketchHof("v", planes, salt).as("hof"))
        .filter(col("gen") =!= col("hof"))
      assert(cmp.count() == 0, s"bucket drift at salt=$salt planes=$planes")
    }
  }

  test("expressions run inside whole-stage codegen") {
    // a range source (not a local relation, which collapses at optimize
    // time) so the executed plan shows the codegen span
    val df = spark.range(10).select(col("id"),
      transform(sequence(lit(0), lit(7)),
        d => (pmod(col("id") + d, lit(10)) - lit(5)).cast("float")).as("v"))
    val plan = df.select(
      graft.operators.Similarity.cosine(col("v"), col("v")).as("c"),
      graft.operators.Similarity.hyperplaneSketch("v", 8).as("b"))
      .queryExecution.executedPlan
    // the '*(n)' prefix marks operators inside a WholeStageCodegen stage
    val opLine = plan.toString.linesIterator
      .find(_.contains("cosine_similarity")).getOrElse("")
    assert(opLine.trim.startsWith("*("),
      s"vector ops fell out of codegen:\n$plan")
  }
}
