package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.Tables
import graft.operators.Similarity

/** Pins the codegen'd PQ kernels ([[PqEncodeCodes]], [[PqAdcScore]])
  * bit-identical to their interpreted HOF reference forms on REAL
  * embeddings (the LongDotProduct/PlaneDots equality discipline), in
  * BOTH evaluation modes — whole-stage codegen and the interpreted
  * fallback path — plus the null/shape contract.
  */
class PqOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.01"

  private def withCodegen[T](on: Boolean)(body: => T): T = {
    val key = "spark.sql.codegen.wholeStage"
    val old = spark.conf.get(key)
    spark.conf.set(key, on.toString)
    try body finally spark.conf.set(key, old)
  }

  test("pq_encode matches the HOF reference bit-for-bit, both eval modes") {
    val emb = Tables.embeddings(spark, sf)
    val model = Similarity.pqTrain(emb, "embedding", m = 8, numCodes = 16)
    for (codegen <- Seq(true, false)) withCodegen(codegen) {
      val both = emb.select(col("vec_id"),
          Similarity.pqCodes(col("embedding"), model).as("native"),
          Similarity.pqCodesHof(col("embedding"), model).as("hof"))
        .collect()
      assert(both.nonEmpty)
      both.foreach { r =>
        assert(r.getSeq[Int](1) == r.getSeq[Int](2),
          s"codegen=$codegen vec_id=${r.getLong(0)}: " +
            s"${r.getSeq[Int](1)} != ${r.getSeq[Int](2)}")
      }
    }
  }

  test("pq_adc matches the HOF lookup sum bit-for-bit") {
    val emb = Tables.embeddings(spark, sf).limit(200)
    val model = Similarity.pqTrain(emb, "embedding", m = 8, numCodes = 16)
    val cb = typedlit(model.codebooks.map(_.map(_.toSeq).toSeq).toSeq)
    val lut = flatten(transform(sequence(lit(0), lit(model.m - 1)), sub =>
      transform(element_at(cb, sub + 1), cent =>
        aggregate(sequence(lit(0), lit(model.dsub - 1)), lit(0.0d),
          (acc, j) => acc + element_at(col("embedding"),
            (sub * model.dsub + j + 1).cast("int")).cast("double") *
            element_at(cent, j + 1)))))
    val df = emb.select(col("vec_id"),
        Similarity.pqCodes(col("embedding"), model).as("codes"),
        lut.as("lut"))
    val hofAdc = aggregate(sequence(lit(0), lit(model.m - 1)), lit(0.0d),
      (acc, sub) => acc + element_at(col("lut"),
        sub * model.numCodes + element_at(col("codes"), sub + 1) + 1))
    val nativeAdc = org.apache.spark.sql.graftshim.ColumnExpr.column(
      PqAdcScore(
        org.apache.spark.sql.graftshim.ColumnExpr.expr(col("lut")),
        org.apache.spark.sql.graftshim.ColumnExpr.expr(col("codes")),
        model.numCodes))
    val rows = df.select(nativeAdc.as("n"), hofAdc.as("h")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
    }
  }

  test("shape/null contract: wrong dim and bad codes yield NULL, not garbage") {
    val model = Similarity.pqTrain(
      Tables.embeddings(spark, sf), "embedding", m = 8, numCodes = 16)
    val short = Seq(Tuple1(Array(1.0f, 2.0f))).toDF("v")
    val enc = short.select(Similarity.pqCodes(col("v"), model).as("c"))
      .collect()
    assert(enc.head.isNullAt(0), "a 2-dim vector cannot encode in 8x8")
    val badAdc = Seq((Array.fill(128)(0.5), Array(0, 99)))
      .toDF("lut", "codes")
      .select(org.apache.spark.sql.graftshim.ColumnExpr.column(
        PqAdcScore(
          org.apache.spark.sql.graftshim.ColumnExpr.expr(col("lut")),
          org.apache.spark.sql.graftshim.ColumnExpr.expr(col("codes")),
          16)).as("s"))
      .collect()
    assert(badAdc.head.isNullAt(0), "out-of-range code must yield NULL")
  }

  test("the encode kernel beats the interpreted HOF on a corpus-sized pass") {
    // synthetic 200k x 64-dim corpus from pure arithmetic — the
    // index-build shape where interpreted-vs-compiled matters
    val n = 200000L
    val vecs = spark.range(0L, n, 1L, 8).select(col("id"),
      expr("transform(sequence(0, 63), j -> " +
        "cast(pmod(xxhash64(id, j), 1000) as float) / 500.0f - 1.0f)")
        .as("embedding"))
      .persist()
    vecs.count()
    try {
      val model = Similarity.pqTrain(vecs, "embedding", m = 8,
        numCodes = 16, maxFitRows = 10000L)
      def time(c: org.apache.spark.sql.Column): Double = {
        val t0 = System.nanoTime()
        vecs.select(c.as("codes"))
          .agg(sum(element_at(col("codes"), 1))).collect()
        (System.nanoTime() - t0) / 1e9
      }
      // warm both paths once (codegen compile, JIT)
      time(Similarity.pqCodes(col("embedding"), model))
      time(Similarity.pqCodesHof(col("embedding"), model))
      val native = time(Similarity.pqCodes(col("embedding"), model))
      val hof = time(Similarity.pqCodesHof(col("embedding"), model))
      info(f"encode 200k x 64d: native $native%.2f s vs HOF $hof%.2f s " +
        f"(${hof / native}%.1fx)")
      // conservative floor — measured ~5-15x; anything below 1.5x means
      // the kernel fell out of codegen
      assert(native * 1.5 <= hof,
        f"codegen'd encode ($native%.2f s) not meaningfully faster " +
          f"than interpreted HOF ($hof%.2f s)")
    } finally vecs.unpersist(blocking = false)
  }
}
