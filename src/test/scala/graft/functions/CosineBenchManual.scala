package graft.functions

// Manual micro-benchmark (not a ScalaTest suite): compares the
// codegen'd cosine against the HOF form on the sf0.1 embeddings.
//   sbt "Test/runMain graft.functions.CosineBenchManual"
object CosineBenchManual {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val spark = graft.SparkTestSession.spark
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).cache()
    emb.count()

    def cosineHof(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
      def dot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
        aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
          lit(0.0), (acc, v) => acc + v)
      dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
    }

    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    val q = emb.limit(10).select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val joined = emb.crossJoin(broadcast(q))
    for (_ <- 1 to 3) {
      time("hof    ")(joined.select(sum(cosineHof(col("embedding"), col("qv")))).head())
      time("codegen")(joined.select(sum(
        graft.operators.Similarity.cosine(col("embedding"), col("qv")))).head())
    }
    spark.stop()
  }
}
