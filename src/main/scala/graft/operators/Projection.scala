package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Signed random projection — the dimensionality-reduction half of the
  * embedding toolbox (Achlioptas 2003: ±1 entries preserve pairwise
  * distances in expectation as well as Gaussian ones). Reduces a
  * D-dim embedding column to k integer components `p_j = Σ_i s(i,j)·q_i`
  * where `q_i` is the e3-quantized input and `s(i,j) ∈ {−1,+1}` is
  * derived from md5 parity of the (i, j) cell — the matrix is a pure
  * function of the indices, so every executor (and the DuckDB oracle)
  * regenerates it identically with nothing shipped.
  *
  * Scale shape: the D×k sign matrix is metadata-sized (built with
  * spark.range, broadcast-joined), the projection is one explode +
  * broadcast join + groupBy on the vector id — a single shuffle whose
  * payload is k longs per vector. Integer arithmetic end to end, so
  * results are bit-stable across layouts and engines.
  */
object Projection {

  /** The deterministic ±1 matrix as a (i, j, s) frame; i is 1-based
    * over input dims, j is 0-based over output dims.
    */
  def signMatrix(spark: SparkSession, dims: Int, k: Int): DataFrame = {
    val idx = spark.range(1, dims + 1).toDF("i")
      .crossJoin(spark.range(0, k).toDF("j"))
    idx.select(col("i"), col("j"),
      when(pmod(conv(substring(
          md5(concat(col("i"), lit("_"), col("j"))), 1, 1), 16, 10)
        .cast("long"), lit(2L)) === 0, 1L).otherwise(-1L).as("s"))
  }

  /** Project `vecCol` (array<float|double>) of `df` down to k signed
    * sums of the e3-quantized components. Output: idCol plus
    * `proj` = space-joined k longs (j ascending) and `k` itself.
    */
  def project(df: DataFrame, idCol: String, vecCol: String,
      dims: Int, k: Int): DataFrame = {
    val spark = df.sparkSession
    val quant = df.select(col(idCol),
        posexplode(col(vecCol)).as(Seq("pos", "v")))
      .select(col(idCol), (col("pos") + 1).cast("long").as("i"),
        round(col("v").cast("double") * 1000).cast("long").as("q"))
    quant
      .join(broadcast(signMatrix(spark, dims, k)), Seq("i"))
      .groupBy(col(idCol), col("j"))
      .agg(sum(col("s") * col("q")).as("p"))
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(col("j"), col("p")))).as("ps"))
      .select(col(idCol),
        array_join(transform(col("ps"), x => x("p")), " ").as("proj"),
        size(col("ps")).as("k"))
  }
}
