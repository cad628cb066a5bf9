package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Dsir, TextAnalysis}

/** Dev: stage-by-stage timing of q73's plan pieces. */
object Probe73 {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n)")
    }
    val docs = Tables.documents(spark, d).select(col("doc_id"), col("source"), col("text"))
    val tgtSrc = Seq("src0", "src1", "src2", "src3")
    val raw = docs.filter(!col("source").isin(tgtSrc: _*))
    val target = docs.filter(col("source").isin(tgtSrc: _*))
    def occ(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id").cast("long").as("doc_id"),
          explode(Dsir.bigramsOf(TextAnalysis.tokens(col("text")))).as("bg"))
        .select(col("doc_id"), Dsir.bucketOf(col("bg"), 256).as("b"))
    for (_ <- 1 to 2) {
      time("rawOcc count")(occ(raw).count())
      time("tgtOcc count")(occ(target).count())
      time("rc")(occ(raw).groupBy("b").count().count())
      time("full q73")(graft.queries.PipelineQueries.q73DsirWeights(spark, d).count())
      val noWindow = {
        val rOcc = occ(raw)
        val tOcc = occ(target)
        val tc = tOcc.groupBy("b").agg(count(lit(1)).as("ct"))
        val rc = rOcc.groupBy("b").agg(count(lit(1)).as("cr"))
        val tTot = tOcc.agg(count(lit(1)).as("tt"))
        val rTot = rOcc.agg(count(lit(1)).as("rt"))
        val lr = rc.join(tc, Seq("b"), "left").crossJoin(tTot).crossJoin(rTot)
          .select(col("b"), round((log(coalesce(col("ct"), lit(0L)) + lit(1))
            - log(col("tt") + lit(256)) - log(col("cr") + lit(1))
            + log(col("rt") + lit(256))) * lit(10000)).cast("long").as("lr_e4"))
        rOcc.join(broadcast(lr), Seq("b")).groupBy("doc_id")
          .agg(count(lit(1)).as("n_bigrams"), sum("lr_e4").as("weight_e4"))
      }
      time("scored no-window")(noWindow.count())
      time("lr only")(occ(raw).groupBy("b").agg(count(lit(1)).as("cr"))
        .crossJoin(occ(target).agg(count(lit(1)).as("tt"))).count())
    }
    spark.stop()
  }
}
