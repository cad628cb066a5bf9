package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dev CLI: time ONE registered query N times (count() as the action)
  * and print per-run wall seconds — the profiling inner loop.
  * Usage: runMain graft.tools.TimeOne <queryName> [sfDir] [runs]
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.extensions",
        "graft.vintage.connector.VintageSqlExtension")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    for (i <- 1 to runs) {
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
