package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dev CLI: run ONE registered gate query and dump it to parquet —
  * the fast inner loop for iterating on a query before the full
  * `graft.Verify` sweep. Usage:
  * runMain graft.tools.RunOne <queryName> [sfDir] [outDir]
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val outDir = if (args.length > 2) args(2) else "/tmp/runone"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.extensions",
        "graft.vintage.connector.VintageSqlExtension")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query $name; known: ${SparkEntry.queries.keys.mkString(", ")}"))
    val df = fn(spark, sfDir)
    df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    df.show(5, truncate = 60)
    println(s"rows=${spark.read.parquet(s"$outDir/$name").count()}")
    spark.stop()
  }
}
