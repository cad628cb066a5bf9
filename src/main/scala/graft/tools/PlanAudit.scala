package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan-shape audit over many registered queries in ONE session: per
  * query, the Exchange count, join strategies, any cartesian product,
  * and the scan lines (PushedFilters / ReadSchema) of the FINAL frame's
  * formatted plan — the guide §7.2 checklist, greppable in bulk for
  * the sub-second tail where a per-query Explain run is too slow.
  * Usage: runMain graft.tools.PlanAudit <q1,q2,..|all> [sfDir]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val names =
      if (args.isEmpty || args(0) == "all") graft.SparkEntry.queries.keys.toSeq.sorted
      else args(0).split(",").toSeq
    val sf = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions",
        "graft.vintage.connector.VintageSqlExtension")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      try {
        val df = graft.SparkEntry.queries(name)(spark, sf)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val lines = plan.linesIterator.toSeq
        def c(p: String) = lines.count(_.contains(p))
        val joins = Seq("SortMergeJoin", "BroadcastHashJoin",
          "ShuffledHashJoin", "BroadcastNestedLoopJoin", "CartesianProduct")
          .map(j => s"$j=${c(j)}").filter(!_.endsWith("=0"))
        val codegenIds = lines.flatMap(l =>
          "\\[codegen id : (\\d+)\\]".r.findAllMatchIn(l).map(_.group(1)))
          .distinct.size
        println(s"AUDIT $name exchanges=${c("Exchange")} " +
          s"codegenSpans=$codegenIds ${joins.mkString(" ")}")
        lines.filter(l => l.contains("PushedFilters") || l.contains("CartesianProduct"))
          .take(8).foreach(l => println(s"  $name: ${l.trim.take(160)}"))
      } catch { case e: Throwable =>
        println(s"AUDIT $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
