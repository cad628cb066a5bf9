package graft
import org.apache.spark.sql.SparkSession
/** Benchmark main: times every SparkEntry query at SPARK_GRAFT_SF_DIR
  * and prints one JSON line. Failures are recorded explicitly (negative
  * time + "failed" list) — a broken query must never read as a fast
  * green number.
  *
  * Self-evidencing harness (round-6): each query runs TWICE and the
  * reported number is the MIN of the two — a single-shot time can't
  * distinguish a plan regression from a JIT/GC/sandbox hiccup, a
  * best-of-2 mostly can (a real regression reproduces in both runs).
  * Both raw runs land in the file output for post-hoc inspection. The
  * printed line keeps values at millisecond precision so it stays well
  * under log-tail truncation caps.
  *
  * Comparability note: rounds 1-5 reported single-shot times; round 6
  * onward reports best-of-2 (the `mode` field names the harness).
  * Cross-round comparisons are only like-for-like from round 6 → 7
  * onward — BENCH_r06.json (23.2 s total at sf0.1) is the operative
  * best-of-2 baseline.
  */
object Bench {
  private def r3(v: Double): Double = math.rint(v * 1000) / 1000
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions",
        "graft.vintage.connector.VintageSqlExtension")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warmup outside the timed region so the first queries
    // don't absorb classloading + codegen compilation costs. Half the
    // suite is regex/array/text-dominated, so the warmup must touch
    // those code paths too, not just integer aggregation.
    spark.range(1000000).selectExpr("sum(id % 7)", "count(distinct id % 13)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    spark.read.parquet(s"$sfDir/documents.parquet").limit(64)
      .selectExpr(
        "sum(size(filter(split(lower(trim(text)), '\\\\s+'), t -> t != '')))",
        "sum(size(regexp_extract_all(text, '[A-Za-z]+', 0)))",
        "count(distinct md5(text))")
      .collect()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      def once(): (Double, Boolean) = {
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).count(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false
          }
        ((System.nanoTime() - t0) / 1e9, ok)
      }
      val (t1, ok1) = once()
      // don't pay a second multi-second run for a query that failed
      val (t2, ok2) = if (ok1) once() else (t1, ok1)
      (name, math.min(t1, t2), Seq(t1, t2), ok1 && ok2)
    }
    val qs = results.map { case (k, v, _, ok) =>
      s"\"" + k + "\":" + (if (ok) r3(v) else -r3(v))
    }.mkString("{", ",", "}")
    val failed = results.collect { case (k, _, _, false) => s"\"$k\"" }
      .mkString("[", ",", "]")
    val total = r3(results.collect { case (_, v, _, true) => v }.sum)
    val json = s"""{"metric":"total","value":$total,"unit":"sec","mode":"best_of_2","queries":$qs,"failed":$failed,"sf":"$sfDir"}"""
    println(json)
    // also drop the JSON to a file (with both raw runs per query): the
    // driver tails stdout through sbt's [info] prefixing, which is
    // fragile to parse and caps the tail length
    val runs = results.map { case (k, _, rs, _) =>
      s"\"" + k + "\":" + rs.map(r3).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val fileJson = json.dropRight(1) + s""","runs":$runs}"""
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
        "/tmp/graft_bench.json")), fileJson + "\n")
    catch { case _: java.io.IOException => () }
    if (results.exists(!_._4)) { spark.stop(); sys.exit(1) }
    spark.stop()
  }
}
