package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dev CLI: per-JOB wall-clock breakdown of ONE registered query —
  * where a multi-action gate (vintage creates, merges, streaming
  * drains) actually spends its time. A SparkListener records every
  * job's duration + call site; the report also prints the GAPS between
  * consecutive jobs (driver-side work: planning, commit protocol, file
  * IO) which job timings alone hide. Guide §1: measure first.
  *
  * Usage: runMain graft.tools.JobProfile <queryName> [sfDir] [cpus]
  * Runs the query twice; the report covers the SECOND (warm) run.
  */
object JobProfile {
  private case class Job(id: Int, start: Long, var end: Long, site: String)

  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 2) args(2) else sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions",
        "graft.vintage.connector.VintageSqlExtension")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach(profileOne(spark, _, sfDir))
    spark.stop()
  }

  private def profileOne(spark: SparkSession, name: String, sfDir: String): Unit = {
    val fn = SparkEntry.queries(name)

    val w0 = System.nanoTime()
    fn(spark, sfDir).count() // warm-up: classloading, codegen, JIT
    val warmSec = (System.nanoTime() - w0) / 1e9

    val jobs = mutable.ArrayBuffer.empty[Job]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs.synchronized {
        val props = Option(e.properties)
        val desc = props.flatMap(p => Option(p.getProperty("spark.job.description")))
        val site = desc
          .orElse(props.flatMap(p => Option(p.getProperty("callSite.short"))))
          .orElse(e.stageInfos.lastOption.map(_.name))
          .getOrElse("?")
        jobs += Job(e.jobId, e.time, -1L, site)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.find(_.id == e.jobId).foreach(_.end = e.time)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0ms = System.currentTimeMillis()
    val t0 = System.nanoTime()
    fn(spark, sfDir).count()
    val totalSec = (System.nanoTime() - t0) / 1e9
    spark.sparkContext.removeSparkListener(listener)
    // listener bus is async; give tail events a moment
    Thread.sleep(300)

    val done = jobs.synchronized(jobs.filter(_.end > 0).sortBy(_.start).toVector)
    println(f"== $name warm=$warmSec%.2fs measured=$totalSec%.2fs jobs=${done.size}")
    println("timeline (offset_ms dur_ms gap_before_ms site):")
    var prevEnd = t0ms
    done.foreach { j =>
      val gap = j.start - prevEnd
      println(f"  +${j.start - t0ms}%6d ${j.end - j.start}%6d gap=${gap}%5d  ${j.site}")
      prevEnd = math.max(prevEnd, j.end)
    }
    val jobSum = done.map(j => j.end - j.start).sum / 1000.0
    println(f"job_time_sum=$jobSum%.2fs driver_gaps=${totalSec - jobSum}%.2fs")
    println("by_site_totals:")
    done.groupBy(_.site).map { case (s, js) =>
      (js.map(j => j.end - j.start).sum, js.size, s)
    }.toSeq.sortBy(-_._1).foreach { case (ms, n, s) =>
      println(f"  ${ms}%6d ms  n=$n%-3d $s")
    }
  }
}
