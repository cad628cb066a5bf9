package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Resampling semantics (sessionize/asof are oracle-gated by
  * q20/q21; the grid math here needs unit pinning).
  */
class TimeSeriesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(us: Long) = timestamp_micros(lit(us))

  test("resampleFfill: ticks at step multiples, gaps forward-filled") {
    // key a: observations at 5, 25, 47 (values 1, 2, 3); step 10
    // ticks: 10, 20, 30, 40 → fill 1, 1, 2, 2
    val df = Seq((1L, 5L, 1.0), (1L, 25L, 2.0), (1L, 47L, 3.0))
      .toDF("k", "us", "v")
      .select(col("k"), timestamp_micros(col("us")).as("t"), col("v"))
    val out = TimeSeries.resampleFfill(df, "k", "t", "v", stepMicros = 10L)
      .orderBy("tick_us").collect()
      .map(r => (r.getLong(1), r.getDouble(2))).toList
    assert(out == List((10L, 1.0), (20L, 1.0), (30L, 2.0), (40L, 2.0)))
  }

  test("resampleFfill: first observation ON a tick is included; dup micros take max") {
    val df = Seq((1L, 10L, 1.0), (1L, 10L, 9.0), (1L, 30L, 2.0))
      .toDF("k", "us", "v")
      .select(col("k"), timestamp_micros(col("us")).as("t"), col("v"))
    val out = TimeSeries.resampleFfill(df, "k", "t", "v", stepMicros = 10L)
      .orderBy("tick_us").collect()
      .map(r => (r.getLong(1), r.getDouble(2))).toList
    // lo=10 is already a tick; duplicate at us=10 collapses to max 9.0
    assert(out == List((10L, 9.0), (20L, 9.0), (30L, 2.0)))
  }

  test("resampleFfill: keys are independent; single-point keys may yield no ticks") {
    val df = Seq((1L, 10L, 1.0), (1L, 22L, 2.0), (2L, 7L, 5.0))
      .toDF("k", "us", "v")
      .select(col("k"), timestamp_micros(col("us")).as("t"), col("v"))
    val out = TimeSeries.resampleFfill(df, "k", "t", "v", stepMicros = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // key 2 spans [7, 7]: first tick 10 > hi → no rows
    assert(out == Set((1L, 10L, 1.0), (1L, 20L, 1.0)))
  }

  test("bandJoin: matches the brute-force |Δt| <= width pair set, each pair once") {
    // deterministic pseudo-random times across ~40 width-cells so
    // pairs straddle cell boundaries in both directions
    val lt = (0 until 120).map(i => (i.toLong, (i * 7919L * 31L) % 4000L))
    val rt = (0 until 150).map(j => (j.toLong + 1000L, (j * 104729L * 17L) % 4000L))
    val width = 100L // seconds; times above are seconds too
    val left = lt.toDF("lid", "s")
      .select(col("lid"), timestamp_micros(col("s") * 1000000L).as("ts"))
    val right = rt.toDF("event_id", "s")
      .select(col("event_id"), timestamp_micros(col("s") * 1000000L).as("ts"))
    val got = TimeSeries.bandJoin(left, right, "ts", "event_id", width)
      .select("lid", "matched_event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toList
    val expect = for {
      (l, ls) <- lt; (r, rs) <- rt if math.abs(ls - rs) <= width
    } yield (l, r)
    // list-vs-set equality also proves no pair is emitted twice
    assert(got.size == expect.size, s"${got.size} vs ${expect.size}")
    assert(got.toSet == expect.toSet)
  }

  test("bandJoin: plans as an equi-join on the cell, no cross product") {
    val df = (0 until 50).map(i => (i.toLong, i * 1000000L)).toDF("event_id", "us")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"))
    val plan = TimeSeries.bandJoin(df, df, "ts", "event_id", 60L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
