package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series operators over event streams: sessionization and as-of
  * (nearest-prior-event) joins.
  *
  * 100 TB design: both are single-shuffle window programs — partition
  * by the entity key, order within partition. The as-of join is the
  * union trick (mark sides, one window pass carrying the last right-side
  * id), which never builds a cross product and reuses one exchange; a
  * range/sort-merge formulation would shuffle both inputs anyway.
  * Skewed entities (one user with millions of events) are the usual
  * caveat — salt the key upstream if a single entity outgrows a
  * partition.
  */
object TimeSeries {

  /** Assign session ids per entity: a new session starts after a gap of
    * more than `gapSeconds` between consecutive events. Ordering and
    * gap math run on integer epoch-micros (engine-neutral; avoids
    * nanosecond-precision ambiguity). Appends `session_id` (1-based,
    * per entity).
    */
  def sessionize(df: DataFrame, entityCol: String, tsCol: String,
                 tieBreakCol: String, gapSeconds: Long): DataFrame = {
    val us = unix_micros(col(tsCol))
    val w = Window.partitionBy(col(entityCol)).orderBy(us, col(tieBreakCol))
    val prev = lag(us, 1).over(w)
    val newSession = when(prev.isNull || us - prev > gapSeconds * 1000000L, 1)
      .otherwise(0)
    df.withColumn("session_id",
      sum(newSession).over(w.rowsBetween(Window.unboundedPreceding, 0)))
  }

  /** As-of join: for each left row, the single right row with the same
    * key and the greatest timestamp <= the left row's timestamp
    * (classic "latest quote before the trade"). Inner semantics — left
    * rows with no prior right row are dropped. Right-side ties on
    * (key, ts) resolve to the largest `rightIdCol`.
    *
    * Output: key, left ts, leftIdCol, rightIdCol.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
               tsCol: String, leftIdCol: String, rightIdCol: String): DataFrame = {
    val rIdType = right.schema(rightIdCol).dataType
    val lIdType = left.schema(leftIdCol).dataType
    val l = left.select(col(keyCol), unix_micros(col(tsCol)).as("__us"),
      col(leftIdCol).as("__lid"), lit(null).cast(rIdType).as("__rid"),
      lit(1).as("__side"))
    val r = right.select(col(keyCol), unix_micros(col(tsCol)).as("__us"),
      lit(null).cast(lIdType).as("__lid"), col(rightIdCol).as("__rid"),
      lit(0).as("__side"))
    // order: time, then right-before-left at equal time (>= semantics),
    // then right id so `last` picks the largest on exact ties
    val w = Window.partitionBy(keyCol)
      .orderBy(col("__us"), col("__side"), col("__rid"))
      .rowsBetween(Window.unboundedPreceding, 0)
    l.unionByName(r)
      .withColumn("__match", last(col("__rid"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1 && col("__match").isNotNull)
      .select(col(keyCol), col("__us").as("ts_us"),
        col("__lid").as(leftIdCol), col("__match").as(rightIdCol))
  }

  /** Regular-grid resampling with forward fill: one output row per
    * (key, grid tick) between each key's first and last observation,
    * ticks at multiples of `stepMicros`, each carrying the latest
    * observed value at or before the tick — the standard
    * irregular-to-regular series conversion (dashboarding, feature
    * grids, gap-filling before window math). Multiple observations in
    * one microsecond collapse to their max value, so the fill is
    * deterministic on any engine.
    *
    * Scale shape: the grid is generated per key from a 1-row-per-key
    * bounds aggregate (never materialized corpus-wide), and the fill
    * is the same single-shuffle union trick as [[asofJoin]] — one
    * window over (key, time), no join explosion. Output: key,
    * `tick_us` (epoch micros), `valueCol`.
    */
  def resampleFfill(df: DataFrame, keyCol: String, tsCol: String,
                    valueCol: String, stepMicros: Long): DataFrame = {
    require(stepMicros > 0, s"stepMicros must be positive, got $stepMicros")
    val vType = df.schema(valueCol).dataType
    val obs = df.select(col(keyCol), unix_micros(col(tsCol)).as("__us"),
      col(valueCol))
    val dedup = obs.groupBy(col(keyCol), col("__us"))
      .agg(max(col(valueCol)).as("__v"))
    val bounds = dedup.groupBy(keyCol)
      .agg(min(col("__us")).as("__lo"), max(col("__us")).as("__hi"))
    // integer ceil to the next tick: `div` is integer division (the
    // SQL mirror uses // — identical for the positive epoch domain).
    // Keys whose span contains no tick are dropped BEFORE the
    // sequence: Spark's sequence(start, stop) throws on start > stop
    // (DuckDB's range returns empty) — one sub-step key would
    // otherwise kill the whole job.
    val firstTick = expr(
      s"((__lo + ${stepMicros - 1}L) div ${stepMicros}L) * ${stepMicros}L")
    val grid = bounds
      .withColumn("__first", firstTick)
      .filter(col("__first") <= col("__hi"))
      .select(col(keyCol),
        explode(sequence(col("__first"), col("__hi"), lit(stepMicros))).as("__us"))
    val g = grid.select(col(keyCol), col("__us"),
      lit(null).cast(vType).as("__v"), lit(1).as("__side"))
    val o = dedup.select(col(keyCol), col("__us"), col("__v"), lit(0).as("__side"))
    val w = Window.partitionBy(keyCol)
      .orderBy(col("__us"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    g.unionByName(o)
      .withColumn("__fill", last(col("__v"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1 && col("__fill").isNotNull)
      .select(col(keyCol), col("__us").as("tick_us"), col("__fill").as(valueCol))
  }

  /** Temporal band join: every (left, right) pair whose timestamps are
    * within `widthSeconds` of each other (|t_l − t_r| <= width), with
    * NO equi-key — the cross-entity correlation join ("errors near a
    * purchase") that Spark's planner would otherwise execute as a
    * broadcast-nested-loop or cartesian product, both O(|L|·|R|)
    * walls at scale.
    *
    * Shape: bucketize time into `width`-sized cells. Each left row
    * lands in its own cell; each right row is replicated into its cell
    * and both neighbors (3× — any pair within `width` shares a cell
    * under this scheme, and each qualifying pair meets in EXACTLY one
    * cell, the left row's, so no post-join dedup). The join is then a
    * plain equi-join on the cell — hash-partitioned, shuffle-once per
    * side, no cross product (plan-asserted by TimeSeriesSpec) — with
    * the exact band predicate as a cheap post-filter. Cost scales with
    * true pair density per cell, not |L|·|R|; a pathological cell
    * (everything in one time window) is the usual skew caveat — widen
    * to a composite key or salt upstream if one window holds the
    * corpus.
    *
    * Output: all left columns plus `rightIdCol` and `rightTsCol`
    * renamed with a `matched_` prefix.
    */
  def bandJoin(left: DataFrame, right: DataFrame, tsCol: String,
               rightIdCol: String, widthSeconds: Long): DataFrame = {
    require(widthSeconds > 0, s"widthSeconds must be positive, got $widthSeconds")
    val w = widthSeconds * 1000000L
    // `div` = exact integer division (Column `/` is double division —
    // a rounding hazard at epoch-micro magnitudes near cell edges)
    val l = left
      .withColumn("__lus", unix_micros(col(tsCol)))
      .withColumn("__cell", expr(s"__lus div ${w}L"))
    val r = right.select(col(rightIdCol).as("matched_" + rightIdCol),
        unix_micros(col(tsCol)).as("__rus"))
      .withColumn("__c0", expr(s"__rus div ${w}L"))
      .withColumn("__cell", explode(sequence(col("__c0") - 1, col("__c0") + 1)))
      .drop("__c0")
    l.join(r, Seq("__cell"))
      .filter(abs(col("__lus") - col("__rus")) <= w)
      .withColumn("matched_ts_us", col("__rus"))
      .drop("__cell", "__lus", "__rus")
  }
}
