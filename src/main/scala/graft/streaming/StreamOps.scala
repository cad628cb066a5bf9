package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful Structured-Streaming operators for the training-data
  * pipeline: the streaming twins of the batch operators in
  * `graft.operators` (sessionization, dedup, corpus stats), built the
  * Spark-first way — watermarks bound every state store, custom state
  * only where the built-in operators genuinely can't express the
  * semantics (`flatMapGroupsWithState` for gap sessionization).
  *
  * 100 TB design notes:
  *   - every operator REQUIRES a watermark: unbounded state is the
  *     streaming analogue of a driver-side collect — it works in the
  *     demo and dies in production. Session state is one small struct
  *     per OPEN session; dedup state is bounded by the watermark
  *     window; windowed aggs age out with the watermark.
  *   - state is keyed by the group column, so a 1000-executor cluster
  *     partitions it exactly like the equivalent batch shuffle.
  */
object StreamOps {

  /** One closed (or timed-out) session. */
  case class Session(
      user_id: Long, session_start: Timestamp, session_end: Timestamp,
      n_events: Long)

  /** One open session. Multiple can be open per user at once under
    * out-of-order arrival: an in-bound event older than every open
    * session's gap window opens an EARLIER session rather than folding
    * into one it doesn't belong to. The list is bounded by
    * watermark-window / gap sessions per user.
    */
  case class SessionState(startUs: Long, lastUs: Long, n: Long)

  /** Open-sessions state carried between micro-batches. NOTE: this
    * state schema replaced a single-session struct; a checkpointed
    * query from the earlier shape fails Spark's state-schema
    * compatibility check on restart and must restart fresh (or
    * backfill via the batch sessionizer) — the usual stateful-operator
    * upgrade contract.
    */
  case class SessionsState(open: Seq[SessionState])

  /** Gap-based streaming sessionization
    * (`flatMapGroupsWithState` + event-time timeout): a session closes
    * when `gap` passes with no event — emitted either when a LATER
    * session's existence proves the gap (the in-order fast path: no
    * waiting for the watermark), or when the WATERMARK passes the open
    * session's deadline (the timeout path, which a pure windowed-agg
    * formulation cannot express: it would hold the last session open
    * forever). Semantics match the batch
    * [[graft.operators.TimeSeries.sessionize]]: same gap rule, same
    * session bounds, so a replayed stream and a batch backfill agree
    * for IN-ORDER in-bound feeds (pinned by StreamOpsSpec). For
    * out-of-order in-bound arrival the state holds several open
    * sessions and an event joins (or bridges — merging neighbors) the
    * session(s) whose gap window covers it; the one stream/batch
    * divergence left is the eager fast path: a session emitted because
    * a later session proved its gap cannot retroactively absorb an
    * even-later out-of-order event that batch would have folded in.
    * Session bounds carry full microsecond precision.
    *
    * Input needs columns `userCol: long` and `tsCol: timestamp`;
    * `delayThreshold` is the out-of-orderness bound (watermark).
    */
  def sessionize(events: DataFrame, userCol: String, tsCol: String,
      gap: String, delayThreshold: String): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(gap))
    require(gapUs.months == 0 && gapUs.days == 0,
      "session gap must be a sub-day duration (hours/minutes/seconds)")
    val gapMicros = gapUs.microseconds

    // micros from a java.sql.Timestamp (getTime is ms; sub-ms lives in
    // the nanos field)
    def micros(t: Timestamp): Long =
      t.getTime * 1000 + (t.getNanos / 1000) % 1000

    // micros-preserving Timestamp: whole seconds in the millis field,
    // the full sub-second fraction in nanos
    def toTs(us: Long): Timestamp = {
      val t = new Timestamp(us / 1000000 * 1000)
      t.setNanos(((us % 1000000) * 1000).toInt)
      t
    }

    def fn(user: Long, rows: Iterator[(Long, Timestamp)],
        state: GroupState[SessionsState]): Iterator[Session] = {
      def toSession(s: SessionState): Session =
        Session(user, toTs(s.startUs), toTs(s.lastUs), s.n)
      val wmMs = state.getCurrentWatermarkMs()
      var open = state.getOption.map(_.open.toList).getOrElse(Nil)
      // batch arrival order is not event order — sort within the batch
      // (bounded by the micro-batch's rows for this user)
      val sorted = rows.map(r => micros(r._2)).toArray.sorted
      sorted.foreach { us =>
        // join every open session whose gap window covers the event; an
        // event bridging two sessions merges them, one covering none
        // opens a new session (possibly EARLIER than existing ones —
        // the out-of-order in-bound case)
        val (touching, rest) = open.partition(s =>
          us >= s.startUs - gapMicros && us <= s.lastUs + gapMicros)
        val merged = touching.foldLeft(SessionState(us, us, 1)) { (a, s) =>
          SessionState(math.min(a.startUs, s.startUs),
            math.max(a.lastUs, s.lastUs), a.n + s.n)
        }
        open = merged :: rest
      }
      // a session is final once its gap is proven: by a LATER open
      // session (in-order fast path — emit now, don't wait for the
      // watermark) or by the watermark passing its gap deadline (the
      // timeout path; also the only path for the last session)
      val maxStart = if (open.isEmpty) Long.MinValue
        else open.map(_.startUs).max
      val (done, live) = open.partition(s =>
        s.lastUs + gapMicros < maxStart ||
        s.lastUs / 1000 + gapMicros / 1000 < wmMs)
      if (live.isEmpty) state.remove()
      else {
        state.update(SessionsState(live.sortBy(_.startUs)))
        // earliest deadline wakes us first (clamped: Spark rejects
        // deadlines at or before the current watermark, which can
        // happen for late-but-in-bound rows whose gap already elapsed)
        val deadlineMs = live.map(s => s.lastUs / 1000 + gapMicros / 1000).min
        state.setTimeoutTimestamp(math.max(deadlineMs, wmMs + 1))
      }
      done.sortBy(_.startUs).map(toSession).iterator
    }

    // the watermark-tagged timestamp column must flow INTO the
    // stateful operator (projecting it away to raw micros would
    // discard the watermark and event-time timeouts with it)
    events
      .withWatermark(tsCol, delayThreshold)
      .select(col(userCol).cast("long"), col(tsCol))
      .as[(Long, Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** Streaming exact dedup with BOUNDED state: keeps one row per
    * distinct content hash, where the state store only remembers
    * hashes inside the watermark window
    * (`dropDuplicatesWithinWatermark`) — the streaming analogue of
    * [[graft.operators.Dedup.exactDedup]] under the (documented)
    * weaker contract that duplicates farther apart than the watermark
    * pass through: exactly the trade a 100 TB/day ingestion stream
    * must make, because remembering every hash forever is an unbounded
    * state store. Emits the input columns plus the `__content_hash`
    * used for identity.
    */
  def dedupExactStreaming(docs: DataFrame, textCol: String,
      tsCol: String, delayThreshold: String): DataFrame =
    docs
      .withColumn("__content_hash", md5(col(textCol)))
      .withWatermark(tsCol, delayThreshold)
      .dropDuplicatesWithinWatermark("__content_hash")

  /** Watermarked sliding-window corpus statistics: per window, the
    * document count, total whitespace tokens, and mean document
    * quality proxy (token count per doc) — the live dashboard over an
    * ingestion stream, and a pure built-in windowed aggregation (the
    * codegen'd tokenizer runs inside the stream's projection at scan
    * speed; state ages out with the watermark).
    */
  def windowedDocStats(docs: DataFrame, tsCol: String, textCol: String,
      windowDuration: String, slideDuration: String,
      delayThreshold: String): DataFrame =
    docs
      .withWatermark(tsCol, delayThreshold)
      .groupBy(window(col(tsCol), windowDuration, slideDuration))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(graft.operators.TextAnalysis.tokenCount(col(textCol)))
          .as("n_tokens"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("n_docs"), col("n_tokens"))

  /** Stream–stream temporal band join: every (left, right) pair with
    * |t_l − t_r| <= `widthSeconds`, as both sides ARRIVE — the live
    * twin of [[graft.operators.TimeSeries.bandJoin]] (same pair set,
    * pinned by StreamOpsSpec and gate q58).
    *
    * Built on Spark's watermarked stream–stream inner join, which
    * REQUIRES an equality predicate — a pure interval condition is
    * rejected at planning ("stream-stream join without equality
    * predicate is not supported"). The batch operator's
    * bucket-expansion supplies it: both sides are keyed by a
    * `width`-sized time cell (right side replicated into its cell ±1,
    * so every in-band pair shares the left row's cell exactly once),
    * and the join is cell-equality AND the exact band interval. The
    * equality keys the join state like any shuffle; the interval
    * bound + watermark let the engine EVICT — a buffered row stops
    * matching once the other side's watermark passes `t ± width`, so
    * state is bounded by (arrival skew + band width) × ingest rate,
    * never the stream's history (pinned via `numRowsTotal` by
    * StreamOpsSpec). Inner joins emit on match (no watermark wait);
    * rows later than `delayThreshold` may miss pairs, exactly the
    * built-in operator's contract.
    *
    * Column names must differ across sides (Spark's join condition
    * needs unambiguous refs): left carries `lIdCol`/`lTsCol`, right
    * `rIdCol`/`rTsCol`. Output: `lIdCol, rIdCol, l_ts_us, r_ts_us`.
    */
  def bandJoinStreaming(left: DataFrame, right: DataFrame,
      lIdCol: String, lTsCol: String, rIdCol: String, rTsCol: String,
      widthSeconds: Long, delayThreshold: String): DataFrame = {
    require(widthSeconds > 0, s"widthSeconds must be positive, got $widthSeconds")
    val w = widthSeconds * 1000000L
    val l = left.withWatermark(lTsCol, delayThreshold)
      .withColumn("__lcell", expr(s"unix_micros($lTsCol) div ${w}L"))
    val r = right.withWatermark(rTsCol, delayThreshold)
      .withColumn("__c0", expr(s"unix_micros($rTsCol) div ${w}L"))
      .withColumn("__rcell", explode(sequence(col("__c0") - 1, col("__c0") + 1)))
      .drop("__c0")
    l.join(r,
        col("__lcell") === col("__rcell") &&
          expr(s"$rTsCol >= $lTsCol - interval $widthSeconds seconds AND " +
            s"$rTsCol <= $lTsCol + interval $widthSeconds seconds"))
      .select(col(lIdCol), col(rIdCol),
        unix_micros(col(lTsCol)).as("l_ts_us"),
        unix_micros(col(rTsCol)).as("r_ts_us"))
  }

  /** Stream–stream LEFT OUTER equi+interval join — "every purchase,
    * with the errors that followed it within `windowSeconds`, OR a
    * null row if none ever did". The OUTER side is the semantics
    * Spark's inner join can't give: a left row's null result may only
    * emit once the watermark proves no matching right row can still
    * arrive, so state is bounded by (delay + window) × rate on both
    * sides and unmatched rows surface exactly once. `delayThreshold`
    * must exceed the window or in-flight partners could be evicted
    * before their match arrives.
    *
    * Output: `(l_id, r_id NULL-able, l_ts_us)`.
    */
  def leftOuterFollowupJoin(left: DataFrame, right: DataFrame,
      lIdCol: String, lKeyCol: String, lTsCol: String,
      rIdCol: String, rKeyCol: String, rTsCol: String,
      windowSeconds: Long, delayThreshold: String): DataFrame = {
    require(windowSeconds > 0, s"windowSeconds must be positive, got $windowSeconds")
    val l = left.withWatermark(lTsCol, delayThreshold)
    val r = right.withWatermark(rTsCol, delayThreshold)
    l.join(r,
        col(lKeyCol) === col(rKeyCol) &&
          expr(s"$rTsCol >= $lTsCol AND " +
            s"$rTsCol <= $lTsCol + interval $windowSeconds seconds"),
        "left_outer")
      .select(col(lIdCol), col(rIdCol),
        unix_micros(col(lTsCol)).as("l_ts_us"))
  }
}
