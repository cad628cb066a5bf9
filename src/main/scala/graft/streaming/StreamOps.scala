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

  /** Open-session state carried between micro-batches. */
  case class SessionState(startUs: Long, lastUs: Long, n: Long)

  /** Gap-based streaming sessionization
    * (`flatMapGroupsWithState` + event-time timeout): a session closes
    * when `gap` passes with no event — emitted either when a later
    * event proves the gap, or when the WATERMARK passes the open
    * session's deadline (the timeout path, which a pure windowed-agg
    * formulation cannot express: it would hold the last session open
    * forever). Semantics match the batch
    * [[graft.operators.TimeSeries.sessionize]]: same gap rule, same
    * session bounds, so a replayed stream and a batch backfill agree
    * (pinned by StreamOpsSpec).
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

    def fn(user: Long, rows: Iterator[(Long, Timestamp)],
        state: GroupState[SessionState]): Iterator[Session] = {
      def toSession(s: SessionState): Session = Session(user,
        new Timestamp(s.startUs / 1000),
        new Timestamp(s.lastUs / 1000), s.n)
      if (rows.isEmpty && state.hasTimedOut) {
        // watermark passed start-of-gap: the open session is final
        val out = state.getOption.map(toSession).toIterator
        state.remove()
        return out
      }
      // batch arrival order is not event order — sort within the batch
      // (bounded by the micro-batch's rows for this user)
      val sorted = rows.map(r => micros(r._2)).toArray.sorted
      var cur = state.getOption.orNull
      val closed = Seq.newBuilder[Session]
      sorted.foreach { us =>
        cur match {
          case null => cur = SessionState(us, us, 1)
          case s if us - s.lastUs <= gapMicros =>
            // extend (late rows inside the gap fold in; the watermark
            // bounds how late)
            cur = SessionState(math.min(s.startUs, us), math.max(s.lastUs, us),
              s.n + 1)
          case s =>
            closed += toSession(s)
            cur = SessionState(us, us, 1)
        }
      }
      state.update(cur)
      // the open session becomes final when the watermark passes its
      // gap deadline (clamped: Spark rejects deadlines at or before
      // the current watermark, which can happen for late-but-in-bound
      // rows whose gap already elapsed)
      val deadlineMs = cur.lastUs / 1000 + gapMicros / 1000
      state.setTimeoutTimestamp(
        math.max(deadlineMs, state.getCurrentWatermarkMs() + 1))
      closed.result().iterator
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
}
