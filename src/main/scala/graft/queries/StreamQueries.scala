package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.vintage.{RowTracking, VintageTable}

/** Driver-gate query for the STREAMING surface: a vintage-to-vintage
  * Structured Streaming pipeline whose exactly-once guarantees and
  * downstream CDF classification are hash-pinned against a DuckDB
  * replay of the equivalent batch state.
  *
  * Choreography:
  *  1. source table = nation `(name, rkey)` (v0);
  *  2. stream source → sink (fresh checkpoint), drain, STOP;
  *  3. append region rows (rkey offset +100) to the source, RESTART
  *     the stream from the same checkpoint, drain — only the new
  *     commit may land (a replayed batch would double the nation
  *     rows and break the hash);
  *  4. restart once more with nothing to read — the sink version must
  *     not advance (the per-epoch txn watermark), reported as a
  *     `meta` row the oracle expects to be exactly
  *     `noop_restart_delta=0`;
  *  5. fluent UPDATE on the ROW-TRACKED sink; the change feed of that
  *     one commit must classify as `update_preimage`/`update_postimage`
  *     via the stable row ids that survived the streaming writes.
  *
  * Everything hashed is deterministic: single-partition sorted writes,
  * no ids or versions in the output, names and keys only.
  */
object StreamQueries {

  /** Run a streaming choreography with the shuffle-partition count
    * sized to its STATE, not the session default: every micro-batch
    * pays a per-partition state-store open/commit, so a fixture-sized
    * stateful query at the session's 32 partitions spends its whole
    * budget on empty state files. The session value is restored before
    * the returned (lazy) result frame executes — only the streaming
    * epochs run narrow. At 100 TB the same dial turns the other way:
    * size `spark.sql.shuffle.partitions` to state volume per query.
    *
    * The state store is RocksDB (Spark 4 ships rocksdbjni) with
    * changelog checkpointing: at scale it keeps state off-heap and
    * uploads per-commit DELTAS instead of rewriting HDFS-backed
    * snapshot files — O(changed) not O(state) per micro-batch. On
    * these fixture-sized gates the provider choice is measured noise
    * (best-of-2 tier sums on one box: HDFS 22.9 s, RocksDB 23.1 s,
    * RocksDB+changelog 24.2 s — the fixed cost is micro-batch/commit
    * machinery, not state IO; full A/B in BASELINE.md), so the
    * scale-correct provider costs nothing here. State CONTENT is
    * provider-independent — the gate hashes are unchanged.
    */
  private def withStatePartitions[T](spark: SparkSession, n: Int,
      noDataBatches: Boolean = true)(body: => T): T = {
    val keys = Seq(
      "spark.sql.shuffle.partitions" -> n.toString,
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
      // changelog checkpointing: each commit uploads the delta, not a
      // full snapshot — the difference between O(state) and O(changed)
      // per micro-batch once state is GBs per partition
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" -> "true",
      // metrics-only: maintaining numRowsTotal costs a RocksDB get()
      // per put/delete — the documented knob for update-heavy state
      // (the metric reads -1; nothing the gates hash depends on it)
      "spark.sql.streaming.stateStore.rocksdb.trackTotalNumberOfRows" -> "false",
      "spark.sql.streaming.minBatchesToRetain" -> "2",
      // No-data micro-batches exist to emit results that only a
      // watermark advance can release (stream-stream OUTER rows,
      // operator timeouts) when no further data batch would do it.
      // Each one is a FULL micro-batch — planning + WAL + a state-store
      // open/commit per partition per operator (StreamProfile r19:
      // 600–850 ms here with ZERO input rows, on any cluster a real
      // per-batch cluster cost) — and the gates that flush via
      // far-future SENTINEL DATA batches (watermark advance is applied
      // in the NEXT batch; timeouts and outer-row eviction run in data
      // batches too) get the identical output without them. Gates that
      // DO rely on a trailing watermark-only batch keep the default.
      "spark.sql.streaming.noDataMicroBatches.enabled" -> noDataBatches.toString)
    val prev = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  def q48StreamExactlyOnce(spark: SparkSession, d: String): DataFrame =
    withStatePartitions(spark, 4)(q48Body(spark, d))

  private def q48Body(spark: SparkSession, d: String): DataFrame = {
    val base = Files.createTempDirectory("graft-q48").toString
    val src = s"$base/src"
    val dst = s"$base/dst"
    val cp = s"$base/cp"

    val srcT = VintageTable.create(spark, src,
      Tables.nation(spark, d)
        .select(col("n_name").as("name"),
          col("n_regionkey").cast("long").as("rkey"), col("n_nationkey"))
        .repartition(1).sortWithinPartitions("n_nationkey")
        .drop("n_nationkey"))
    // the sink is pre-created EMPTY with row tracking on: ids are
    // assigned to the streamed rows at their epoch commits, which is
    // what lets step 5's update classify
    VintageTable.create(spark, dst, srcT.toDF.limit(0),
      properties = Map(RowTracking.EnabledProp -> "true"))

    def drainOnce(): Unit = {
      val q = spark.readStream.format("vintage").load(src)
        .writeStream.format("vintage")
        .option("path", dst).option("checkpointLocation", cp)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    drainOnce()                                  // nation snapshot epoch
    srcT.append(Tables.region(spark, d)
      .select(concat(lit("R_"), col("r_name")).as("name"),
        (col("r_regionkey").cast("long") + 100L).as("rkey"))
      .repartition(1).sortWithinPartitions("rkey"))
    drainOnce()                                  // region append epoch only
    val dstT = VintageTable.forPath(spark, dst)
    val vDrained = dstT.version
    drainOnce()                                  // nothing new: no commit
    val idleDelta = VintageTable.forPath(spark, dst).version - vDrained

    dstT.update(col("rkey") === 3L,
      Map("name" -> concat(col("name"), lit("_u"))))
    val chg = dstT.changes(vDrained + idleDelta)
      .select(lit("chg").as("part"),
        concat(col("name"), lit(":"), col("_change_type")).as("name"),
        col("rkey"))
    val state = dstT.toDF
      .select(lit("state").as("part"), col("name"), col("rkey"))
    val meta = spark.range(1)
      .select(lit("meta").as("part"),
        concat(lit("noop_restart_delta="), lit(idleDelta)).as("name"),
        lit(0L).as("rkey"))
    state.unionByName(chg).unionByName(meta)
      .orderBy("part", "name", "rkey")
  }

  /** DuckDB replay: the exactly-once stream lands each source row
    * exactly once, so the final state is just nation ∪ region with the
    * update applied; the one update commit's feed is its before and
    * after images of the rkey=3 rows; the idle restart must have
    * committed nothing.
    */
  /** Gate query for the STATEFUL streaming tier: the gap sessionizer
    * (`flatMapGroupsWithState`, event-time timeout) replayed over real
    * `events` rows fed through a memory source in event-time order,
    * hash-pinned against a DuckDB batch sessionization of the same
    * subset — the stream/batch equivalence contract
    * ([[graft.streaming.StreamOps.sessionize]]) on the oracle gate
    * instead of only a unit spec.
    *
    * Feed: a deterministic 1-in-20-users subset (~5% of events; 519
    * rows at sf0.01), collected ONLY as the memory-source fixture —
    * the production path is `readStream`, this bounded collect is the
    * gate's replay harness, not the operator. Fed in event-time order
    * across 5 micro-batches (the in-order regime where stream ==
    * batch exactly — enough boundaries to exercise cross-batch session
    * state without paying a per-batch state-store fixed cost ×10); two
    * far-future sentinel batches advance the watermark so every real
    * session times out and emits.
    */
  def q50StreamSessionize(spark: SparkSession, d: String): DataFrame =
    // no-data batches off: every timeout this gate needs fires inside
    // the two sentinel DATA batches (sentinel 1 advances the watermark,
    // sentinel 2 processes the expired groups) — that two-batch design
    // predates this conf and never relied on watermark-only batches
    withStatePartitions(spark, 4, noDataBatches = false)(q50Body(spark, d))

  private def q50Body(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    def micros(t: Timestamp): Long = t.getTime * 1000 + (t.getNanos / 1000) % 1000
    val feed = Tables.events(spark, d)
      .filter(col("user_id") % 20 === 0)
      .select(col("user_id").cast("long"), col("ts"))
      .as[(Long, Timestamp)]
      .collect()
      .sortBy(r => (micros(r._2), r._1))
    require(feed.nonEmpty, s"no events with user_id % 20 = 0 under $d")

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val sessions = graft.streaming.StreamOps.sessionize(
      mem.toDF.toDF("user_id", "ts"), "user_id", "ts",
      gap = "30 minutes", delayThreshold = "1 minute")
    val sink = "q50_sessions_" +
      java.util.UUID.randomUUID().toString.replace("-", "").take(8)
    val q = sessions.writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    try {
      val batchSize = feed.length / 5 + 1
      feed.grouped(batchSize).foreach { g =>
        mem.addData(g.toSeq: _*); q.processAllAvailable()
      }
      // sentinel user -1 far past every real deadline; the second
      // batch runs with the advanced watermark so timeouts fire
      val far = new Timestamp((micros(feed.last._2) / 1000) + 90L * 24 * 3600 * 1000)
      mem.addData((-1L, far)); q.processAllAvailable()
      mem.addData((-1L, far)); q.processAllAvailable()
    } finally q.stop()

    spark.table(sink)
      .filter(col("user_id") >= 0)
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"))
      .orderBy("user_id", "session_start")
  }

  /** Gate query for streaming exact dedup
    * ([[graft.streaming.StreamOps.dedupExactStreaming]] —
    * `dropDuplicatesWithinWatermark` over a content hash): the same
    * 1-in-20-users event subset, keyed by `event_type:user_id` (real
    * duplicates: every user repeats event types), streamed through a
    * memory source in 3 event-time-ordered micro-batches. The
    * watermark delay exceeds the whole event span, so the state never
    * evicts mid-feed and the output must be EXACTLY the distinct key
    * set — a key emitted twice (broken cross-batch state) or never
    * (overeager dedup) breaks the hash. Bounded-state eviction under a
    * short watermark is pinned separately by StreamOpsSpec; survivor
    * choice among same-key rows is shuffle-order-dependent, so the
    * gate pins the key set, not a survivor attribute. Three
    * micro-batches: dedup needs cross-batch boundaries, and each batch
    * pays a fixed state-store cost the gate should not multiply.
    */
  def q52StreamDedup(spark: SparkSession, d: String): DataFrame =
    // no-data batches off: dropDuplicatesWithinWatermark emits each
    // first-seen key in its DATA batch; watermark-only batches can only
    // evict state, and the 400-day delay means nothing evicts mid-feed
    withStatePartitions(spark, 4, noDataBatches = false)(q52Body(spark, d))

  private def q52Body(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    def micros(t: Timestamp): Long = t.getTime * 1000 + (t.getNanos / 1000) % 1000
    val feed = Tables.events(spark, d)
      .filter(col("user_id") % 20 === 0)
      .select(concat(col("event_type"), lit(":"), col("user_id")).as("text"),
        col("ts"))
      .as[(String, Timestamp)]
      .collect()
      .sortBy(r => (micros(r._2), r._1))
    require(feed.nonEmpty, s"no events with user_id % 20 = 0 under $d")

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp)]
    val deduped = graft.streaming.StreamOps.dedupExactStreaming(
      mem.toDF.toDF("text", "ts"), "text", "ts",
      delayThreshold = "400 days")
    val sink = "q52_dedup_" +
      java.util.UUID.randomUUID().toString.replace("-", "").take(8)
    val q = deduped.writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    try {
      val batchSize = feed.length / 3 + 1
      feed.grouped(batchSize).foreach { g =>
        mem.addData(g.toSeq: _*); q.processAllAvailable()
      }
    } finally q.stop()

    spark.table(sink).select(col("text")).orderBy("text")
  }

  /** The exactly-once distinct key set the stream must land. */
  val q52Sql: String =
    """SELECT DISTINCT event_type || ':' || CAST(user_id AS VARCHAR) AS text
      |FROM events WHERE user_id % 20 = 0
      |ORDER BY text""".stripMargin

  /** DuckDB batch sessionization of the identical subset: same 30-min
    * gap rule (strict `>` on the micros delta — equal-to-gap joins, as
    * the stream's inclusive window does), sessions rebuilt with the
    * classic lag/cumsum idiom, bounds re-materialized from micros.
    */
  val q50Sql: String =
    """WITH e AS (
      |  SELECT user_id, epoch_us(ts) AS us FROM events WHERE user_id % 20 = 0
      |),
      |l AS (
      |  SELECT user_id, us,
      |    lag(us) OVER (PARTITION BY user_id ORDER BY us) AS prev
      |  FROM e
      |),
      |n AS (
      |  SELECT user_id, us,
      |    CASE WHEN prev IS NULL OR us - prev > 1800000000 THEN 1 ELSE 0 END AS ns
      |  FROM l
      |),
      |s AS (
      |  SELECT user_id, us,
      |    sum(ns) OVER (PARTITION BY user_id ORDER BY us
      |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM n
      |)
      |SELECT user_id,
      |  make_timestamp(min(us)) AS session_start,
      |  make_timestamp(max(us)) AS session_end,
      |  count(*) AS n_events
      |FROM s GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin

  /** Gate query for the stream–stream temporal band join
    * ([[graft.streaming.StreamOps.bandJoinStreaming]]): purchases and
    * errors from the 1-in-3-users event subset replayed as TWO live
    * streams fed in event-time lockstep (4 micro-batch rounds), joined
    * on |Δt| <= 600 s with a generous watermark (nothing in the replay
    * is late, so the emitted pair set must be EXACTLY the batch band
    * join's — the stream/batch equivalence contract; state eviction
    * under a tight watermark is pinned by StreamOpsSpec instead).
    * Pairs then roll up per purchase exactly like batch gate q57, and
    * the DuckDB oracle recomputes the whole thing as one SQL join.
    */
  def q58StreamBandJoin(spark: SparkSession, d: String): DataFrame =
    // no-data batches off: a stream-stream INNER join emits pairs in
    // the DATA batch where both sides are present; watermark-only
    // batches evict already-unmatchable state and emit nothing
    withStatePartitions(spark, 4, noDataBatches = false)(q58Body(spark, d))

  private def q58Body(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    def micros(t: Timestamp): Long = t.getTime * 1000 + (t.getNanos / 1000) % 1000
    val feed = Tables.events(spark, d)
      .filter(col("user_id") % 3 === 0 &&
        col("event_type").isin("purchase", "error"))
      .select(col("event_type"), col("event_id"), col("ts"))
      .as[(String, Long, Timestamp)]
      .collect()
      .sortBy(r => (micros(r._3), r._2))
    require(feed.nonEmpty, s"no purchase/error events with user_id % 3 = 0 under $d")

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val pMem = MemoryStream[(Long, Timestamp)]
    val eMem = MemoryStream[(Long, Timestamp)]
    val joined = graft.streaming.StreamOps.bandJoinStreaming(
      pMem.toDF.toDF("p_id", "p_ts"), eMem.toDF.toDF("e_id", "e_ts"),
      "p_id", "p_ts", "e_id", "e_ts",
      widthSeconds = 600, delayThreshold = "40 days")
    val sink = "q58_band_" +
      java.util.UUID.randomUUID().toString.replace("-", "").take(8)
    val q = joined.writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    try {
      // both sides advance together so neither watermark outruns the
      // other's in-flight rows; 3 rounds = 2 cross-batch boundaries
      // (cross-batch state is the contract under test; each extra
      // round only multiplies fixed state-store cost)
      val batchSize = feed.length / 3 + 1
      feed.grouped(batchSize).foreach { g =>
        val p = g.collect { case ("purchase", id, t) => (id, t) }
        val e = g.collect { case ("error", id, t) => (id, t) }
        if (p.nonEmpty) pMem.addData(p.toSeq: _*)
        if (e.nonEmpty) eMem.addData(e.toSeq: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    spark.table(sink)
      .groupBy(col("p_id").as("event_id"))
      .agg(count(lit(1)).as("n_nearby_errors"),
        min(col("e_id")).as("first_error_id"),
        max(col("e_id")).as("last_error_id"))
      .orderBy("event_id")
  }

  val q58Sql: String =
    """SELECT p.event_id,
      |  count(*) AS n_nearby_errors,
      |  min(e.event_id) AS first_error_id,
      |  max(e.event_id) AS last_error_id
      |FROM events p JOIN events e
      |  ON e.event_type = 'error'
      | AND e.user_id % 3 = 0
      | AND abs(epoch_us(e.ts) - epoch_us(p.ts)) <= 600000000
      |WHERE p.event_type = 'purchase' AND p.user_id % 3 = 0
      |GROUP BY 1
      |ORDER BY 1""".stripMargin

  val q48Sql: String =
    """WITH nat AS (
      |  SELECT n_name AS name, CAST(n_regionkey AS BIGINT) AS rkey FROM nation
      |),
      |reg AS (
      |  SELECT 'R_' || r_name AS name, CAST(r_regionkey AS BIGINT) + 100 AS rkey
      |  FROM region
      |),
      |allr AS (
      |  SELECT * FROM nat UNION ALL SELECT * FROM reg
      |),
      |st AS (
      |  SELECT CASE WHEN rkey = 3 THEN name || '_u' ELSE name END AS name, rkey
      |  FROM allr
      |)
      |SELECT part, name, rkey FROM (
      |  SELECT 'state' AS part, name, rkey FROM st
      |  UNION ALL
      |  SELECT 'chg', name || ':update_preimage', rkey FROM allr WHERE rkey = 3
      |  UNION ALL
      |  SELECT 'chg', name || ':update_postimage', rkey FROM st WHERE rkey = 3
      |  UNION ALL
      |  SELECT 'meta', 'noop_restart_delta=0', CAST(0 AS BIGINT)
      |) ORDER BY part, name, rkey""".stripMargin

  /** Stream–stream LEFT OUTER join
    * ([[graft.streaming.StreamOps.leftOuterFollowupJoin]]): purchases
    * of the user_id%3=1 slice left-joined to the same users' errors in
    * the following 10 minutes, replayed as two memory streams in
    * event-time lockstep over 3 micro-batch rounds. The outer NULL
    * rows only exist because the watermark proved no match can still
    * arrive — a sentinel far-future row on BOTH streams flushes the
    * tail so every unmatched purchase surfaces before the query stops.
    * Gate: per purchase, follow-up count and first follow-up error id
    * (-1 when none) must equal the batch LEFT JOIN bit-for-bit.
    */
  def q78StreamOuterJoin(spark: SparkSession, d: String): DataFrame =
    // no-data batches off: outer NULL rows need a batch that RUNS with
    // the advanced watermark — the second sentinel DATA batch below is
    // that batch (the same two-step flush q50 uses), so the trailing
    // watermark-only machinery batches are pure per-batch fixed cost
    withStatePartitions(spark, 4, noDataBatches = false)(q78Body(spark, d))

  private def q78Body(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    def micros(t: Timestamp): Long = t.getTime * 1000 + (t.getNanos / 1000) % 1000
    val feed = Tables.events(spark, d)
      .filter(col("user_id") % 3 === 1 &&
        col("event_type").isin("purchase", "error"))
      .select(col("event_type"), col("event_id"), col("user_id"), col("ts"))
      .as[(String, Long, Long, Timestamp)]
      .collect()
      .sortBy(r => (micros(r._4), r._2))
    require(feed.nonEmpty, s"no purchase/error events with user_id % 3 = 1 under $d")
    val flushTs = new Timestamp(feed.map(_._4.getTime).max + 86400000L)

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val pMem = MemoryStream[(Long, Long, Timestamp)]
    val eMem = MemoryStream[(Long, Long, Timestamp)]
    val joined = graft.streaming.StreamOps.leftOuterFollowupJoin(
      pMem.toDF.toDF("p_id", "p_user", "p_ts"),
      eMem.toDF.toDF("e_id", "e_user", "e_ts"),
      "p_id", "p_user", "p_ts", "e_id", "e_user", "e_ts",
      windowSeconds = 600, delayThreshold = "30 minutes")
    val sink = "q78_outer_" +
      java.util.UUID.randomUUID().toString.replace("-", "").take(8)
    val q = joined.writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    try {
      val batchSize = feed.length / 3 + 1
      feed.grouped(batchSize).foreach { g =>
        val p = g.collect { case ("purchase", id, u, t) => (id, u, t) }
        val e = g.collect { case ("error", id, u, t) => (id, u, t) }
        if (p.nonEmpty) pMem.addData(p.toSeq: _*)
        if (e.nonEmpty) eMem.addData(e.toSeq: _*)
        q.processAllAvailable()
      }
      // watermark flush: a far-future sentinel on BOTH streams (the
      // query watermark is the min across inputs) releases every
      // pending outer NULL row; user -1 matches nothing. The watermark
      // a batch advances applies to the NEXT batch, so a SECOND, even
      // later sentinel batch performs the actual eviction — a data
      // batch doing the work a trailing no-data batch used to do
      // (noDataMicroBatches is off for this gate).
      pMem.addData((-1L, -1L, flushTs))
      eMem.addData((-1L, -1L, flushTs))
      q.processAllAvailable()
      val flushTs2 = new Timestamp(flushTs.getTime + 86400000L)
      pMem.addData((-1L, -1L, flushTs2))
      eMem.addData((-1L, -1L, flushTs2))
      q.processAllAvailable()
    } finally q.stop()

    spark.table(sink)
      .filter(col("p_id") =!= -1L)
      .groupBy(col("p_id").as("event_id"))
      .agg(count(col("e_id")).as("n_followups"),
        coalesce(min(col("e_id")), lit(-1L)).as("first_followup_id"))
      .orderBy("event_id")
  }

  val q78Sql: String =
    """SELECT p.event_id,
      |  count(e.event_id) AS n_followups,
      |  coalesce(min(e.event_id), -1) AS first_followup_id
      |FROM events p LEFT JOIN events e
      |  ON e.event_type = 'error'
      | AND e.user_id = p.user_id
      | AND e.ts >= p.ts
      | AND e.ts <= p.ts + INTERVAL 600 SECONDS
      |WHERE p.event_type = 'purchase' AND p.user_id % 3 = 1
      |GROUP BY 1
      |ORDER BY 1""".stripMargin

  /** Streaming CDC-apply — the canonical `foreachBatch` + MERGE
    * pattern: a keyed update stream (the %5=2 user slice of events,
    * replayed in event-time order over 3 micro-batches) upserts into a
    * vintage table; each batch first collapses to one row per key
    * (latest by (ts, event_id) — MERGE forbids duplicate source
    * matches), then `whenMatched.updateAll / whenNotMatched.insertAll`
    * applies last-write-wins. Final table state must equal the batch
    * "latest row per key" query bit-for-bit. At 100 TB each refresh
    * costs the batch's keys' touched files (stats-pruned), never the
    * table.
    */
  def q81StreamUpsert(spark: SparkSession, d: String): DataFrame =
    withStatePartitions(spark, 4)(q81Body(spark, d))

  private def q81Body(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.vintage.VintageTable

    val feed = Tables.events(spark, d)
      .filter(col("user_id") % 5 === 2)
      .select(col("user_id"), col("value"),
        unix_micros(col("ts")).as("ts_us"), col("event_id"))
      .as[(Long, Double, Long, Long)]
      .collect()
      .sortBy(r => (r._3, r._4))
    require(feed.nonEmpty, s"no events with user_id % 5 = 2 under $d")

    val dir = java.nio.file.Files.createTempDirectory("graft-q81").toString + "/t"
    val empty = Seq.empty[(Long, Double, Long)]
      .toDF("user_id", "last_value", "last_event_id")
    val t = VintageTable.create(spark, dir, empty)

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Double, Long, Long)]
    val q = mem.toDF.toDF("user_id", "value", "ts_us", "event_id")
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id")
          .orderBy(col("ts_us").desc, col("event_id").desc)
        val latest = batch
          .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
          .select(col("user_id"), col("value").as("last_value"),
            col("event_id").as("last_event_id"))
        t.as("t")
          .merge(latest.as("s"), "t.user_id = s.user_id")
          .whenMatched().updateAll()
          .whenNotMatched().insertAll()
          .execute()
      }
      .start()
    try {
      val batchSize = feed.length / 3 + 1
      feed.grouped(batchSize).foreach { g =>
        mem.addData(g.toSeq: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    // gate-side: the upserted value as exact integer cents
    // ([[Analytics.centsSql]]) — no raw double crosses the gate
    t.toDF.select(col("user_id"),
        expr(Analytics.centsSql("last_value")).as("last_value_c"),
        col("last_event_id"))
      .orderBy("user_id")
  }

  val q81Sql: String =
    s"""SELECT user_id,
      |  ${Analytics.centsSql("value")} AS last_value_c,
      |  event_id AS last_event_id
      |FROM (
      |  SELECT user_id, value, event_id,
      |    row_number() OVER (PARTITION BY user_id
      |                       ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events WHERE user_id % 5 = 2)
      |WHERE rn = 1
      |ORDER BY user_id""".stripMargin
}
