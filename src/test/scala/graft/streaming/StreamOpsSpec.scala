package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Stateful streaming operators: gap sessionization
  * (flatMapGroupsWithState + event-time timeout), bounded-state exact
  * dedup, watermarked window stats — semantics pinned against the
  * batch operators where a batch twin exists.
  */
class StreamOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  test("streaming sessionize: gap closes sessions; watermark flushes the tail") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val sessions = StreamOps.sessionize(
      mem.toDF().toDF("user_id", "ts"), "user_id", "ts",
      gap = "5 minutes", delayThreshold = "1 minute")
    val q = sessions.writeStream.format("memory")
      .queryName("sess_out").outputMode("append").start()
    try {
      // user 1: two bursts separated by > gap; user 2: one burst
      mem.addData((1L, ts(0)), (1L, ts(2)), (2L, ts(1)))
      q.processAllAvailable()
      mem.addData((1L, ts(10)), (1L, ts(12)), (2L, ts(3)))
      q.processAllAvailable()
      // user 1's first gap is proven by its batch-2 events; user 2's
      // open session flushes via event-time TIMEOUT (the watermark
      // from batch 2's 10:12 event passed its 10:03+gap deadline)
      val afterGap = spark.table("sess_out")
        .as[(Long, Timestamp, Timestamp, Long)].collect().toSet
      assert(afterGap == Set(
        (1L, ts(0), ts(2), 2L),
        (2L, ts(1), ts(3), 2L)))
      // advance the watermark far past every open deadline: the open
      // sessions flush through the event-time timeout
      mem.addData((99L, ts(59)))
      q.processAllAvailable()
      mem.addData((99L, ts(59))) // second advance lets timeouts fire
      q.processAllAvailable()
      val flushed = spark.table("sess_out")
        .as[(Long, Timestamp, Timestamp, Long)].collect().toSet
      assert(flushed.contains((1L, ts(10), ts(12), 2L)))
      assert(flushed.contains((2L, ts(1), ts(3), 2L)))
    } finally q.stop()
  }

  test("out-of-order in-bound event opens its own earlier session") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val q = StreamOps.sessionize(
        mem.toDF().toDF("user_id", "ts"), "user_id", "ts",
        gap = "5 minutes", delayThreshold = "40 minutes")
      .writeStream.format("memory").queryName("sess_ooo")
      .outputMode("append").start()
    try {
      mem.addData((1L, ts(20)))
      q.processAllAvailable()
      // 20 minutes OLDER than the open session, still in-bound under
      // the 40-minute delay: must NOT fold into the 10:20 session
      // (whose gap window starts at 10:15) — it is its own session,
      // and the 10:20 session's existence proves its gap immediately
      mem.addData((1L, ts(0)))
      q.processAllAvailable()
      val eager = spark.table("sess_ooo")
        .as[(Long, Timestamp, Timestamp, Long)].collect().toSet
      assert(eager == Set((1L, ts(0), ts(0), 1L)))
      // push the watermark past the 10:25 deadline to flush the rest
      val far = Timestamp.valueOf("2026-01-01 12:00:00")
      mem.addData((99L, far)); q.processAllAvailable()
      mem.addData((99L, far)); q.processAllAvailable()
      val all = spark.table("sess_ooo")
        .as[(Long, Timestamp, Timestamp, Long)].collect().toSet
        .filter(_._1 == 1L)
      assert(all == Set(
        (1L, ts(0), ts(0), 1L),
        (1L, ts(20), ts(20), 1L)))
    } finally q.stop()
  }

  test("streaming sessionize agrees with the batch sessionizer") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // deterministic event set over 3 users with gaps around the 5-min rule
    val events = (for {
      u <- 1L to 3L
      m <- Seq(0, 1, 2, 9, 10, 30, 31, 33)
    } yield (u, ts(m + u.toInt))) // shift per user to vary bounds
      // feed in event-time order with a 2-minute delay bound: every
      // event stays strictly in-bound (an event at or behind the
      // watermark is LATE and correctly dropped — the agreement
      // contract is for in-bound arrivals)
      .sortBy(_._2.getTime)
    val mem = MemoryStream[(Long, Timestamp)]
    val q = StreamOps.sessionize(
        mem.toDF().toDF("user_id", "ts"), "user_id", "ts",
        gap = "5 minutes", delayThreshold = "2 minutes")
      .writeStream.format("memory").queryName("sess_cmp")
      .outputMode("append").start()
    try {
      events.grouped(5).foreach { g => mem.addData(g: _*); q.processAllAvailable() }
      // push the watermark far ahead, twice, to flush open sessions
      mem.addData((99L, ts(59))); q.processAllAvailable()
      mem.addData((99L, ts(59))); q.processAllAvailable()
      val streamed = spark.table("sess_cmp")
        .as[(Long, Timestamp, Timestamp, Long)].collect().toSet
        .filter(_._1 != 99L)
      val batch = graft.operators.TimeSeries.sessionize(
          events.toDF("user_id", "ts"), "user_id", "ts",
          tieBreakCol = "ts", gapSeconds = 300)
        .groupBy("user_id", "session_id")
        .agg(min(col("ts")).as("s"), max(col("ts")).as("e"),
          count(lit(1)).as("n"))
        .select(col("user_id"), col("s"), col("e"), col("n"))
        .as[(Long, Timestamp, Timestamp, Long)].collect().toSet
      assert(streamed == batch,
        s"stream/batch sessionization must agree\nstream: $streamed\nbatch: $batch")
    } finally q.stop()
  }

  test("dedupExactStreaming drops in-window duplicates, state stays bounded") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp)]
    val q = StreamOps.dedupExactStreaming(
        mem.toDF().toDF("doc_id", "text", "ts"),
        "text", "ts", delayThreshold = "2 minutes")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      mem.addData((1L, "alpha", ts(0)), (2L, "alpha", ts(1)), (3L, "beta", ts(1)))
      q.processAllAvailable()
      mem.addData((4L, "alpha", ts(2))) // still inside the window: dropped
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select("doc_id")
        .as[Long].collect().toSet
      assert(ids.intersect(Set(1L, 2L)).size == 1, "one alpha survivor")
      assert(ids.contains(3L) && !ids.contains(4L))
    } finally q.stop()
  }

  test("windowedDocStats: tumbling counts and token sums age out with watermark") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp)]
    val q = StreamOps.windowedDocStats(
        mem.toDF().toDF("text", "ts"), "ts", "text",
        windowDuration = "10 minutes", slideDuration = "10 minutes",
        delayThreshold = "1 minute")
      .writeStream.format("memory").queryName("win_out")
      .outputMode("append").start()
    try {
      mem.addData(("one two three", ts(1)), ("four five", ts(4)))
      q.processAllAvailable()
      // events far past the first window finalize it (append mode
      // emits a window only after the watermark passes its end)
      mem.addData(("later doc", ts(30)))
      q.processAllAvailable()
      mem.addData(("even later", ts(45)))
      q.processAllAvailable()
      val first = spark.table("win_out")
        .filter(col("window_start") === ts(0)).collect()
      assert(first.length == 1)
      assert(first(0).getAs[Long]("n_docs") == 2)
      assert(first(0).getAs[Long]("n_tokens") == 5)
    } finally q.stop()
  }

  test("bandJoinStreaming agrees with the batch band join for in-bound feeds") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // deterministic times across several 60s cells, both sides
    val lt = (0 until 40).map(i => (i.toLong, (i * 37L) % 600L))
    val rt = (0 until 50).map(j => (j + 100L, (j * 53L) % 600L))
    val pMem = MemoryStream[(Long, Timestamp)]
    val eMem = MemoryStream[(Long, Timestamp)]
    val q = StreamOps.bandJoinStreaming(
        pMem.toDF().toDF("p_id", "p_ts"), eMem.toDF().toDF("e_id", "e_ts"),
        "p_id", "p_ts", "e_id", "e_ts",
        widthSeconds = 60, delayThreshold = "1 hour")
      .writeStream.format("memory").queryName("band_out")
      .outputMode("append").start()
    try {
      // feed both sides in 3 time-ordered rounds so pairs must match
      // ACROSS micro-batch boundaries via buffered state
      val ls = lt.sortBy(_._2).grouped(14).toSeq
      val rs = rt.sortBy(_._2).grouped(17).toSeq
      for (i <- 0 until math.max(ls.size, rs.size)) {
        ls.lift(i).foreach(g => pMem.addData(g.map { case (id, s) => (id, ts2(s)) }: _*))
        rs.lift(i).foreach(g => eMem.addData(g.map { case (id, s) => (id, ts2(s)) }: _*))
        q.processAllAvailable()
      }
      val got = spark.table("band_out").select("p_id", "e_id")
        .as[(Long, Long)].collect().toList
      val expect = for {
        (l, a) <- lt; (r, b) <- rt if math.abs(a - b) <= 60
      } yield (l, r)
      assert(got.size == expect.size, s"${got.size} vs ${expect.size}")
      assert(got.toSet == expect.toSet)
    } finally q.stop()
  }

  test("bandJoinStreaming: watermark + band bound evict buffered state") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val pMem = MemoryStream[(Long, Timestamp)]
    val eMem = MemoryStream[(Long, Timestamp)]
    val q = StreamOps.bandJoinStreaming(
        pMem.toDF().toDF("p_id", "p_ts"), eMem.toDF().toDF("e_id", "e_ts"),
        "p_id", "p_ts", "e_id", "e_ts",
        widthSeconds = 60, delayThreshold = "1 minute")
      .writeStream.format("memory").queryName("band_evict")
      .outputMode("append").start()
    try {
      pMem.addData((1L, ts2(0)), (2L, ts2(10)))
      eMem.addData((9L, ts2(5)))
      q.processAllAvailable()
      // advance both watermarks far past every buffered row's horizon
      pMem.addData((3L, ts2(100000))); eMem.addData((8L, ts2(100000)))
      q.processAllAvailable()
      pMem.addData((4L, ts2(100060))); eMem.addData((7L, ts2(100030)))
      q.processAllAvailable()
      val rowsInState = q.lastProgress.stateOperators(0).numRowsTotal
      // rows 1/2/9 are far older than watermark − band: evicted; only
      // the newest frontier may remain buffered (right rows count ×3 —
      // the cell replication), so ≤ 2 left + 2×3 right
      assert(rowsInState <= 8, s"state holds $rowsInState rows")
      val pairs = spark.table("band_evict").select("p_id", "e_id")
        .as[(Long, Long)].collect().toSet
      assert(pairs.contains((1L, 9L)) && pairs.contains((2L, 9L)))
      assert(pairs.contains((4L, 7L)))
    } finally q.stop()
  }

  test("leftOuterFollowupJoin: matches emit; unmatched emit ONE null row after watermark") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val pMem = MemoryStream[(Long, Long, Timestamp)]
    val eMem = MemoryStream[(Long, Long, Timestamp)]
    val sink = "outer_out_" + java.util.UUID.randomUUID().toString.take(8).replace("-", "")
    val q = StreamOps.leftOuterFollowupJoin(
        pMem.toDF().toDF("p_id", "p_user", "p_ts"),
        eMem.toDF().toDF("e_id", "e_user", "e_ts"),
        "p_id", "p_user", "p_ts", "e_id", "e_user", "e_ts",
        windowSeconds = 600, delayThreshold = "700 seconds")
      .writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    try {
      // user 1's purchase gets an error 30s later (match); user 2's
      // only error comes 900s later (outside window); user 3 has none
      pMem.addData((10L, 1L, ts2(0)), (20L, 2L, ts2(60)), (30L, 3L, ts2(60)))
      eMem.addData((100L, 1L, ts2(30)), (200L, 2L, ts2(960)))
      q.processAllAvailable()
      // nothing unmatched may emit yet: watermark hasn't passed
      val early = spark.table(sink).filter($"e_id".isNull).count()
      assert(early == 0, s"null rows before watermark: $early")
      // sentinels push BOTH watermarks far past every pending row
      pMem.addData((-1L, -1L, ts2(100000)))
      eMem.addData((-2L, -1L, ts2(100000)))
      q.processAllAvailable()
      val got = spark.table(sink).filter($"p_id" > 0)
        .select("p_id", "e_id").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .toList
      assert(got.size == 3, s"each purchase exactly once: $got")
      assert(got.toMap == Map(10L -> Some(100L), 20L -> None, 30L -> None), s"$got")
    } finally q.stop()
  }

  /** seconds → Timestamp, offset well past epoch 0 (a row AT the
    * initial watermark would be dropped as late). */
  private def ts2(s: Long): Timestamp =
    new Timestamp(Timestamp.valueOf("2026-01-01 00:00:00").getTime + s * 1000L)
}
