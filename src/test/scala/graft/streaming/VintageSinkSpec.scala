package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.vintage.{VintageLog, VintageTable}

/** Native streaming sinks for vintage tables: the V1 path sink
  * (`writeStream.format("vintage")`) and the DSv2 STREAMING_WRITE
  * path (`writeStream.toTable`), both exactly-once per epoch via the
  * transaction watermark.
  */
class VintageSinkSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkTestSession.spark
    s.conf.set("spark.sql.catalog.vsink", "graft.vintage.connector.VintageCatalog")
    s.conf.set("spark.sql.catalog.vsink.warehouse",
      Files.createTempDirectory("vintage-sink-wh").toString)
    s
  }

  test("path sink: one commit per micro-batch, txn watermark dedupes replays") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = Files.createTempDirectory("vintage-sink").toString + "/t"
    val cp = Files.createTempDirectory("vintage-sink-cp").toString
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("id", "name").writeStream
      .format("vintage").option("path", dir)
      .option("checkpointLocation", cp)
      .start()
    try {
      mem.addData((1L, "a"), (2L, "b")); q.processAllAvailable()
      mem.addData((3L, "c")); q.processAllAvailable()
    } finally q.stop()
    val t = VintageTable.forPath(spark, dir)
    assert(t.toDF.count() == 3)
    assert(t.toDF.orderBy("id").select("name").collect().map(_.getString(0))
      .toSeq == Seq("a", "b", "c"))
    // the txn watermark rode the persistent-queryId-derived appId
    val sinkTxns = t.snapshot.txns.keys.filter(_.startsWith("vintage-sink:"))
    assert(sinkTxns.size == 1, s"txns recorded: ${t.snapshot.txns}")
    val appId = sinkTxns.head
    val lastBatch = t.txnVersion(appId)
    assert(lastBatch.nonEmpty, s"txns recorded: ${t.snapshot.txns}")
    // a replayed batch (same appId, same or older batchId) is a no-op
    t.append(Seq((99L, "dup")).toDF("id", "name"),
      Some((appId, lastBatch.get)))
    assert(t.toDF.count() == 3, "replayed batch must be skipped")
    // a NEW batch id still appends
    t.append(Seq((4L, "d")).toDF("id", "name"),
      Some((appId, lastBatch.get + 1)))
    assert(t.toDF.count() == 4)
  }

  test("path sink without a query id fails loud instead of path-keying") {
    import spark.implicits._
    // two distinct queries writing one path under a path-derived appId
    // would share a watermark and silently skip each other's batches —
    // the sink must demand an explicit txnAppId when the streaming
    // query id is not surfaced, never degrade to dropped data
    val dir = Files.createTempDirectory("vintage-sink-noid").toString + "/t"
    val sink = new graft.vintage.connector.VintageSource().createSink(
      spark.sqlContext, Map("path" -> dir), Nil,
      org.apache.spark.sql.streaming.OutputMode.Append())
    val prev = spark.sparkContext.getLocalProperty("sql.streaming.queryId")
    spark.sparkContext.setLocalProperty("sql.streaming.queryId", null)
    try {
      val e = intercept[IllegalStateException] {
        sink.addBatch(0L, Seq((1L, "a")).toDF("id", "name"))
      }
      assert(e.getMessage.contains("txnAppId"))
      // an explicit txnAppId makes the same call legal
      val sink2 = new graft.vintage.connector.VintageSource().createSink(
        spark.sqlContext, Map("path" -> dir, "txnAppId" -> "job-7"), Nil,
        org.apache.spark.sql.streaming.OutputMode.Append())
      sink2.addBatch(0L, Seq((1L, "a")).toDF("id", "name"))
      assert(VintageTable.forPath(spark, dir).toDF.count() == 1)
    } finally
      spark.sparkContext.setLocalProperty("sql.streaming.queryId", prev)
  }

  test("DSv2 toTable: native per-epoch commits, exactly-once watermark") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    spark.sql("CREATE TABLE vsink.s (id BIGINT, name STRING)")
    val cp = Files.createTempDirectory("vintage-sink-cp2").toString
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("id", "name").writeStream
      .option("checkpointLocation", cp)
      .toTable("vsink.s")
    try {
      mem.addData((1L, "a"), (2L, "b")); q.processAllAvailable()
      mem.addData((3L, "c")); q.processAllAvailable()
    } finally q.stop()
    assert(spark.sql("SELECT * FROM vsink.s").count() == 3)
    val wh = spark.conf.get("spark.sql.catalog.vsink.warehouse")
    val t = VintageTable.forPath(spark, s"$wh/s")
    // per-epoch append commits through the native path
    val ops = VintageLog.replay(s"$wh/s").commits.sortBy(_.version)
    assert(ops.count(_.operation == "WRITE") >= 3) // create + 2 epochs
    // the streaming txn watermark landed with the persistent query id
    val streamingTxns = t.snapshot.txns.keys.filter(
      _.startsWith("vintage-streaming-"))
    assert(streamingTxns.size == 1, s"txns: ${t.snapshot.txns}")
    val appId = streamingTxns.head
    val epoch = t.txnVersion(appId).get
    // a replayed epoch is skipped AND its freshly written duplicate
    // files are deleted, not left as orphans
    val filesBefore = t.snapshot.files.map(_.path).toSet
    t.commitFiles(Nil, overwrite = false, txn = Some((appId, epoch)))
    assert(t.snapshot.files.map(_.path).toSet == filesBefore)
    assert(t.toDF.count() == 3)
  }

  test("table-to-table: vintage source streams into a vintage sink natively") {
    import spark.implicits._
    val src = Files.createTempDirectory("vintage-s2s-src").toString + "/t"
    val dst = Files.createTempDirectory("vintage-s2s-dst").toString + "/t"
    val cp = Files.createTempDirectory("vintage-s2s-cp").toString
    val t = VintageTable.create(spark, src,
      Seq((1L, 10L), (2L, 20L)).toDF("id", "v"))
    val q = spark.readStream.format("vintage").load(src)
      .withColumn("doubled", col("v") * 2)
      .writeStream.format("vintage").option("path", dst)
      .option("checkpointLocation", cp)
      .start()
    try {
      q.processAllAvailable()
      t.append(Seq((3L, 30L)).toDF("id", "v"))
      q.processAllAvailable()
    } finally q.stop()
    val out = VintageTable.forPath(spark, dst).toDF
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(out == Seq((1L, 20L), (2L, 40L), (3L, 60L)))
  }

  test("restart from checkpoint: no duplicate rows, watermark carries over") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = Files.createTempDirectory("vintage-sink-rs").toString + "/t"
    val cp = Files.createTempDirectory("vintage-sink-rs-cp").toString
    val mem = MemoryStream[(Long, String)]
    val q1 = mem.toDF().toDF("id", "name").writeStream
      .format("vintage").option("path", dir)
      .option("checkpointLocation", cp)
      .start()
    try {
      mem.addData((1L, "a")); q1.processAllAvailable()
      mem.addData((2L, "b")); q1.processAllAvailable()
    } finally q1.stop()
    // second incarnation of the SAME query (same checkpoint): offsets
    // resume, the committed batches are not re-appended
    val q2 = mem.toDF().toDF("id", "name").writeStream
      .format("vintage").option("path", dir)
      .option("checkpointLocation", cp)
      .start()
    try {
      mem.addData((3L, "c")); q2.processAllAvailable()
    } finally q2.stop()
    val t = VintageTable.forPath(spark, dir)
    assert(t.toDF.orderBy("id").select("id").collect().map(_.getLong(0)).toSeq
      == Seq(1L, 2L, 3L), "restart must not duplicate or drop rows")
  }

  test("DSv2 toTable streams into a hive-partitioned vintage table") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    spark.sql(
      "CREATE TABLE vsink.p (id BIGINT, region STRING) PARTITIONED BY (region)")
    val cp = Files.createTempDirectory("vintage-sink-p-cp").toString
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("id", "region").writeStream
      .option("checkpointLocation", cp)
      .toTable("vsink.p")
    try {
      mem.addData((1L, "eu"), (2L, "us"), (3L, "eu"))
      q.processAllAvailable()
    } finally q.stop()
    assert(spark.sql("SELECT * FROM vsink.p").count() == 3)
    // rows routed into hive partition directories
    val wh = spark.conf.get("spark.sql.catalog.vsink.warehouse")
    val files = VintageLog.replay(s"$wh/p").files
    assert(files.forall(f =>
      f.path.startsWith("region=eu/") || f.path.startsWith("region=us/")),
      s"expected hive layout, got ${files.map(_.path)}")
    // partition pruning still applies to the streamed files
    assert(spark.sql("SELECT * FROM vsink.p WHERE region = 'eu'").count() == 2)
  }

  test("path sink in complete mode overwrites per epoch, history retained") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = Files.createTempDirectory("vintage-sink-cm").toString + "/t"
    val cp = Files.createTempDirectory("vintage-sink-cm-cp").toString
    val mem = MemoryStream[(Long, Long)]
    val q = mem.toDF().toDF("k", "v")
      .groupBy("k").agg(sum("v").as("total"))
      .writeStream.outputMode("complete")
      .format("vintage").option("path", dir)
      .option("checkpointLocation", cp)
      .start()
    try {
      mem.addData((1L, 10L), (2L, 20L)); q.processAllAvailable()
      mem.addData((1L, 5L)); q.processAllAvailable()
    } finally q.stop()
    val t = VintageTable.forPath(spark, dir)
    val m = t.toDF.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m == Map(1L -> 15L, 2L -> 20L))
    // the first epoch's state is still one time travel away
    val v1 = t.toDFAsOf(0).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(v1 == Map(1L -> 10L, 2L -> 20L))
  }
}
