package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnExpr
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.storage.StorageLevel

import graft.operators.{Dedup, Html, NearDupIndex}
import graft.sources.WarcSource
import graft.vintage.VintageTable

/** The STANDING near-dup crawl refresh (q130): the q126 batch cadence
  * — exact tier → indexed near tier → corpus MERGE + signature-index
  * maintenance — run per micro-batch over the streaming WARC source,
  * so a live crawl keeps a deduplicated corpus AND its LSH index
  * current without any batch replay.
  *
  * Per micro-batch of parsed WARC records:
  *
  *  1. DECODE + EXTRACT: the declared `charset=` parameter of each
  *     record's Content-Type routes through the codegen'd
  *     [[graft.functions.DecodeCharset]] (absent → UTF-8; unsupported
  *     → record skipped) — the streaming path honors declared
  *     charsets exactly as the batch `warcToWet` does, never a blind
  *     UTF-8 cast; then [[Html.extractText]].
  *  2. EXACT TIER: `(url, content_hash)` anti-join against the stored
  *     corpus — an unchanged re-crawl is a no-op.
  *  3. NEAR TIER, new urls only: [[NearDupIndex.refresh]] against the
  *     STORED signature index (O(touched-files) probe; same-url
  *     recrawls are updates, not candidates).
  *  4. COMMIT: survivors MERGE into the corpus carrying the
  *     transaction watermark `(txnAppId, batchId)` — a replayed batch
  *     after a crash between commit and checkpoint is SKIPPED
  *     (exactly-once, the q129 sink contract extended to MERGE);
  *     then the signature index is maintained FROM CORPUS STATE:
  *     the batch's urls are semi-joined against the (now current)
  *     corpus, re-signed, and merged on `(url, band)`. Deriving the
  *     index rows from the corpus rather than from the batch's
  *     survivor decisions makes the second write CONVERGENT — a
  *     replay after a crash between the two merges recomputes the
  *     identical rows from the already-updated corpus and the index
  *     catches up, so the `bands × corpus` invariant holds across any
  *     crash point without a cross-table transaction.
  *
  * Determinism under file batching: a segment may split across
  * micro-batches (`maxFilesPerTrigger`), so the final state is
  * order-independent only when no two same-batch records carry the
  * same url with different content (the within-batch survivor pick is
  * the deterministic max-struct, [[VintageStreaming.upsertBatch]]'s
  * rule) and intra-drain near-dup pairs are intentional — the q130
  * fixture plants its near-dups strictly across drains.
  */
object CrawlRefresh {

  /** Charset parameter of a Content-Type header value ('' when
    * absent).
    */
  private def charsetOf(ct: Column): Column =
    regexp_extract(ct, "(?i)charset=\"?([a-zA-Z0-9_\\-]+)", 1)

  /** Parsed WARC records → refresh-ready docs: response records,
    * `text/html` mime, declared-charset decode ([[DecodeCharset]];
    * null = unsupported charset → skipped), HTML → text extraction.
    * Output: `(url, domain, content_hash, text)`.
    */
  private[streaming] def docsOf(records: DataFrame): DataFrame = {
    val mime = lower(trim(regexp_extract(col("content_type"), "^([^;]+)", 1)))
    val cs = charsetOf(col("content_type"))
    val decoded = ColumnExpr.column(graft.functions.DecodeCharset(
      ColumnExpr.expr(col("bytes")),
      ColumnExpr.expr(when(cs === "", lit("UTF-8")).otherwise(cs))))
    records
      .filter(col("warc_type") === "response")
      .withColumn("__text", decoded)
      .filter(mime === "text/html" && col("__text").isNotNull)
      .select(col("url"),
        regexp_extract(col("url"), "https://([^/]+)/", 1).as("domain"),
        Html.extractText(col("__text")).as("text"))
      .select(col("url"), col("domain"), md5(col("text")).as("content_hash"),
        col("text"))
  }

  /** One micro-batch of the standing refresh — exposed for
    * `foreachBatch` and for direct (batch-replay) testing. Safe to
    * call twice with the same `batchId`: the corpus merge is
    * watermark-skipped and the index maintenance converges.
    */
  def refreshBatch(records: DataFrame, tablePath: String, sigPath: String,
      txnAppId: String, batchId: Long,
      shingleSize: Int = 5, numHashes: Int = 128, bands: Int = 16,
      threshold: Double = 0.8, maxBucketSize: Int = 10000): Unit = {
    val spark = records.sparkSession
    val docs0 = docsOf(records)
    // deterministic within-batch survivor per url (a crawler can hit
    // one page twice mid-change inside one batch)
    val cols = docs0.columns.toIndexedSeq
    val docs = docs0
      .groupBy(col("url"))
      .agg(max(struct(cols.map(col): _*)).as("__row"))
      .select(cols.map(c => col(s"__row.$c").as(c)): _*)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      if (docs.isEmpty) return
      if (!VintageTable.isVintageTable(tablePath)) {
        // bootstrap: first batch creates corpus + clustered index
        val t = VintageTable.create(spark, tablePath, docs,
          txn = Some((txnAppId, batchId)))
        NearDupIndex.createIndex(spark, sigPath, t.toDF, "url", "text",
          shingleSize, numHashes, bands)
        return
      }
      val t = VintageTable.forPath(spark, tablePath)
      if (!VintageTable.isVintageTable(sigPath)) {
        // crash between bootstrap writes: rebuild the index from the
        // corpus — the convergence rule below, at version 0
        NearDupIndex.createIndex(spark, sigPath, t.toDF, "url", "text",
          shingleSize, numHashes, bands)
      }
      val sigT = VintageTable.forPath(spark, sigPath)
      if (!t.txnVersion(txnAppId).exists(_ >= batchId)) {
        val stored = t.toDF
        // referenced by the new-url split, the near tier, and the
        // survivor anti-join — each re-reading the corpus scan without
        // the persist
        val fresh = docs.join(stored.select("url", "content_hash"),
            Seq("url", "content_hash"), "left_anti")
          .persist(StorageLevel.MEMORY_AND_DISK)
        try {
          val newUrls = fresh.join(stored.select("url"), Seq("url"),
            "left_anti")
          val nearHits = NearDupIndex.refresh(newUrls, "url", "text",
            sigT, "url", stored.select(col("url"), col("text")), "text",
            shingleSize, numHashes, bands, threshold, maxBucketSize)
          val dropNear = nearHits.select(col("new_id").as("url")).distinct()
          val survivors = fresh.join(dropNear, Seq("url"), "left_anti")
          t.as("t").merge(survivors.as("s"), "t.url = s.url")
            .withTxn(txnAppId, batchId)
            .whenMatched().updateAll()
            .whenNotMatched().insertAll()
            .execute()
        } finally fresh.unpersist(blocking = false)
      }
      // index maintenance FROM CORPUS STATE (convergent on replay):
      // re-sign the batch's urls as the corpus now stores them
      val touched = t.toDF.join(docs.select("url"), Seq("url"), "left_semi")
      val sigSrc = Dedup.signatureBuckets(touched, "url", "text",
        shingleSize, numHashes, bands)
        .persist(StorageLevel.MEMORY_AND_DISK)
      try {
        if (!sigSrc.isEmpty)
          sigT.as("t").merge(sigSrc.as("s"),
              "t.url = s.url AND t.band = s.band")
            .whenMatched().updateAll()
            .whenNotMatched().insertAll()
            .execute()
      } finally sigSrc.unpersist(blocking = false)
    } finally docs.unpersist(blocking = false)
  }

  /** Attach the standing refresh to a crawl directory: incremental
    * WARC discovery ([[WarcSource.readWarcStream]]) driving
    * [[refreshBatch]] per micro-batch. Start with
    * `Trigger.AvailableNow` fired per crawl drop (the q129/q130
    * cadence) or a processing-time trigger for a continuously-fed
    * directory; the checkpoint + transaction watermark make delivery
    * exactly-once across restarts either way.
    */
  def start(spark: SparkSession, crawlGlob: String, tablePath: String,
      sigPath: String, checkpointDir: String, txnAppId: String,
      maxFilesPerTrigger: Int = 0, trigger: Trigger = Trigger.AvailableNow(),
      threshold: Double = 0.8): org.apache.spark.sql.streaming.StreamingQuery =
    WarcSource.readWarcStream(spark, crawlGlob, maxFilesPerTrigger)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        refreshBatch(batch, tablePath, sigPath, txnAppId, batchId,
          threshold = threshold)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
}
