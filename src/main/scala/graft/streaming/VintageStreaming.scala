package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.vintage.VintageTable

/** Structured Streaming integration for vintage tables: continuous
  * ingestion of submission micro-batches with exactly-once-per-batch
  * upsert/append semantics via `foreachBatch` (each micro-batch becomes
  * one atomic transaction-log commit — the streaming analog of the
  * reference's file-at-a-time batch choreography, README.md:103-118).
  *
  * At scale this is the standard Delta-style streaming-sink shape: the
  * sink's idempotence comes from one commit per batch; a restart that
  * replays batch N simply merges the same keys again (upsert = no
  * duplicates). Watermarks/windowed aggregations compose upstream of
  * the sink as ordinary streaming transforms.
  */
object VintageStreaming {

  /** Attach a merge-upsert vintage sink to a streaming DataFrame:
    * every micro-batch is merged on `mergeKey` (update-all /
    * insert-all — the reference's merge-message semantics).
    *
    * {{{
    * VintageStreaming.mergeSink(stream, path, "KEY")
    *   .option("checkpointLocation", cp).start()
    * }}}
    */
  def mergeSink(stream: DataFrame, tablePath: String, mergeKey: String)
      : DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      upsertBatch(batch.sparkSession, batch, tablePath, mergeKey)
    }

  /** Append-only vintage sink (one commit per micro-batch).
    *
    * `txnAppId` makes the sink EXACTLY-ONCE across restarts: each
    * micro-batch commits with the transaction watermark (`txnAppId`,
    * batchId), so a batch replayed after a crash-between-commit-and-
    * checkpoint is recognized in the log and skipped instead of
    * appending its rows twice (Delta's `txnVersion` sink contract).
    * Without it the sink is append-at-least-once on replay.
    */
  def appendSink(stream: DataFrame, tablePath: String,
      txnAppId: Option[String] = None)
      : DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      appendBatch(batch, tablePath, txnAppId.map(a => (a, batchId)))
    }

  private[graft] def appendBatch(
      batch: DataFrame, tablePath: String,
      txn: Option[(String, Long)]): Unit = {
    if (batch.isEmpty) return
    if (VintageTable.isVintageTable(tablePath))
      VintageTable.forPath(batch.sparkSession, tablePath).append(batch, txn)
    else VintageTable.create(batch.sparkSession, tablePath, batch, txn = txn): Unit
  }

  /** One micro-batch upsert: dedupe the batch on the key, keeping the
    * lexicographically greatest row per key (max over the full-row
    * struct). The pick must be DETERMINISTIC — a replayed micro-batch
    * after restart has to upsert the identical row, or the
    * exactly-once-per-batch idempotence argument breaks; a plain
    * dropDuplicates keeps whichever row a partition happens to deliver
    * first. One map-side-combinable shuffle, same cost as dropDuplicates.
    */
  private[streaming] def upsertBatch(
      spark: SparkSession, batch: DataFrame,
      tablePath: String, mergeKey: String): Unit = {
    import org.apache.spark.sql.functions.{col, max, struct}
    if (batch.isEmpty) return
    val cols = batch.columns.toIndexedSeq
    val deduped = batch
      .groupBy(col(mergeKey))
      .agg(max(struct(cols.map(col): _*)).as("__row"))
      .select(cols.map(c => col(s"__row.$c").as(c)): _*)
    if (!VintageTable.isVintageTable(tablePath)) {
      VintageTable.create(spark, tablePath, deduped)
      return
    }
    VintageTable.forPath(spark, tablePath).as("t")
      .merge(deduped.as("s"), s"t.$mergeKey = s.$mergeKey")
      .whenMatched().updateAll()
      .whenNotMatched().insertAll()
      .execute()
  }
}
