package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining batches: assign documents to
  * fixed-token-budget packs ("concatenate then chunk" semantics — pack
  * k of a shard holds the documents whose cumulative token offset
  * falls in [k*capacity, (k+1)*capacity)).
  *
  * Scale shape: a single GLOBAL cumulative sum would serialize 100 TB
  * through one task, so documents are first split into `numShards`
  * deterministic shards (`id % numShards`) and packed independently
  * within each — one window shuffle partitioned by shard, each shard's
  * running sum an independent task, packs named (shard, pack_id).
  * Shard count trades pack fragmentation (at most numShards partially
  * filled tail packs) for parallelism; at cluster scale pick
  * numShards ≈ a few × executor cores.
  *
  * Everything is integer arithmetic over an explicit total order
  * (id within shard), so any engine reproduces the assignment exactly
  * — the DuckDB oracle for q24 recomputes it with the same window.
  */
object Packing {

  /** Adds `shard`, `tok_before` (tokens accumulated before this doc in
    * its shard) and `pack_id` (= tok_before / capacity) columns.
    */
  def packSequences(df: DataFrame, idCol: String, tokensCol: String,
                    capacity: Long, numShards: Int): DataFrame = {
    require(capacity > 0 && numShards > 0)
    val shard = pmod(col(idCol).cast("long"), lit(numShards.toLong))
    val w = Window.partitionBy("shard").orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("shard", shard)
      .withColumn("tok_before",
        coalesce(sum(col(tokensCol).cast("long")).over(w), lit(0L)))
      .withColumn("pack_id", (col("tok_before") / capacity).cast("long"))
  }

  /** Per-pack roll-up: document count, token sum, id range. The
    * group-by keys are (shard, pack_id), so partial aggregation
    * combines map-side and the shuffle carries one row per pack.
    */
  def packStats(df: DataFrame, idCol: String, tokensCol: String,
                capacity: Long, numShards: Int): DataFrame =
    packSequences(df, idCol, tokensCol, capacity, numShards)
      .groupBy(col("shard"), col("pack_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col(tokensCol).cast("long")).as("pack_tokens"),
        min(col(idCol)).as("first_id"),
        max(col(idCol)).as("last_id"))

  /** Token overflow of each pack beyond capacity (a doc straddling the
    * boundary carries its tokens into the pack it STARTS in). Handy for
    * auditing how much truncation/continuation a training run sees.
    */
  def packOverflow(stats: DataFrame, capacity: Long): DataFrame =
    stats.withColumn("overflow_tokens",
      greatest(col("pack_tokens") - capacity, lit(0L)))
}
