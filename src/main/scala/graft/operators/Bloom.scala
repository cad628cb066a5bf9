package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Portable Bloom filter over document fingerprints — the cross-run
  * membership primitive of a training-data pipeline ("was this doc in
  * the last crawl / the eval set / an earlier epoch?") at 100 TB
  * shape: the filter is `mBits` bits regardless of corpus size, ships
  * as a broadcast to every executor, and membership is a per-row
  * probe — the big side never shuffles, unlike any join-based check.
  *
  * Everything is deterministic and engine-portable: the `k` probe
  * positions are 24-bit slices of the doc's md5 fingerprint reduced
  * mod `mBits`, and the filter materializes as `(word_idx, bits)`
  * rows (64-bit words), so DuckDB rebuilds the identical filter and
  * the whole pipeline sits on the exact hash gate (q61). Bloom
  * guarantees hold exactly: NO false negatives ever (asserted by
  * BloomSpec); false positives at the textbook rate for (k, n/m).
  *
  * Built from codegen'd built-ins only (conv/explode/bit ops +
  * one groupBy(word) `bit_or`): no UDF, no custom state.
  */
object Bloom {

  /** Whitespace-normalized md5 fingerprint (hex), as gate q19. */
  def fingerprint(textCol: Column): Column =
    md5(regexp_replace(lower(trim(textCol)), "\\s+", " "))

  private def positions(fp: Column, mBits: Int, k: Int): Column = {
    require(k >= 1 && k * 6 <= 32, s"k=$k probes need ${k * 6} hex chars of md5")
    require(mBits >= 64 && (mBits & (mBits - 1)) == 0,
      s"mBits must be a power of two >= 64, got $mBits")
    array((0 until k).map(j =>
      pmod(conv(substring(fp, j * 6 + 1, 6), 16, 10).cast("long"), lit(mBits.toLong))): _*)
  }

  /** Build the filter from `df`'s `textCol`: one row per 64-bit word
    * that has at least one bit set — `(word_idx LONG, bits LONG)`.
    * One narrow explode (k positions per doc) + one `bit_or` groupBy
    * on at most mBits/64 distinct keys.
    */
  def build(df: DataFrame, textCol: String, mBits: Int = 1024,
            k: Int = 5): DataFrame =
    df.select(explode(positions(fingerprint(col(textCol)), mBits, k)).as("__pos"))
      // shiftleft by a COLUMN needs the SQL form (the Scala helper
      // only takes a literal shift)
      .select(expr("__pos div 64").as("word_idx"),
        expr("shiftleft(1L, CAST(__pos % 64 AS INT))").as("__bit"))
      .groupBy("word_idx")
      .agg(bit_or(col("__bit")).as("bits"))

  /** Probe the filter for every row of `test`: appends `maybe_member`
    * (true iff ALL k probe bits are set — may be a false positive,
    * never a false negative). `filter` must come from [[build]] with
    * the same (mBits, k). The filter side is broadcast (≤ mBits/64
    * rows); the test side is never shuffled — the distinct-position
    * probe count aggregates per doc id.
    */
  def testMembership(test: DataFrame, filter: DataFrame, idCol: String,
                     textCol: String, mBits: Int = 1024, k: Int = 5): DataFrame = {
    val probes = test
      .select(col(idCol),
        explode(array_distinct(positions(fingerprint(col(textCol)), mBits, k)))
          .as("__pos"))
      .select(col(idCol), col("__pos"),
        expr("__pos div 64").as("word_idx"),
        pmod(col("__pos"), lit(64L)).cast("int").as("__b"))
    probes
      .join(broadcast(filter), Seq("word_idx"), "left")
      .select(col(idCol),
        expr("CAST(shiftright(coalesce(bits, 0L), __b) & 1 AS INT)").as("__hit"))
      .groupBy(idCol)
      .agg((count(lit(1)) === sum(col("__hit"))).as("maybe_member"))
  }
}
