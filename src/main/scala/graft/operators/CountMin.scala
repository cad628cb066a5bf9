package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch — the frequency-estimation member of the
  * constant-size sketch family (next to HLL distinct counts, KMV
  * quantile-ish distincts, and Bloom membership): a depth×width grid
  * of counters answering "about how often did key x occur?" with
  * one-sided error (estimate ≥ truth, over-counting bounded by
  * collisions; Cormode & Muthukrishnan 2005).
  *
  * 100 TB shape: building is ONE map-side-combined groupBy whose key
  * space is AT MOST depth×width cells regardless of input size — the
  * shuffle carries ≤ depth·width·partitions rows. The finished sketch
  * is depth·width longs; it rides a broadcast to the probe side, which
  * never shuffles. Counters are exact integer sums, and the row hashes
  * are md5 slices of the key's string rendering — deterministic under
  * any partitioning and exactly replayable by the SQL oracle.
  */
object CountMin {

  /** Hash column of `key` for sketch row `j` (0-based): 24-bit md5
    * slice mod `width` — row j consumes hex chars [6j, 6j+6).
    */
  def cell(key: Column, j: Int, width: Int): Column = {
    require(j >= 0 && (j + 1) * 6 <= 32, s"row $j needs hex chars beyond md5")
    pmod(conv(substring(md5(key.cast("string")), j * 6 + 1, 6), 16, 10)
      .cast("long"), lit(width.toLong)).cast("int")
  }

  /** Build the sketch: one row per non-empty counter cell,
    * `(row INT, col INT, cnt LONG)`.
    */
  def sketch(df: DataFrame, key: Column, depth: Int = 4,
      width: Int = 256): DataFrame = {
    require(depth >= 1 && depth * 6 <= 32, s"depth $depth needs ${depth * 6} hex chars")
    df.select(explode(array((0 until depth).map(j =>
        struct(lit(j).as("row"), cell(key, j, width).as("col"))): _*))
        .as("cell"))
      .select(col("cell.row").as("row"), col("cell.col").as("col"))
      .groupBy("row", "col").agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates for every distinct key of `keys`: min over the
    * depth counters the key hashes to. The sketch is broadcast; the
    * probe side computes its cells and never shuffles beyond its own
    * per-key distinct.
    */
  def estimate(sk: DataFrame, keys: DataFrame, key: Column,
      depth: Int = 4, width: Int = 256): DataFrame = {
    val probes = keys.select(key.cast("string").as("key")).distinct()
      .select(col("key"), explode(array((0 until depth).map(j =>
        struct(lit(j).as("row"), cell(col("key"), j, width).as("col"))): _*))
        .as("cell"))
      .select(col("key"), col("cell.row").as("row"), col("cell.col").as("col"))
    probes.join(broadcast(sk), Seq("row", "col"))
      .groupBy("key").agg(min("cnt").as("est"))
  }
}
