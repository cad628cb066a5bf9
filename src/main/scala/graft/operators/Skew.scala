package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-salting for skewed shuffles — the manual counterpart to AQE's
  * runtime skew-join split, for when skew is KNOWN ahead of time (a
  * power-law key like a null-bucket user id or a viral document) and
  * the fix should be deterministic in the plan rather than dependent
  * on runtime stats.
  *
  * Shape: the large (skewed) side gets a deterministic salt in
  * [0, salts) derived from a caller-chosen discriminator column, so
  * one hot key's rows spread over `salts` shuffle partitions; the
  * small side is replicated `salts`× (explode of a literal range —
  * a factor-of-`salts` blowup of the SMALL side only) and the join
  * runs as a plain shuffled equi-join on (key, salt). Row-level
  * results are identical to the unsalted join: every (large, small)
  * match meets in exactly one salt cell, because the large row carries
  * one salt value and the small side is present in all of them.
  *
  * 100 TB notes: salting trades `salts`× small-side shuffle volume for
  * hot-key parallelism — size `salts` to the observed skew factor, not
  * higher. The salt must come from a column that actually varies
  * WITHIN the hot key (a line number, an event id); salting on a
  * constant re-creates the skew one level down.
  */
object Skew {

  /** Inner equi-join of `large` (skewed) with `small` on `key`,
    * salted `salts` ways. `discriminator` drives the salt for the
    * large side and must be non-null.
    */
  def saltedEquiJoin(large: DataFrame, small: DataFrame, key: String,
      discriminator: Column, salts: Int): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    val saltedLarge = large.withColumn("__salt",
      pmod(xxhash64(discriminator), lit(salts)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedLarge.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
