package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset-assembly operators for training pipelines: deterministic
  * train/val/test splitting and weighted multi-corpus mixing.
  *
  * Both are pure per-row hash decisions — no shuffle, no state, no
  * RNG. The split/mix assignment of a row depends only on its id (and
  * epoch), so it is stable across cluster layouts, re-runs, partial
  * re-processing, and engine implementations: the property that makes
  * a 100 TB split reproducible and incrementally extendable (new rows
  * get assigned without touching old ones; DuckDB replays the md5
  * arithmetic bit-for-bit as the gate oracle).
  */
object Splits {

  /** md5-derived bucket in [0, buckets) for an id column — the shared
    * primitive: first 6 hex chars (24 bits) as an integer, mod the
    * bucket count.
    */
  def hashBucket(id: Column, buckets: Int): Column =
    pmod(conv(substring(md5(id.cast("string")), 1, 6), 16, 10)
      .cast("long"), lit(buckets.toLong))

  /** Assign every row to a named split. `splits` maps split name →
    * percentage; percentages must sum to 100. Assignment walks the
    * splits in the given order over the row's hash bucket in [0,100) —
    * e.g. Seq(("train",80),("val",10),("test",10)) sends buckets 0-79
    * to train, 80-89 to val, 90-99 to test.
    *
    * Output column names are parameters (default "bucket"/"split");
    * pre-existing columns of those names are rejected rather than
    * silently replaced.
    */
  def assign(df: DataFrame, idCol: String,
      splits: Seq[(String, Int)],
      bucketCol: String = "bucket", splitCol: String = "split"): DataFrame = {
    require(splits.map(_._2).sum == 100,
      s"split percentages must sum to 100, got ${splits.map(_._2).sum}")
    Seq(bucketCol, splitCol).foreach(c =>
      require(!df.columns.exists(_.equalsIgnoreCase(c)),
        s"input already has a '$c' column; pass a different output name"))
    val bucket = hashBucket(col(idCol), 100)
    val cums = splits.scanLeft(0)(_ + _._2).tail
    val assigned = splits.zip(cums).foldRight(lit(splits.last._1): Column) {
      case (((name, _), cum), rest) => when(bucket < cum, name).otherwise(rest)
    }
    df.withColumn(bucketCol, bucket).withColumn(splitCol, assigned)
  }

  /** Weighted corpus mixing with deterministic oversampling: each
    * source's rows are emitted `floor(rate)` whole epochs plus one
    * fractional epoch that keeps a row iff its per-(id, epoch) hash
    * fraction (out of 1e6) falls under the fractional part. Rates are
    * fixed-point e6 (`rateE6 = 1_500_000` → 1.5 epochs) so the
    * accept threshold is exact integer arithmetic.
    *
    * Scale shape: `explode(sequence(...))` fans each row out to its
    * (bounded, small) epoch count map-side — no shuffle, no join, and
    * downstream consumers see (row, epoch) pairs they can hash-route
    * like any other row. Unknown sources get rate 0 (dropped), which
    * is the safe default for a mixing config.
    */
  def mix(df: DataFrame, idCol: String, sourceCol: String,
      ratesE6: Map[String, Long]): DataFrame = {
    require(ratesE6.values.forall(_ >= 0), "rates must be non-negative")
    Seq("epoch", "rate_e6").foreach(c =>
      require(!df.columns.exists(_.equalsIgnoreCase(c)),
        s"input already has a '$c' column, which mix would overwrite"))
    val rate = ratesE6.foldLeft(lit(0L): Column) {
      case (rest, (src, r)) => when(col(sourceCol) === src, r).otherwise(rest)
    }
    val whole = (rate / 1000000L).cast("long")
    val frac = pmod(rate, lit(1000000L))
    // epochs 0..whole-1 are unconditional; epoch `whole` accepts the
    // hash fraction of rows. sequence() is inclusive, so emit up to
    // `whole` and filter the last epoch by the threshold.
    val fracHash = pmod(
      conv(substring(md5(concat(col(idCol).cast("string"), lit(":"),
        col("epoch").cast("string"))), 1, 6), 16, 10).cast("long"),
      lit(1000000L))
    df.withColumn("rate_e6", rate)
      .filter(col("rate_e6") > 0)
      .withColumn("epoch",
        explode(sequence(lit(0L), whole - when(frac === 0, 1L).otherwise(0L))))
      .filter(col("epoch") < whole || fracHash < frac)
      .drop("rate_e6")
  }
}
