package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data mixes.
  *
  * All selection decisions derive from a PORTABLE multiplicative hash
  * (Knuth: `(id * 2654435761) mod 2^32`, scaled to [0,1)) rather than
  * an engine-specific hash or RNG: the same row set falls out of any
  * engine that can multiply integers, which is what makes the DuckDB
  * oracles exact and — more importantly at 100 TB — makes every rerun,
  * retry, and backfill select the SAME rows (sampling is effectively
  * content-addressed, so a resumed pipeline never double-draws).
  */
object Sampling {

  private val Knuth = 2654435761L
  private val Mod = 4294967296L // 2^32

  /** Deterministic hash of a non-negative integral id to [0, 1).
    *
    * Computed entirely in the 2^32 ring so no intermediate exceeds
    * 2^49: `id` is first reduced mod 2^32 (sound because
    * (id mod 2^32) * K ≡ id * K (mod 2^32)), then multiplied in
    * 16-bit halves. A naive `id * 2654435761` overflows Long from
    * id ≈ 3.47e9 — on the JVM the two's-complement wrap happens to
    * stay exact mod 2^32, but engines with checked 64-bit arithmetic
    * (DuckDB) REJECT the overflowing multiply, so only the ring form
    * keeps the "same rows from any engine" portability contract at
    * > 4-billion-row scale. Matches `(id * 2654435761) % 4294967296`
    * in exact (BigInt / HUGEINT) arithmetic for every non-negative
    * Long (pinned by PackingSamplingSpec).
    */
  def unitHash(id: Column): Column = {
    val x = pmod(id.cast("long"), lit(Mod)) // [0, 2^32)
    val hi = shiftright(x, 16) // 16 bits
    val lo = x.bitwiseAND(lit(65535L)) // 16 bits
    val prod = pmod(
      pmod(hi * lit(Knuth), lit(Mod)) * lit(65536L) + lo * lit(Knuth),
      lit(Mod))
    prod / lit(Mod.toDouble)
  }

  /** Bernoulli-style stratified sample: keep a row iff
    * unitHash(id) < fraction(stratum). Pure per-row filter — no
    * shuffle, fully pushdown-friendly, linear scan at any scale.
    * Strata absent from `fractions` fall back to `defaultFraction`.
    */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String,
                       fractions: Map[String, Double],
                       defaultFraction: Double = 0.0): DataFrame = {
    val frac = fractions.foldLeft(lit(defaultFraction): Column) {
      case (acc, (k, v)) => when(col(strataCol) === lit(k), lit(v)).otherwise(acc)
    }
    df.filter(unitHash(col(idCol)) < frac)
  }

  /** Exactly-k-per-stratum sample: rank rows within each stratum by
    * (unitHash, id) and keep the first k. One shuffle on the stratum
    * key; deterministic total order makes reruns identical. For a
    * hot stratum at extreme scale, pre-filter with
    * [[stratifiedSample]] at a fraction safely above k/|stratum| to
    * bound the per-group sort.
    */
  def stratifiedTopK(df: DataFrame, strataCol: String, idCol: String,
                     k: Int): DataFrame = {
    val w = Window.partitionBy(col(strataCol))
      .orderBy(unitHash(col(idCol)), col(idCol))
    df.withColumn("_sample_rank", row_number().over(w))
      .filter(col("_sample_rank") <= k)
      .drop("_sample_rank")
  }

  /** Token-budget sampling: within each stratum, walk rows in
    * deterministic `(unitHash(id), id)` order and keep a row iff the
    * total weight of the rows BEFORE it is still under the stratum's
    * budget — the "take N tokens from each domain" step of a
    * pretraining data recipe (budgets in tokens, weights = per-doc
    * token counts). Greedy prefix semantics: the first row that
    * crosses the budget is still kept, everything after it is not, so
    * the kept set is a deterministic function of content alone and a
    * rerun/backfill re-selects exactly the same rows.
    *
    * Scale shape: the naive formulation is one window per stratum —
    * a running sum ordered by hash — which serializes each stratum
    * into a single partition (a wall once one domain holds billions
    * of docs). This is the two-level exact prefix sum instead:
    *   1. rows land in `buckets` hash-range buckets (bucket order IS
    *      hash order, so concatenating buckets preserves the walk);
    *   2. per-(stratum, bucket) weight totals aggregate map-side —
    *      `strata * buckets` rows, driver-free;
    *   3. a window over that TINY frame yields each bucket's starting
    *      offset, broadcast back;
    *   4. the running sum completes LOCALLY inside each
    *      (stratum, bucket) partition — parallelism is
    *      `strata * buckets`, not `strata`.
    * Strata absent from `budgets` get budget 0 (dropped).
    *
    * Appends `tok_before` (exact weight sum of all preceding rows in
    * the stratum's walk) to the kept rows.
    */
  def tokenBudgetSample(df: DataFrame, strataCol: String, idCol: String,
                        weightCol: String, budgets: Map[String, Long],
                        buckets: Int = 256): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val h = unitHash(col(idCol))
    val withB = df
      .withColumn("__h", h)
      .withColumn("__b", floor(col("__h") * buckets).cast("int"))
    val totals = withB.groupBy(col(strataCol), col("__b"))
      .agg(sum(col(weightCol).cast("long")).as("__bt"))
    val wOff = Window.partitionBy(col(strataCol)).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals
      .withColumn("__off", coalesce(sum(col("__bt")).over(wOff), lit(0L)))
      .drop("__bt")
    val wLoc = Window.partitionBy(col(strataCol), col("__b"))
      .orderBy(col("__h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val budget = budgets.foldLeft(lit(0L): Column) {
      case (acc, (k, v)) => when(col(strataCol) === lit(k), lit(v)).otherwise(acc)
    }
    withB
      .join(broadcast(offsets), Seq(strataCol, "__b"))
      .withColumn("tok_before",
        col("__off") + coalesce(sum(col(weightCol).cast("long")).over(wLoc), lit(0L)))
      .filter(col("tok_before") < budget)
      .drop("__h", "__b", "__off")
  }

  /** Per-stratum sampling fractions that hit `targetShares` (shares of
    * the OUTPUT mix summing to 1) given observed stratum counts, scaled
    * as large as possible without any fraction exceeding 1 — the
    * "domain mixing" computation of a pretraining data recipe. Returns
    * (stratum -> fraction) ready for [[stratifiedSample]].
    */
  def mixingFractions(counts: Map[String, Long],
                      targetShares: Map[String, Double]): Map[String, Double] = {
    require(targetShares.values.forall(_ >= 0))
    val active = targetShares.filter { case (k, s) => s > 0 && counts.getOrElse(k, 0L) > 0 }
    if (active.isEmpty) return Map.empty
    // largest total output size N such that share_k * N <= count_k
    val n = active.map { case (k, s) => counts(k) / s }.min
    active.map { case (k, s) => k -> math.min(1.0, s * n / counts(k)) }
  }
}
