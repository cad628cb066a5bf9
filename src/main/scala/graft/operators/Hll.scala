package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Portable HyperLogLog — the fixed-size cardinality sketch, built
  * entirely from engine-portable integer arithmetic so the register
  * table itself sits on the exact cross-engine hash gate (the same
  * portability contract as the KMV sketch and the q60/q62/q63 twins).
  *
  * Construction: a 48-bit md5-derived value hash splits into a bucket
  * index (`h mod m`) and a (48 − log2 m)-bit remainder; the register
  * value is the 1-based position of the remainder's highest set bit
  * from the MSB of that window (`rho = w + 1 - bitlength(remainder)`,
  * all-zeros → w + 1). Bit length is taken as `length(bin(x))` — a
  * string length of
  * the minimal binary rendering, exact integer logic both engines
  * share, immune to the `floor(log2(x))` float hazard at powers of
  * two. The whole sketch is one codegen'd projection plus ONE groupBy
  * on `m` keys: per-group state is a single int, map-side combined, so
  * the shuffle carries at most `m × partitions` rows regardless of
  * input size — the property that makes HLL the standard distinct
  * counter at 100 TB (vs `count(DISTINCT)`'s data-sized exchange).
  *
  * Estimation ([[estimate]]) is driver-side BigInt over the m-row
  * register table: raw = alpha_m · m² / Σ 2^-M_j with the standard
  * small-range linear-counting correction. Kept out of the gate —
  * the gate pins the REGISTERS (the distributed, order-invariant
  * part); the estimator is pinned by HllSpec against exact distinct
  * counts.
  */
object Hll {

  /** 48-bit portable value hash: top 12 hex chars of md5, as a long. */
  private def h48(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 12), 16, 10).cast("long")

  /** Register table (bucket, max_rho) for `m` buckets, m a power of
    * two ≤ 4096. Only observed buckets appear; absent buckets read as
    * register 0.
    */
  def registers(df: DataFrame, valueCol: Column, m: Int): DataFrame = {
    require(m > 0 && (m & (m - 1)) == 0 && m <= 4096,
      s"m must be a power of two <= 4096, got $m")
    val bits = Integer.numberOfTrailingZeros(m)
    val h = h48(valueCol)
    // h < 2^48 and m = 2^bits, so these are exact bit splits (no
    // float division anywhere — Column `/` on longs is double math).
    val rest = shiftrightunsigned(h, bits) // < 2^(48-bits)
    val w = 48 - bits // remainder window width; all-zeros rho = w + 1
    val rho = when(rest === 0, lit(w + 1))
      .otherwise(lit(w + 1) - length(bin(rest)))
    df.select(pmod(h, lit(m)).cast("int").as("bucket"), rho.as("rho"))
      .groupBy("bucket").agg(max("rho").cast("int").as("max_rho"))
  }

  /** HLL estimate from a collected register table (m-row metadata,
    * never data-sized). Exact rational arithmetic until the final
    * rounding; standard linear counting below the 2.5·m threshold.
    */
  def estimate(registers: Seq[(Int, Int)], m: Int): Long = {
    val filled = registers.toMap.withDefaultValue(0)
    val zeros = (0 until m).count(filled(_) == 0)
    // alpha_m in thousandths: 0.673 (16), 0.697 (32), 0.709 (64),
    // else 0.7213/(1+1.079/m) — the published constants.
    val alphaMilli: Long = m match {
      case 16 => 673
      case 32 => 697
      case 64 => 709
      case _  => math.round(721.3 / (1.0 + 1.079 / m))
    }
    // sum(2^-M_j) = S / 2^scale with S = sum(2^(scale - M_j)) an
    // exact BigInt; scale = max possible register value (w + 1).
    val scale = 49 - Integer.numberOfTrailingZeros(m)
    val s = (0 until m).map(j => BigInt(1) << (scale - filled(j))).sum
    val raw = (BigInt(alphaMilli) * m * m * (BigInt(1) << scale)) / (s * 1000)
    if (raw <= BigInt(5) * m / 2 && zeros > 0) {
      // linear counting: m * ln(m / zeros)
      math.round(m * math.log(m.toDouble / zeros))
    } else raw.toLong
  }
}
