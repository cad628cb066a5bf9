package graft.vintage

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.Base64

import org.apache.spark.sql.types._

/** Per-file Bloom filters for LOG-LEVEL data skipping — the planning
  * tier above the parquet row-group blooms `vintage.bloom.columns`
  * already writes: those prune row groups AFTER a task opened the
  * file; these prune whole FILES before any task launches. On a 100 TB
  * table a point lookup on a high-cardinality unsorted key (where
  * every file's min/max spans the whole domain) goes from "schedule a
  * scan task per file" to "schedule the handful whose bloom answers
  * maybe".
  *
  * The k probe positions are 24-bit md5 slices of the value's
  * canonical string rendering, reduced mod mBits — the same derivation
  * as [[graft.operators.Bloom]], chosen here because it is exactly
  * reproducible anywhere (no seed, no engine hash). Encoded
  * self-describing as `mBits:k:base64(littleEndianWords)` so the
  * filter parameters can change per table (or per write) without
  * ambiguity at probe time.
  *
  * Soundness: a present filter answers "maybe" (scan it) or
  * "definitely not" (skip) — never a false negative, provided writer
  * and prober render values identically. [[renderLiteral]] is the
  * single gate for that: it only renders (column, literal) type
  * pairs whose rendering provably matches what the writer stored
  * (string↔string, integral↔integral); anything else declines and the
  * file is scanned.
  */
object StatsBloom {

  val DefaultBits = 1024
  val DefaultK = 5

  def probes(value: String, mBits: Int, k: Int): Seq[Int] = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(value.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
    (0 until k).map { j =>
      (java.lang.Long.parseLong(hex.substring(j * 6, j * 6 + 6), 16)
        % mBits).toInt
    }
  }

  /** Mutable builder used by the per-file write task. */
  final class Builder(mBits: Int = DefaultBits, k: Int = DefaultK) {
    require(mBits >= 64 && mBits % 64 == 0, s"mBits must be a positive multiple of 64, got $mBits")
    require(k >= 1 && k * 6 <= 32, s"k=$k probes need ${k * 6} hex chars of md5")
    private val words = new Array[Long](mBits / 64)
    private var seen = false

    def add(value: String): Unit = {
      probes(value, mBits, k).foreach { p =>
        words(p / 64) |= (1L << (p % 64))
      }
      seen = true
    }

    /** Encoded filter; None when no value was ever added (an all-null
      * file's equality pruning is already handled by nullCount).
      */
    def encode(): Option[String] =
      if (!seen) None
      else {
        val bytes = java.nio.ByteBuffer.allocate(words.length * 8)
        words.foreach(bytes.putLong)
        Some(s"$mBits:$k:${Base64.getEncoder.encodeToString(bytes.array())}")
      }
  }

  /** Probe an encoded filter. Unparseable filters answer true (scan —
    * sound under corruption or future format drift).
    */
  def mightContain(encoded: String, value: String): Boolean = {
    val parts = encoded.split(":", 3)
    if (parts.length != 3) return true
    try {
      val mBits = parts(0).toInt
      val k = parts(1).toInt
      val bytes = Base64.getDecoder.decode(parts(2))
      if (mBits < 64 || mBits % 64 != 0 || k < 1 || k * 6 > 32 ||
          bytes.length != mBits / 8) return true
      val buf = java.nio.ByteBuffer.wrap(bytes)
      val words = Array.fill(mBits / 64)(buf.getLong)
      probes(value, mBits, k).forall(p => (words(p / 64) & (1L << (p % 64))) != 0)
    } catch { case _: IllegalArgumentException | _: NumberFormatException => true }
  }

  private def integral(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** Canonical rendering of an equality literal `v: t` probed against
    * a column of type `ct` — matches the writer's rendering (parquet
    * BINARY/UTF8 → the string itself; INT32/INT64 → decimal digits)
    * or declines with None (no bloom pruning, sound).
    */
  def renderLiteral(ct: DataType, v: Any, t: DataType): Option[String] =
    if (v == null) None
    else (ct, t) match {
      case (StringType, StringType) => Some(v.toString)
      case _ if integral(ct) && integral(t) => Some(v.toString)
      case _ => None
    }
}
