package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `percent_normalize(s)` — RFC 3986 §6.2.2.2 percent-encoding
  * normalization in one byte pass: every valid `%XX` escape has its
  * hex digits UPPERCASED, and escapes of UNRESERVED characters
  * (ALPHA / DIGIT / `-` / `.` / `_` / `~`) are DECODED to the bare
  * character — `%2f` → `%2F` (reserved, stays encoded), `%41` → `A`,
  * `%7e` → `~`. A `%` not followed by two hex digits is copied
  * verbatim (it is not an escape; normalizing must never corrupt
  * malformed input it cannot interpret). Non-ASCII bytes pass through
  * untouched, so the scan is UTF-8 safe (continuation bytes are
  * ≥ 0x80 and never match `%` or hex).
  *
  * The pure-regex built-ins cannot express this (uppercasing a
  * captured hex pair needs a replacement callback), which is why it is
  * a compiled expression; the q113 oracle replays the PLANTED escape
  * set with chained `replace()` instead (the gate-construction rule).
  * One output array sized to the input (decoding only shrinks), no
  * shuffle — canonicalization stays a single codegen projection.
  */
case class PercentNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs string, got ${other.sql}")
  }
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "percent_normalize"

  override def nullSafeEval(input: Any): Any =
    PercentNormalize.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"graft.functions.PercentNormalize.compute($s)")

  override protected def withNewChildInternal(newChild: Expression): PercentNormalize =
    copy(child = newChild)
}

object PercentNormalize {
  private val HEX = "0123456789ABCDEF".getBytes("US-ASCII")

  private def hexVal(b: Byte): Int =
    if (b >= '0' && b <= '9') b - '0'
    else if (b >= 'a' && b <= 'f') b - 'a' + 10
    else if (b >= 'A' && b <= 'F') b - 'A' + 10
    else -1

  private def isUnreserved(v: Int): Boolean =
    (v >= 'A' && v <= 'Z') || (v >= 'a' && v <= 'z') ||
    (v >= '0' && v <= '9') ||
    v == '-' || v == '.' || v == '_' || v == '~'

  /** Shared by interpreted eval and generated code. */
  def compute(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    val out = new Array[Byte](bytes.length)
    var i = 0
    var o = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (b == '%' && i + 2 < bytes.length &&
          hexVal(bytes(i + 1)) >= 0 && hexVal(bytes(i + 2)) >= 0) {
        val v = hexVal(bytes(i + 1)) * 16 + hexVal(bytes(i + 2))
        if (isUnreserved(v)) {
          out(o) = v.toByte; o += 1
        } else {
          out(o) = '%'; out(o + 1) = HEX(v >> 4); out(o + 2) = HEX(v & 15)
          o += 3
        }
        i += 3
      } else {
        out(o) = b; o += 1; i += 1
      }
    }
    UTF8String.fromBytes(out, 0, o)
  }
}
