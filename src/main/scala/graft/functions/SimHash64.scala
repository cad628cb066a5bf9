package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd 64-bit SimHash over whitespace tokens: bit i is set iff
  * the sum of (+1/−1) contributions of token-hash bit i over all
  * tokens is positive — one fused pass per row: lowercase, byte-scan
  * tokenize, xxhash64 per token, 64 counters.
  *
  * Bit-identical to the SQL higher-order-function formulation it
  * replaces (pinned by SimHash64Spec):
  * {{{
  * aggregate(transform(sequence(0, 63), i ->
  *   IF(aggregate(split(lower(text), '\\s+'), 0L, (acc, t) ->
  *        acc + IF((shiftright(xxhash64(t), i) & 1) = 1, 1L, -1L)) > 0,
  *      shiftleft(1L, i), 0L)), 0L, (a, b) -> a | b)
  * }}}
  * including that form's exact `split` semantics: NO trim and NO
  * empty-token filter, so a leading run of whitespace contributes one
  * empty-string token, a trailing run contributes another, and the
  * empty document is the single token `""` (Java `split` with
  * unlimited limit). Those empties hash like any token and flip real
  * bits — dropping them silently would change every signature.
  *
  * Why it exists: the HOF form evaluates INTERPRETED, re-splitting and
  * re-hashing per bit — O(64 · tokens) regex/allocation work per row.
  * This expression is O(tokens) in one compiled loop; SimHash is the
  * per-row cost of the whole simHashPairs pipeline at 100 TB.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 needs string, got ${other.sql}")
    }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.SimHash64.compute($s)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {

  private def isWs(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0D)

  /** Shared by the interpreted path, the generated code, and the
    * spec's reference comparison.
    */
  def compute(s: UTF8String): Long = {
    val b = s.toLowerCase().getBytes
    val n = b.length
    val counts = new Array[Int](64)
    def addToken(off: Int, len: Int): Unit = {
      val h = XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET + off, len, 42L)
      var i = 0
      while (i < 64) {
        counts(i) += (if (((h >>> i) & 1L) == 1L) 1 else -1)
        i += 1
      }
    }
    if (n == 0) addToken(0, 0) // split("") = [""]
    else {
      if (isWs(b(0))) addToken(0, 0) // leading separator -> one empty token
      var i = 0
      while (i < n) {
        while (i < n && isWs(b(i))) i += 1
        val start = i
        while (i < n && !isWs(b(i))) i += 1
        if (i > start) addToken(start, i - start)
      }
      if (isWs(b(n - 1))) addToken(0, 0) // trailing separator -> one empty token
    }
    var r = 0L
    var i = 0
    while (i < 64) { if (counts(i) > 0) r |= (1L << i); i += 1 }
    r
  }
}
