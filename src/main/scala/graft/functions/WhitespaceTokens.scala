package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd whitespace tokenizer: the lowercased non-whitespace runs
  * of a string, bit-identical to the declarative form
  * `filter(split(lower(trim(c)), "\\s+"), t => t != "")` that every
  * text operator tokenizes with.
  *
  * Why it's identical: Java-regex `\s` is exactly the six ASCII bytes
  * {TAB..CR, SPACE}; splitting on `\s+` and dropping empty strings
  * yields precisely the maximal non-whitespace runs (the leading empty
  * element from `split` and the `[""]` of an empty input are what the
  * filter removes, and `trim` — which strips 0x20 only — is subsumed).
  * Lowercasing commutes with the split because no character lowercases
  * into or out of the whitespace set, so `lower` on the whole string
  * before scanning equals `lower` per token. In UTF-8 the six
  * whitespace bytes only ever appear as single-byte code points
  * (continuation bytes are >= 0x80), so the scan is a straight byte
  * loop.
  *
  * Why it exists: the regex form runs a compiled-NFA `Pattern.split`
  * over every character of the corpus, and at 100 TB the tokenizer IS
  * the text pipeline's hot loop (q18 spends its whole budget there).
  * This expression does one `toLowerCase` pass plus one byte scan, no
  * NFA, no per-token regex machinery, and all tokens share the single
  * lowered byte array. WhitespaceTokensSpec pins bit-equality against
  * the regex form (ASCII, Unicode, all-whitespace, empty, mixed).
  */
case class WhitespaceTokens(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"whitespace_tokens needs string, got ${other.sql}")
    }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "whitespace_tokens"

  override def nullSafeEval(input: Any): Any =
    WhitespaceTokens.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // one static-dispatch call into the shared tight loop — stays inside
    // whole-stage codegen (no virtual calls, no interpreted lambdas)
    defineCodeGen(ctx, ev, s =>
      s"graft.functions.WhitespaceTokens.compute($s)")

  override protected def withNewChildInternal(newChild: Expression): WhitespaceTokens =
    copy(child = newChild)
}

object WhitespaceTokens {

  private def isWs(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0D)

  /** Shared by the interpreted path, the generated code, and the spec's
    * reference comparison. Java-friendly static entry point.
    */
  def compute(s: UTF8String): GenericArrayData = {
    // lower() under the default UTF8_BINARY collation is
    // UTF8String.toLowerCase — same call, bit-identical bytes
    val lowered = s.trim().toLowerCase()
    val b = lowered.getBytes
    val n = b.length
    val out = new java.util.ArrayList[AnyRef](8)
    var i = 0
    while (i < n) {
      while (i < n && isWs(b(i))) i += 1
      val start = i
      while (i < n && !isWs(b(i))) i += 1
      if (i > start) out.add(UTF8String.fromBytes(b, start, i - start))
    }
    new GenericArrayData(out.toArray)
  }
}
