package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** ORIGINAL-SPACE siblings of [[DropDupSpans]]: the published dedup
  * operators (Lee et al. 2022 §4; Raffel et al. 2020 §2.2) excise
  * duplicated spans from the ORIGINAL text — an exported cleaned
  * corpus must keep its casing and layout, not the lowercased
  * single-space-joined normalization the decision tier works in.
  * These kernels take the RAW text plus the span starts computed on
  * the normalized tokens/sentences (token and sentence INDEXING is
  * identical in both spaces — lowercasing moves no character into or
  * out of the whitespace class, and whitespace collapse moves no
  * boundary — so the decision tier's starts apply verbatim) and
  * re-walk the raw bytes:
  *
  *   - a kept run is emitted VERBATIM from its first token's (or
  *     sentence's) first byte to its last token's (sentence's) last
  *     byte — interior casing, tabs, and multi-space gaps survive
  *     exactly;
  *   - each excised region collapses to ONE space between runs
  *     (leading/trailing whitespace of the document goes with its
  *     excised neighbor; a fully-excised document emits '');
  *   - the six ASCII whitespace bytes are the token delimiters
  *     ([[WhitespaceTokens]]'s set — in UTF-8 they never appear as
  *     continuation bytes, so the scan is a straight byte loop).
  *
  * One pass per document, O(bytes + spans), inside whole-stage
  * codegen — same cost shape as the normalized kernel.
  */
case class DropDupSpansRaw(left: Expression, right: Expression,
                           n: Int, minRun: Int)
    extends BinaryExpression {

  require(n >= 2, s"span gram size must be >= 2, got $n")
  require(minRun >= 1, s"minRun must be >= 1, got $minRun")

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case StringType => right.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs array<bigint> span starts, got ${other.sql}")
    }
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string text column, got ${other.sql}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("cleaned", StringType, nullable = false),
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_kept", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "drop_dup_spans_raw"

  override def nullSafeEval(text: Any, starts: Any): Any =
    DropDupSpansRaw.compute(text.asInstanceOf[UTF8String],
      starts.asInstanceOf[ArrayData], n, minRun)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (text, starts) =>
      s"graft.functions.DropDupSpansRaw.compute($text, $starts, $n, $minRun)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DropDupSpansRaw =
    copy(left = newLeft, right = newRight)
}

object DropDupSpansRaw {
  private def isWs(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0D)

  /** Shared by interpreted eval and generated code. `starts` sorted
    * ascending (token indices in the shared token indexing).
    */
  def compute(text: UTF8String, starts: ArrayData,
              n: Int, minRun: Int): InternalRow = {
    val b = text.getBytes
    val len = b.length
    val ns = starts.numElements()
    val out = new java.io.ByteArrayOutputStream(len min 256)
    var i = 0
    var p = 0L          // token index (identical in both spaces)
    var nTokens = 0L
    var kept = 0L
    var si = 0
    var coverEnd = 0L   // exclusive end of the span union seen so far
    var runStartByte = -1
    var runLen = 0L
    var lastTokenEnd = -1
    def flush(): Unit = {
      if (runLen >= minRun) {
        if (out.size() > 0) out.write(' ')
        out.write(b, runStartByte, lastTokenEnd - runStartByte)
        kept += runLen
      }
      runLen = 0L
      runStartByte = -1
    }
    while (i < len) {
      while (i < len && isWs(b(i))) i += 1
      if (i < len) {
        val tokStart = i
        while (i < len && !isWs(b(i))) i += 1
        while (si < ns && starts.getLong(si) <= p) {
          val e = starts.getLong(si) + n
          if (e > coverEnd) coverEnd = e
          si += 1
        }
        if (p < coverEnd) flush() // masked token: close any open run
        else {
          if (runLen == 0L) runStartByte = tokStart
          runLen += 1L
          lastTokenEnd = i
        }
        p += 1L
        nTokens += 1L
      }
    }
    flush()
    new GenericInternalRow(Array[Any](
      UTF8String.fromBytes(out.toByteArray), nTokens, kept))
  }
}

/** Sentence-granular sibling of [[DropDupSpansRaw]] for the C4 tier:
  * segments the RAW text with the byte-walk equivalent of
  * [[graft.operators.TextAnalysis.sentences]] (break after `.` `!`
  * `?` followed by whitespace with more content beyond it; the final
  * sentence ends at the last non-whitespace byte) and excises the
  * union of `[start, start + spanLen)` SENTENCE spans, emitting kept
  * sentence runs verbatim from the raw bytes, runs joined by one
  * space.
  *
  * Indexing equivalence with the normalized segmenter (the decision
  * tier computes starts there): whitespace collapse maps every
  * original whitespace RUN to one space and lowercasing moves no
  * byte across the `[.!?]`/whitespace classes, so "punctuation
  * followed by whitespace-run followed by content" breaks at the
  * same ordinals in both spaces, and the normalized pipeline's
  * empty-filter never fires (a split segment always starts with its
  * break's punctuation char; leading/trailing whitespace is
  * trimmed). RawSentenceSpansSpec pins the count equality on the
  * adversarial shapes (`a.b`, `. .`, trailing punctuation, multi-ws
  * gaps).
  */
case class DropDupSentenceSpansRaw(left: Expression, right: Expression,
                                   spanLen: Int)
    extends BinaryExpression {

  require(spanLen >= 2, s"sentence span length must be >= 2, got $spanLen")

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case StringType => right.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs array<bigint> span starts, got ${other.sql}")
    }
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string text column, got ${other.sql}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("cleaned", StringType, nullable = false),
    StructField("n_sentences", LongType, nullable = false),
    StructField("n_kept", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "drop_dup_sentence_spans_raw"

  override def nullSafeEval(text: Any, starts: Any): Any =
    DropDupSentenceSpansRaw.compute(text.asInstanceOf[UTF8String],
      starts.asInstanceOf[ArrayData], spanLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (text, starts) =>
      s"graft.functions.DropDupSentenceSpansRaw.compute($text, $starts, $spanLen)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DropDupSentenceSpansRaw =
    copy(left = newLeft, right = newRight)
}

object DropDupSentenceSpansRaw {
  private def isWs(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0D)
  private def isBreakPunct(b: Byte): Boolean =
    b == '.' || b == '!' || b == '?'

  def compute(text: UTF8String, starts: ArrayData,
              spanLen: Int): InternalRow = {
    val b = text.getBytes
    val len = b.length
    val ns = starts.numElements()
    val out = new java.io.ByteArrayOutputStream(len min 256)
    var kept = 0L
    var nSents = 0L
    var si = 0
    var coverEnd = 0L
    var runStartByte = -1
    var runLen = 0L
    var lastSentEnd = -1 // byte AFTER the last byte of the run's last sentence
    def flush(): Unit = {
      if (runLen > 0L) {
        if (out.size() > 0) out.write(' ')
        out.write(b, runStartByte, lastSentEnd - runStartByte)
        kept += runLen
      }
      runLen = 0L
      runStartByte = -1
    }
    def emit(sentStart: Int, sentEnd: Int): Unit = {
      val p = nSents
      while (si < ns && starts.getLong(si) <= p) {
        val e = starts.getLong(si) + spanLen
        if (e > coverEnd) coverEnd = e
        si += 1
      }
      if (p < coverEnd) flush()
      else {
        if (runLen == 0L) runStartByte = sentStart
        runLen += 1L
        lastSentEnd = sentEnd
      }
      nSents += 1L
    }
    var i = 0
    while (i < len && isWs(b(i))) i += 1
    var sentStart = i
    var lastNonWs = -1
    while (i < len) {
      if (!isWs(b(i))) {
        lastNonWs = i
        if (isBreakPunct(b(i)) && i + 1 < len && isWs(b(i + 1))) {
          // boundary only if content follows the whitespace run —
          // trailing "end. " stays one sentence, like the trimmed
          // normalized form
          var j = i + 1
          while (j < len && isWs(b(j))) j += 1
          if (j < len) {
            emit(sentStart, i + 1)
            sentStart = j
            lastNonWs = -1
            i = j
          } else i = len
        } else i += 1
      } else i += 1
    }
    if (lastNonWs >= sentStart) emit(sentStart, lastNonWs + 1)
    flush()
    new GenericInternalRow(Array[Any](
      UTF8String.fromBytes(out.toByteArray), nSents, kept))
  }
}
