package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `drop_dup_spans(toks, starts)` → struct<cleaned: string, n_kept:
  * bigint> — the per-document half of exact substring-level dedup
  * REMOVAL (Lee et al. 2022, "Deduplicating Training Data Makes
  * Language Models Better"): given a document's token array and the
  * SORTED start positions of its corpus-wide-duplicated n-grams,
  * emit the text that SURVIVES removing the union of the spans
  * `[start, start+n)`, with a minimum-surviving-run guard: EVERY
  * surviving run shorter than `minRun` tokens is dropped — runs
  * sandwiched between removed spans (boilerplate shrapnel), runs at
  * document boundaries, and a whole clean document shorter than
  * `minRun` alike. Callers that want short clean documents untouched
  * pass `minRun = 1` (the default upstream).
  *
  * ONE pass over the tokens (the PqEncodeCodes/TemporalDHash
  * precedent): a two-pointer walk advances the span cursor and the
  * union cover end together, buffers each clean run, and flushes runs
  * ≥ minRun into the output joined by single spaces — O(n_tokens +
  * n_spans) per document, no quadratic membership probe, no
  * per-position shuffle.
  *
  * Contract: `starts` sorted ascending (the caller's
  * `sort_array(collect_list(pos))`), non-null elements in both arrays;
  * a NULL operand yields NULL (callers coalesce "no duplicated spans"
  * to an empty array).
  */
case class DropDupSpans(left: Expression, right: Expression,
                        n: Int, minRun: Int)
    extends BinaryExpression {

  require(n >= 2, s"span gram size must be >= 2, got $n")
  require(minRun >= 1, s"minRun must be >= 1, got $minRun")

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case ArrayType(StringType, _) => right.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs array<bigint> span starts, got ${other.sql}")
    }
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<string> tokens, got ${other.sql}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("cleaned", StringType, nullable = false),
    StructField("n_kept", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "drop_dup_spans"

  override def nullSafeEval(toks: Any, starts: Any): Any =
    DropDupSpans.compute(toks.asInstanceOf[ArrayData],
      starts.asInstanceOf[ArrayData], n, minRun)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (toks, starts) =>
      s"graft.functions.DropDupSpans.compute($toks, $starts, $n, $minRun)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DropDupSpans =
    copy(left = newLeft, right = newRight)
}

object DropDupSpans {
  /** Shared by interpreted eval and generated code (static call keeps
    * the projection inside whole-stage codegen).
    */
  def compute(toks: ArrayData, starts: ArrayData,
              n: Int, minRun: Int): InternalRow = {
    val nt = toks.numElements()
    val ns = starts.numElements()
    val sb = new java.lang.StringBuilder
    var kept = 0L
    var si = 0
    var coverEnd = 0L // exclusive end of the span union seen so far
    var runStart = 0
    var runLen = 0
    def flush(): Unit = {
      if (runLen >= minRun) {
        var i = runStart
        while (i < runStart + runLen) {
          if (sb.length > 0) sb.append(' ')
          sb.append(toks.getUTF8String(i).toString)
          i += 1
        }
        kept += runLen
      }
      runLen = 0
    }
    var p = 0
    while (p < nt) {
      while (si < ns && starts.getLong(si) <= p) {
        val e = starts.getLong(si) + n
        if (e > coverEnd) coverEnd = e
        si += 1
      }
      if (p < coverEnd) flush() // masked position: close any open run
      else {
        if (runLen == 0) runStart = p
        runLen += 1
      }
      p += 1
    }
    flush()
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(sb.toString), kept))
  }
}
