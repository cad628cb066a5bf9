package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd space-joined word n-grams over a token array: one window
  * walk with per-window byte concatenation, replacing the interpreted
  * `transform(sequence(…), i -> concat_ws(" ", element_at(t, i)…))`
  * lambda that re-evaluates 2n+2 positional lookups per gram.
  * Bit-identical (values and order) to the declarative forms in
  * `TextAnalysis.ngramsOfTokens` / `Contamination
  * .distinctNGramsOfTokens` — WordNGramsSpec pins both, since the
  * contamination and n-gram-LM oracles mirror them.
  *
  * `distinct = false` keeps the multiset (n-gram counting);
  * `distinct = true` keeps first occurrences (set joins). Null
  * elements are skipped like `concat_ws` skips null arguments. Fewer than
  * `n` tokens yields the empty array (both declarative forms clamp
  * that way).
  */
case class WordNGrams(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {
  require(n >= 1, s"n must be positive, got $n")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"word_ngrams needs array<string>, got ${other.sql}")
    }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_ngrams"

  override def nullSafeEval(input: Any): Any =
    WordNGrams.compute(input.asInstanceOf[ArrayData], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, arr =>
      s"graft.functions.WordNGrams.compute($arr, $n, $distinct)")

  override protected def withNewChildInternal(newChild: Expression): WordNGrams =
    copy(child = newChild)
}

object WordNGrams {

  private val Space = UTF8String.fromString(" ")

  /** Shared by the interpreted path, the generated code, and the
    * spec's reference comparison.
    */
  def compute(arr: ArrayData, n: Int, distinct: Boolean): GenericArrayData = {
    val size = arr.numElements()
    if (size < n) return new GenericArrayData(Array.empty[Any])
    val count = size - n + 1
    val toks = new Array[UTF8String](size)
    var i = 0
    while (i < size) { toks(i) = arr.getUTF8String(i); i += 1 }
    if (!distinct) {
      val out = new Array[Any](count)
      var w = 0
      while (w < count) {
        out(w) = gram(toks, w, n)
        w += 1
      }
      new GenericArrayData(out)
    } else {
      val seen = new java.util.LinkedHashSet[UTF8String](count * 2)
      var w = 0
      while (w < count) {
        seen.add(gram(toks, w, n))
        w += 1
      }
      new GenericArrayData(seen.toArray)
    }
  }

  // null elements are skipped exactly like concat_ws skips null
  // arguments (token arrays from the tokenizers never carry them)
  private def gram(toks: Array[UTF8String], from: Int, n: Int): UTF8String =
    if (n == 1 && toks(from) != null) toks(from)
    else {
      val window = new Array[UTF8String](n)
      var i = 0; var m = 0
      while (i < n) {
        if (toks(from + i) != null) { window(m) = toks(from + i); m += 1 }
        i += 1
      }
      UTF8String.concatWs(Space, window.take(m): _*)
    }
}
