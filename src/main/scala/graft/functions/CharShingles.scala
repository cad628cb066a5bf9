package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd distinct character k-shingles: the set of every k-long
  * codepoint window of the text, first-occurrence order — identical to
  * the declarative form
  * `array_distinct(transform(sequence(1, greatest(length(t) - k + 1, 1)),
  * i -> substring(t, i, k)))` (CharShinglesSpec pins the equality,
  * including the short-text window `[whole text]` and the
  * empty-text `[""]` cases that the `greatest(…, 1)` clamp produces).
  *
  * Why it exists: SQL `substring` is codepoint-indexed and seeks from
  * the start of the string on every call, so the interpreted transform
  * is O(len²) PER DOCUMENT — the dominant cost of every MinHash
  * pipeline's signature stage. This expression walks the codepoint
  * boundaries once and slices byte windows, O(len · k) with one
  * compiled loop, deduplicating through a hash set as it goes.
  */
case class CharShingles(child: Expression, k: Int) extends UnaryExpression {
  require(k > 0, s"shingle size must be positive, got $k")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"char_shingles needs string, got ${other.sql}")
    }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "char_shingles"

  override def nullSafeEval(input: Any): Any =
    CharShingles.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.CharShingles.compute($s, $k)")

  override protected def withNewChildInternal(newChild: Expression): CharShingles =
    copy(child = newChild)
}

/** Codegen'd NON-distinct character n-grams: every k-long codepoint
  * window of the text in order — identical to
  * `transform(sequence(1, greatest(length(t) - k + 1, 1)),
  * i -> substring(t, i, k))` (NaiveBayesTextSpec pins the equality,
  * clamp cases included: short text yields itself, empty yields "").
  * The multinomial-NB sibling of [[CharShingles]] (which dedups for
  * set-Jaccard): same one-codepoint-walk reason to exist — SQL
  * `substring` seeks from the string start per call, making the
  * interpreted transform O(len²) PER DOCUMENT, measured as ~26 s of
  * the q127/q128 gates at sf0.1 before this kernel.
  */
case class CharNGrams(child: Expression, k: Int) extends UnaryExpression {
  require(k > 0, s"n-gram size must be positive, got $k")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"char_ngrams needs string, got ${other.sql}")
    }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "char_ngrams"

  override def nullSafeEval(input: Any): Any =
    CharNGrams.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.CharNGrams.compute($s, $k)")

  override protected def withNewChildInternal(newChild: Expression): CharNGrams =
    copy(child = newChild)
}

object CharNGrams {

  /** Shared by the interpreted path and the generated code. */
  def compute(s: UTF8String, k: Int): GenericArrayData = {
    val b = s.getBytes
    val nBytes = b.length
    val starts = new Array[Int](s.numChars() + 1)
    var n = 0
    var i = 0
    while (i < nBytes) {
      starts(n) = i; n += 1
      i += UTF8String.numBytesForFirstByte(b(i))
    }
    starts(n) = nBytes
    // window count clamps at 1: short text yields itself, empty ""
    val count = math.max(n - k + 1, 1)
    val out = new Array[AnyRef](count)
    var w = 0
    while (w < count) {
      val from = starts(math.min(w, n))
      val until = starts(math.min(w + k, n))
      out(w) = UTF8String.fromBytes(b, from, until - from)
      w += 1
    }
    new GenericArrayData(out)
  }
}

object CharShingles {

  /** Shared by the interpreted path, the generated code, and the
    * spec's reference comparison.
    */
  def compute(s: UTF8String, k: Int): GenericArrayData = {
    val b = s.getBytes
    val nBytes = b.length
    // codepoint start offsets (+ end sentinel); UTF-8 lead bytes are
    // anything except 10xxxxxx continuations
    val starts = new Array[Int](s.numChars() + 1)
    var n = 0
    var i = 0
    while (i < nBytes) {
      starts(n) = i; n += 1
      i += UTF8String.numBytesForFirstByte(b(i))
    }
    starts(n) = nBytes
    // window count clamps at 1: short text yields itself, empty yields ""
    val count = math.max(n - k + 1, 1)
    val seen = new java.util.LinkedHashSet[UTF8String](count * 2)
    var w = 0
    while (w < count) {
      val from = starts(math.min(w, n))
      val until = starts(math.min(w + k, n))
      seen.add(UTF8String.fromBytes(b, from, until - from))
      w += 1
    }
    new GenericArrayData(seen.toArray)
  }
}
