package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd vector primitives over embedding columns
  * (`array<float>`/`array<double>`).
  *
  * Semantically identical to the SQL higher-order-function forms in
  * `graft.operators.Similarity` (same element order, same double
  * accumulation — bit-reproducible against the DuckDB oracle), but HOFs
  * evaluate interpreted lambdas per element; these expressions stay
  * inside whole-stage codegen and run the loops compiled. For exact
  * top-k over a large corpus the cosine is THE inner loop — corpus ×
  * queries × dim multiply-adds — so interpreted-vs-compiled here is the
  * difference between engine-bound and scan-bound similarity search.
  */
object VectorOps {
  private[functions] def elementGetter(dt: DataType, arr: String, i: String): String =
    dt match {
      case FloatType => s"(double) $arr.getFloat($i)"
      case DoubleType => s"$arr.getDouble($i)"
      case ByteType => s"(double) $arr.getByte($i)"
      case other => throw new IllegalStateException(s"unsupported element type $other")
    }

  private[functions] def checkVec(name: String, dt: DataType): TypeCheckResult = dt match {
    // byte arrays are the int8-quantized representation ([[Quantize8]]);
    // cosine over them needs no dequantization — the per-vector scale
    // cancels in the ratio
    case ArrayType(FloatType | DoubleType | ByteType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$name needs array<float>/array<double>/array<tinyint>, got ${other.sql}")
  }

  private[functions] def elemAt(dt: DataType, arr: ArrayData, i: Int): Double = dt match {
    case FloatType => arr.getFloat(i).toDouble
    case ByteType => arr.getByte(i).toDouble
    case _ => arr.getDouble(i)
  }
}

/** cosine(a, b) = dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b))), all
  * three sums accumulated in double in element order (one fused pass —
  * each accumulator is independent, so results are bit-identical to
  * three separate sequential sums).
  *
  * Null semantics mirror the zip_with/aggregate formulation: null if
  * either array is null, lengths differ, any element is null, or the
  * denominator is zero (Spark's Divide yields null on a zero divisor).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    VectorOps.checkVec(prettyName, left.dataType) match {
      case TypeCheckResult.TypeCheckSuccess => VectorOps.checkVec(prettyName, right.dataType)
      case fail => fail
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cosine_similarity"

  @transient private lazy val leftElem =
    left.dataType.asInstanceOf[ArrayType].elementType
  @transient private lazy val rightElem =
    right.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = VectorOps.elemAt(leftElem, a, i)
      val y = VectorOps.elemAt(rightElem, b, i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = Math.sqrt(na) * Math.sqrt(nb)
    if (denom == 0.0) null else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val denom = ctx.freshName("denom")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) { ${ev.isNull} = true; } else {
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $x = ${VectorOps.elementGetter(leftElem, a, i)};
         |    double $y = ${VectorOps.elementGetter(rightElem, b, i)};
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  if (!${ev.isNull}) {
         |    double $denom = Math.sqrt($na) * Math.sqrt($nb);
         |    if ($denom == 0.0) { ${ev.isNull} = true; }
         |    else { ${ev.value} = $dot / $denom; }
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Exact integer dot product over `array<long>`/`array<int>` — the
  * verify inner loop of the PORTABLE (integer-arithmetic) similarity
  * operators. Semantically identical to
  * `aggregate(zip_with(a, b, (x, y) -> x*y), 0L, (acc, v) -> acc+v)`
  * on equal-length, non-null arrays, but HOFs evaluate interpreted
  * lambdas per element; per candidate PAIR that is dim interpreted
  * calls where this runs one compiled loop. Null if either array is
  * null, lengths differ, or any element is null.
  */
case class LongDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  private def checkIntVec(dt: DataType): TypeCheckResult = dt match {
    case ArrayType(LongType | IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<bigint>/array<int>, got ${other.sql}")
  }
  override def checkInputDataTypes(): TypeCheckResult =
    checkIntVec(left.dataType) match {
      case TypeCheckResult.TypeCheckSuccess => checkIntVec(right.dataType)
      case fail => fail
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "long_dot_product"

  private def getter(dt: DataType, arr: String, i: String): String =
    dt.asInstanceOf[ArrayType].elementType match {
      case IntegerType => s"(long) $arr.getInt($i)"
      case _ => s"$arr.getLong($i)"
    }
  private def get(dt: DataType, arr: ArrayData, i: Int): Long =
    dt.asInstanceOf[ArrayType].elementType match {
      case IntegerType => arr.getInt(i).toLong
      case _ => arr.getLong(i)
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += get(left.dataType, a, i) * get(right.dataType, b, i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) { ${ev.isNull} = true; } else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ${getter(left.dataType, a, i)} * ${getter(right.dataType, b, i)};
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongDotProduct =
    copy(left = newLeft, right = newRight)
}

/** Symmetric per-vector int8 scalar quantization:
  * q[i] = round(127 * v[i] / max|v|), clamped to [-127, 127] — the
  * standard embedding-compression step that cuts vector storage and
  * shuffle bytes 4× (float32 → int8). COSINE ranking needs no
  * dequantization: the per-vector scale cancels in the ratio, so
  * [[CosineSimilarity]] accepts the byte arrays directly. An all-zero
  * vector quantizes to all zeros (its cosine is null downstream, as
  * with the float form). A vector containing NaN or ±Infinity
  * quantizes to NULL — silently mapping non-finite elements to 0 (or
  * zeroing every OTHER element, when an Inf becomes the scale) would
  * make quantized ranking silently diverge from exact ranking on
  * exactly the malformed vectors a pipeline most needs to notice.
  */
case class Quantize8(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs array<float>/array<double>, got ${other.sql}")
    }
  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "quantize8"

  @transient private lazy val elem =
    child.dataType.asInstanceOf[ArrayType].elementType

  /** Shared by interpreted and generated paths (the loop is quantization
    * itself, not a per-row hot path worth inlining further).
    */
  def quantize(arr: ArrayData): Any = {
    val n = arr.numElements()
    var mx = 0.0
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val v = Math.abs(VectorOps.elemAt(elem, arr, i))
      if (java.lang.Double.isNaN(v) || java.lang.Double.isInfinite(v)) return null
      if (v > mx) mx = v
      i += 1
    }
    val out = new Array[Byte](n)
    if (mx > 0.0) {
      i = 0
      while (i < n) {
        val q = Math.rint(127.0 * VectorOps.elemAt(elem, arr, i) / mx)
        out(i) = Math.max(-127.0, Math.min(127.0, q)).toByte
        i += 1
      }
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    quantize(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("quantize8", this, classOf[Quantize8].getName)
    nullSafeCodeGen(ctx, ev, arr => {
      val res = ctx.freshName("res")
      s"""
         |Object $res = $self.quantize($arr);
         |if ($res == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $res; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Quantize8 =
    copy(child = newChild)
}

/** Sign-bit LSH sketch of `planes` random hyperplanes (hash table
  * `salt`): bit j is set iff the dot product of the vector with
  * hyperplane j is strictly positive. Hyperplane components are
  * deterministic ±1 weights derived from xxhash64("plane-salt-j-d") —
  * the exact scheme of the SQL formulation this replaces, so buckets
  * are bit-identical — but the weight matrix is computed ONCE per
  * (executor, dimension) and reused, where the HOF form re-hashed
  * (planes × dim) strings per row.
  */
case class HyperplaneSketch(child: Expression, planes: Int, salt: Int)
    extends UnaryExpression {
  require(planes >= 1 && planes <= 63, s"planes must be in [1,63], got $planes")

  override def checkInputDataTypes(): TypeCheckResult =
    VectorOps.checkVec(prettyName, child.dataType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hyperplane_sketch"

  @transient private lazy val elem =
    child.dataType.asInstanceOf[ArrayType].elementType

  /** ±1 weight rows, built lazily for the first seen dimension and
    * reused (embedding dim is constant per dataset; benign race —
    * rebuilds are idempotent). Called from generated code.
    */
  @transient private var wCache: Array[Array[Double]] = _
  def weightsFor(dim: Int): Array[Array[Double]] = {
    var w = wCache
    if (w == null || w(0).length < dim) {
      w = HyperplaneSketch.buildWeights(planes, salt, dim)
      wCache = w
    }
    w
  }

  /** Element getter for generated code (float vs double arrays). */
  def isFloat: Boolean = elem == FloatType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val w = weightsFor(n)
    var bucket = 0L
    var j = 0
    while (j < planes) {
      var acc = 0.0; var d = 0; var sawNull = false
      while (d < n && !sawNull) {
        if (arr.isNullAt(d)) sawNull = true
        else { acc += VectorOps.elemAt(elem, arr, d) * w(j)(d); d += 1 }
      }
      // null element => null dot => IF(null > 0, bit, 0) takes the else
      // branch in the SQL form: bit stays unset
      if (!sawNull && acc > 0.0) bucket |= 1L << j
      j += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("sketch", this, classOf[HyperplaneSketch].getName)
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val w = ctx.freshName("w")
      val wj = ctx.freshName("wj")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      val bucket = ctx.freshName("bucket")
      val sawNull = ctx.freshName("sawNull")
      s"""
         |int $n = $arr.numElements();
         |double[][] $w = $self.weightsFor($n);
         |long $bucket = 0L;
         |for (int $j = 0; $j < $planes; $j++) {
         |  double[] $wj = $w[$j];
         |  double $acc = 0.0;
         |  boolean $sawNull = false;
         |  for (int $d = 0; $d < $n; $d++) {
         |    if ($arr.isNullAt($d)) { $sawNull = true; break; }
         |    $acc += ${VectorOps.elementGetter(elem, arr, d)} * $wj[$d];
         |  }
         |  if (!$sawNull && $acc > 0.0) $bucket |= 1L << $j;
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSketch =
    copy(child = newChild)
}

object HyperplaneSketch {
  /** xxhash64 (seed 42, same as SQL xxhash64) of a string's UTF-8 bytes. */
  private def sqlXxhash64(s: String): Long = {
    val u = UTF8String.fromString(s)
    XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
  }

  /** weights(j)(d) = +1 if xxhash64("plane-salt-j-d") is even else -1 —
    * matching IF(pmod(xxhash64(concat('plane-salt-', j, '-', d)), 2) = 0,
    * 1.0D, -1.0D) in the SQL formulation.
    */
  def buildWeights(planes: Int, salt: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(planes, dim) { (j, d) =>
      if (Math.floorMod(sqlXxhash64(s"plane-$salt-$j-$d"), 2L) == 0L) 1.0 else -1.0
    }
}
