package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd product-quantization kernels — the two corpus-sized inner
  * loops of the PQ/IVF×PQ index ([[graft.operators.Similarity]]):
  * ENCODE (every vector → m nearest-subcentroid codes: m·numCodes·dsub
  * multiply-adds per row — the index-BUILD hot loop) and ADC SCORING
  * (every candidate row → m table lookups — the index-QUERY hot loop).
  * Both are semantically identical to the SQL higher-order-function
  * forms kept in `Similarity.pqCodesHof` (same j-ascending double
  * accumulation, same first-minimum tie-break to the lowest code;
  * PqOpsSpec pins bit-equality), but the HOFs evaluate an interpreted
  * lambda per element while these stay inside whole-stage codegen —
  * the LongDotProduct/PlaneDots precedent applied to the PQ tier.
  *
  * Contract: finite, non-null vector elements; a vector whose length
  * differs from m·dsub (or a null element) yields NULL rather than a
  * partial encode.
  */
object PqOps

/** `pq_encode(vec)` → array<int> of the m nearest-subcentroid codes
  * (exact L2 argmin per dsub-wide subspace, ties to the lowest code).
  * The codebook rides along as a flat literal reference — kilobytes,
  * embedded in the generated class, no join and no broadcast needed.
  */
case class PqEncodeCodes(child: Expression,
                         codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {

  private val m = codebooks.length
  private val numCodes = codebooks.head.length
  private val dsub = codebooks.head.head.length
  require(m > 0 && numCodes > 0 && dsub > 0 &&
    codebooks.forall(sub => sub.length == numCodes &&
      sub.forall(_.length == dsub)),
    "codebooks must be a dense m x numCodes x dsub array")

  /** Flat [sub][code][j] layout for the codegen reference object. */
  private lazy val flatCb: Array[Double] = {
    val out = new Array[Double](m * numCodes * dsub)
    var o = 0
    var sub = 0
    while (sub < m) {
      var c = 0
      while (c < numCodes) {
        System.arraycopy(codebooks(sub)(c), 0, out, o, dsub); o += dsub
        c += 1
      }
      sub += 1
    }
    out
  }

  override def checkInputDataTypes(): TypeCheckResult =
    VectorOps.checkVec(prettyName, child.dataType) match {
      case TypeCheckResult.TypeCheckSuccess
          if child.dataType.asInstanceOf[ArrayType].elementType == ByteType =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs array<float>/array<double>, got tinyint elements")
      case r => r
    }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_encode"

  override def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData]
    if (vec.numElements() != m * dsub) return null
    var i = 0
    while (i < m * dsub) {
      if (vec.isNullAt(i)) return null
      i += 1
    }
    val et = child.dataType.asInstanceOf[ArrayType].elementType
    val codes = new Array[Int](m)
    var sub = 0
    while (sub < m) {
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < numCodes) {
        var s = 0.0
        var j = 0
        while (j < dsub) {
          val d = VectorOps.elemAt(et, vec, sub * dsub + j) -
            flatCb((sub * numCodes + c) * dsub + j)
          s += d * d
          j += 1
        }
        if (s < bestD) { bestD = s; best = c }
        c += 1
      }
      codes(sub) = best
      sub += 1
    }
    UnsafeArrayData.fromPrimitiveArray(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, vec => {
      val cb = ctx.addReferenceObj("pqFlatCb", flatCb, "double[]")
      val codes = ctx.freshName("codes")
      val sub = ctx.freshName("sub")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val hasNull = ctx.freshName("hasNull")
      val et = child.dataType.asInstanceOf[ArrayType].elementType
      val get = VectorOps.elementGetter(et, vec, s"$sub * $dsub + $j")
      s"""
         |if ($vec.numElements() != ${m * dsub}) { ${ev.isNull} = true; } else {
         |  boolean $hasNull = false;
         |  for (int $i = 0; $i < ${m * dsub}; $i++) {
         |    if ($vec.isNullAt($i)) { $hasNull = true; break; }
         |  }
         |  if ($hasNull) { ${ev.isNull} = true; } else {
         |    int[] $codes = new int[$m];
         |    for (int $sub = 0; $sub < $m; $sub++) {
         |      int $best = 0;
         |      double $bestD = Double.POSITIVE_INFINITY;
         |      for (int $c = 0; $c < $numCodes; $c++) {
         |        double $s = 0.0;
         |        for (int $j = 0; $j < $dsub; $j++) {
         |          double $d = $get - $cb[($sub * $numCodes + $c) * $dsub + $j];
         |          $s += $d * $d;
         |        }
         |        if ($s < $bestD) { $bestD = $s; $best = $c; }
         |      }
         |      $codes[$sub] = $best;
         |    }
         |    ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($codes);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqEncodeCodes =
    copy(child = newChild)
}

/** `pq_adc(lut, codes)` → Σ_sub lut[sub·numCodes + codes[sub]] — the
  * m-lookup ADC score of one candidate against one query's flattened
  * lookup table. Null on a malformed pair (lut size ≠ m·numCodes after
  * m = codes length, out-of-range code, or null elements).
  */
case class PqAdcScore(left: Expression, right: Expression, numCodes: Int)
    extends BinaryExpression {
  require(numCodes > 0, s"numCodes must be positive, got $numCodes")

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case ArrayType(DoubleType, _) => right.dataType match {
      case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs array<int> codes, got ${other.sql}")
    }
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<double> lut, got ${other.sql}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_adc"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val lut = l.asInstanceOf[ArrayData]
    val codes = r.asInstanceOf[ArrayData]
    val m = codes.numElements()
    if (lut.numElements() != m * numCodes) return null
    var acc = 0.0
    var sub = 0
    while (sub < m) {
      if (codes.isNullAt(sub)) return null
      val code = codes.getInt(sub)
      if (code < 0 || code >= numCodes) return null
      val idx = sub * numCodes + code
      if (lut.isNullAt(idx)) return null
      acc += lut.getDouble(idx)
      sub += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lut, codes) => {
      val m = ctx.freshName("m")
      val sub = ctx.freshName("sub")
      val code = ctx.freshName("code")
      val idx = ctx.freshName("idx")
      val acc = ctx.freshName("acc")
      s"""
         |int $m = $codes.numElements();
         |if ($lut.numElements() != $m * $numCodes) { ${ev.isNull} = true; } else {
         |  double $acc = 0.0;
         |  for (int $sub = 0; $sub < $m; $sub++) {
         |    if ($codes.isNullAt($sub)) { ${ev.isNull} = true; break; }
         |    int $code = $codes.getInt($sub);
         |    if ($code < 0 || $code >= $numCodes) { ${ev.isNull} = true; break; }
         |    int $idx = $sub * $numCodes + $code;
         |    if ($lut.isNullAt($idx)) { ${ev.isNull} = true; break; }
         |    $acc += $lut.getDouble($idx);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcScore =
    copy(left = newLeft, right = newRight)
}

/** `ivfpq_encode(vec)` → struct<cell: int, codes: array<int>> — the
  * fused IVF×PQ index-BUILD kernel: the coarse cell (exact L2 argmin
  * over numCells full-dim centroids, ties to the lowest cell) and the
  * m PQ codes in ONE compiled pass per corpus row. With
  * `residual = true` the codes quantize v − centers(cell) — the
  * published IVF-PQ layout (Jégou et al. 2011; FAISS IndexIVFPQ),
  * where PQ spends its m·log₂(numCodes) bits on the within-cell
  * offset instead of re-encoding the cell position the index already
  * knows — the change that keeps recall up at high cell counts.
  * `residual = false` reproduces the raw-vector encode (the A/B
  * reference and the portable twin's algebra).
  *
  * Both constant tables ride along as flat reference objects —
  * kilobytes, no join, no broadcast. Null/length contract matches
  * [[PqEncodeCodes]]: a vector whose length differs from m·dsub (or a
  * null element) yields NULL rather than a partial encode.
  */
case class IvfPqEncode(child: Expression,
                       centers: Array[Array[Double]],
                       codebooks: Array[Array[Array[Double]]],
                       residual: Boolean)
    extends UnaryExpression {

  private val numCells = centers.length
  private val m = codebooks.length
  private val numCodes = codebooks.head.length
  private val dsub = codebooks.head.head.length
  private val dim = m * dsub
  require(m > 0 && numCodes > 0 && dsub > 0 &&
    codebooks.forall(sub => sub.length == numCodes &&
      sub.forall(_.length == dsub)),
    "codebooks must be a dense m x numCodes x dsub array")
  require(numCells > 0 && centers.forall(_.length == dim),
    s"centers must be a dense numCells x ${dim} array")

  private lazy val flatCenters: Array[Double] = {
    val out = new Array[Double](numCells * dim)
    var c = 0
    while (c < numCells) {
      System.arraycopy(centers(c), 0, out, c * dim, dim); c += 1
    }
    out
  }
  private lazy val flatCb: Array[Double] = {
    val out = new Array[Double](m * numCodes * dsub)
    var o = 0
    var sub = 0
    while (sub < m) {
      var c = 0
      while (c < numCodes) {
        System.arraycopy(codebooks(sub)(c), 0, out, o, dsub); o += dsub
        c += 1
      }
      sub += 1
    }
    out
  }

  override def checkInputDataTypes(): TypeCheckResult =
    VectorOps.checkVec(prettyName, child.dataType) match {
      case TypeCheckResult.TypeCheckSuccess
          if child.dataType.asInstanceOf[ArrayType].elementType == ByteType =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs array<float>/array<double>, got tinyint elements")
      case r => r
    }
  override def dataType: DataType = StructType(Seq(
    StructField("cell", IntegerType, nullable = false),
    StructField("codes", ArrayType(IntegerType, containsNull = false),
      nullable = false)))
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ivfpq_encode"

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any =
    IvfPqEncode.compute(input.asInstanceOf[ArrayData], isFloat,
      flatCenters, flatCb, m, numCodes, dsub, residual)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, vec => {
      val cRef = ctx.addReferenceObj("ivfFlatCenters", flatCenters, "double[]")
      val cbRef = ctx.addReferenceObj("pqFlatCb", flatCb, "double[]")
      val row = ctx.freshName("encRow")
      s"""
         |org.apache.spark.sql.catalyst.InternalRow $row =
         |  graft.functions.IvfPqEncode.compute($vec, $isFloat, $cRef, $cbRef,
         |    $m, $numCodes, $dsub, $residual);
         |if ($row == null) { ${ev.isNull} = true; } else { ${ev.value} = $row; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): IvfPqEncode =
    copy(child = newChild)
}

object IvfPqEncode {
  /** Shared by interpreted eval and generated code (static call keeps
    * the projection inside whole-stage codegen). Returns null on a
    * wrong-length vector or a null element.
    */
  def compute(vec: ArrayData, isFloat: Boolean,
              centers: Array[Double], cb: Array[Double],
              m: Int, numCodes: Int, dsub: Int,
              residual: Boolean): InternalRow = {
    val dim = m * dsub
    if (vec.numElements() != dim) return null
    val v = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      if (vec.isNullAt(i)) return null
      v(i) = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
      i += 1
    }
    val numCells = centers.length / dim
    var bestCell = 0
    var bestD = Double.PositiveInfinity
    var c = 0
    while (c < numCells) {
      var s = 0.0
      var j = 0
      while (j < dim) {
        val d = v(j) - centers(c * dim + j)
        s += d * d
        j += 1
      }
      if (s < bestD) { bestD = s; bestCell = c }
      c += 1
    }
    if (residual) {
      var j = 0
      while (j < dim) { v(j) -= centers(bestCell * dim + j); j += 1 }
    }
    val codes = new Array[Int](m)
    var sub = 0
    while (sub < m) {
      var best = 0
      var bd = Double.PositiveInfinity
      var cc = 0
      while (cc < numCodes) {
        var s = 0.0
        var j = 0
        while (j < dsub) {
          val d = v(sub * dsub + j) - cb((sub * numCodes + cc) * dsub + j)
          s += d * d
          j += 1
        }
        if (s < bd) { bd = s; best = cc }
        cc += 1
      }
      codes(sub) = best
      sub += 1
    }
    new GenericInternalRow(Array[Any](bestCell,
      UnsafeArrayData.fromPrimitiveArray(codes)))
  }
}

/** `rotate_vec(vec)` → array<double>: `out[i] = Σ_j R[i][j]·vec[j]` —
  * the OPQ pre-transform (Ge et al. 2013, "Optimized Product
  * Quantization"; FAISS OPQMatrix): an orthonormal rotation learned
  * driver-side on the bounded fit sample and embedded as a flat
  * literal (d² doubles — 32 KB at d = 64), applied per corpus/query
  * row BEFORE IVF cell assignment and PQ encoding. A rotation
  * preserves dot products and L2 distances, so every downstream
  * scoring identity (residual decomposition, ADC LUT, center offsets)
  * holds unchanged in rotated space; only the final cosine rescore
  * uses the original vectors. d·d multiply-adds per row, inside
  * whole-stage codegen — the same order as the PQ encode it feeds.
  *
  * Contract: vector length must equal d and elements non-null, else
  * NULL (the PqEncodeCodes rule).
  */
case class RotateVec(child: Expression, matrix: Array[Array[Double]])
    extends UnaryExpression {

  private val d = matrix.length
  require(d > 0 && matrix.forall(_.length == d),
    s"rotation must be square, got ${matrix.map(_.length).toSeq} rows of $d")

  /** Row-major flat layout for the codegen reference object. */
  private lazy val flat: Array[Double] = {
    val out = new Array[Double](d * d)
    var i = 0
    while (i < d) { System.arraycopy(matrix(i), 0, out, i * d, d); i += 1 }
    out
  }

  override def checkInputDataTypes(): TypeCheckResult =
    VectorOps.checkVec(prettyName, child.dataType) match {
      case TypeCheckResult.TypeCheckSuccess
          if child.dataType.asInstanceOf[ArrayType].elementType == ByteType =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs array<float>/array<double>, got tinyint elements")
      case r => r
    }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "rotate_vec"

  override def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData]
    if (vec.numElements() != d) return null
    var i = 0
    while (i < d) {
      if (vec.isNullAt(i)) return null
      i += 1
    }
    val et = child.dataType.asInstanceOf[ArrayType].elementType
    val v = new Array[Double](d)
    i = 0
    while (i < d) { v(i) = VectorOps.elemAt(et, vec, i); i += 1 }
    val out = new Array[Double](d)
    i = 0
    while (i < d) {
      var s = 0.0
      var j = 0
      while (j < d) { s += flat(i * d + j) * v(j); j += 1 }
      out(i) = s
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, vec => {
      val r = ctx.addReferenceObj("opqRotation", flat, "double[]")
      val v = ctx.freshName("v")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val hasNull = ctx.freshName("hasNull")
      val et = child.dataType.asInstanceOf[ArrayType].elementType
      val get = VectorOps.elementGetter(et, vec, i)
      s"""
         |if ($vec.numElements() != $d) { ${ev.isNull} = true; } else {
         |  boolean $hasNull = false;
         |  for (int $i = 0; $i < $d; $i++) {
         |    if ($vec.isNullAt($i)) { $hasNull = true; break; }
         |  }
         |  if ($hasNull) { ${ev.isNull} = true; } else {
         |    double[] $v = new double[$d];
         |    for (int $i = 0; $i < $d; $i++) { $v[$i] = $get; }
         |    double[] $out = new double[$d];
         |    for (int $i = 0; $i < $d; $i++) {
         |      double $s = 0.0;
         |      for (int $j = 0; $j < $d; $j++) {
         |        $s += $r[$i * $d + $j] * $v[$j];
         |      }
         |      $out[$i] = $s;
         |    }
         |    ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RotateVec =
    copy(child = newChild)
}
