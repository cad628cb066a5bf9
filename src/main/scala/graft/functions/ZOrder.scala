package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.graftshim.ColumnExpr
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** True multi-dimensional z-order clustering support.
  *
  * `VintageTable.cluster` used to range-partition + sort
  * lexicographically on the clustering columns, which keeps min/max
  * ranges tight on the FIRST column only — a predicate on the second
  * clustering column alone scanned every file. The z-value fixes that:
  * each clustering column is projected to an order-preserving double,
  * bucketed against sampled quantile boundaries (so skew cannot
  * concentrate the curve), and the bucket bits of all columns are
  * interleaved MSB-first into one long. Sorting by that long lays rows
  * on a space-filling curve: every file covers a compact hyper-box, so
  * min/max file stats stay tight on EVERY clustered dimension
  * (reference capability: sdlt README's single-column sort; the
  * multi-dimension generalization is what 100 TB pruning needs).
  *
  * All per-row work is codegen'd Catalyst expressions — the only
  * driver-side step is the one-pass `approxQuantile` boundary fit.
  */
object ZOrder {

  /** Collision-proof temp column name (a user column literally named
    * `__zval` or `__zn_0` must survive clustering untouched).
    */
  def tempName(prefix: String): String =
    s"${prefix}_${java.util.UUID.randomUUID().toString.take(8)}"

  /** Order-preserving projection of an orderable column to double.
    * Strings map through their first 8 UTF-8 bytes (big-endian,
    * unsigned) — lexicographic order is preserved to 8-byte prefix
    * precision, which is what boundary bucketing needs.
    */
  def normalized(c: Column, dt: DataType): Column = dt match {
    case StringType => ColumnExpr.column(StringOrderPrefix(ColumnExpr.expr(c)))
    case BooleanType => c.cast("int").cast("double")
    // dates/timestamps cannot cast to long directly — go through the
    // dedicated epoch functions (order-preserving integers)
    case DateType => org.apache.spark.sql.functions.unix_date(c).cast("double")
    case TimestampType => org.apache.spark.sql.functions.unix_micros(c).cast("double")
    case TimestampNTZType =>
      // session-independent arithmetic: a cast through TimestampType
      // applies the session zone, whose DST gaps invert ordering for
      // wall-times inside the gap. Day + time-of-day seconds keep the
      // NTZ order exactly (1s resolution is ample for bucketing).
      (org.apache.spark.sql.functions.unix_date(c.cast("date"))
          .cast("double") * 86400.0 +
        org.apache.spark.sql.functions.hour(c) * 3600.0 +
        org.apache.spark.sql.functions.minute(c) * 60.0 +
        org.apache.spark.sql.functions.second(c))
    case _: NumericType => c.cast("double")
    case other => throw new IllegalArgumentException(
      s"cannot z-order on type ${other.sql}")
  }

  /** The interleaved z-value column for `cols` of `df`.
    *
    * Boundaries come from one `approxQuantile` pass per call (all
    * columns in a single sketch job, bounded error 1/(4·buckets)), so
    * the curve adapts to the actual data distribution — equi-width
    * bucketing would collapse under skew. `bitsPerCol = 0` picks the
    * widest per-column resolution that still fits every column into
    * one 63-bit long (≤ 12 bits — 4096 buckets per dimension is ample
    * for file-level pruning: files ≪ buckets²).
    */
  def zValueColumn(df: DataFrame, cols: Seq[String], bitsPerCol: Int = 0): Column = {
    require(cols.nonEmpty, "z-order needs at least one column")
    val bits =
      if (bitsPerCol > 0) bitsPerCol
      else math.min(12, 63 / cols.size)
    require(bits * cols.size <= 63,
      s"${cols.size} columns × $bits bits exceed one long")
    val nb = 1 << bits
    val schema = df.schema
    val norm = cols.map(c => normalized(df(c), schema(c).dataType))
    val tmpNames = cols.indices.map(i => tempName(s"__zn_$i"))
    val withNorm = norm.zip(tmpNames).foldLeft(df) {
      case (d, (nc, n)) => d.withColumn(n, nc)
    }
    val probs = (1 until nb).map(_.toDouble / nb).toArray
    val bounds = withNorm.stat.approxQuantile(
      tmpNames.toArray, probs, 1.0 / (4.0 * nb))
    val buckets = norm.zip(bounds).map { case (nc, b) =>
      BoundaryBucket(ColumnExpr.expr(nc), b.distinct.sorted)
    }
    ColumnExpr.column(InterleaveBits(buckets, bits))
  }
}

private[graft] object ZOrderUtil {
  /** Bucket of `v` among sorted `boundaries`: the count of boundaries
    * <= v — 0 below the first, boundaries.length above the last.
    */
  def bucket(v: Double, boundaries: Array[Double]): Int = {
    val i = java.util.Arrays.binarySearch(boundaries, v)
    if (i >= 0) {
      // land on a boundary: step past equal boundaries (right-closed)
      var j = i + 1
      while (j < boundaries.length && boundaries(j) == v) j += 1
      j
    } else -(i + 1)
  }
}

/** First 8 UTF-8 bytes of a string as an unsigned big-endian integer,
  * widened to double — an order-preserving (to 8-byte prefix
  * precision) numeric projection used for z-order bucketing.
  */
case class StringOrderPrefix(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs string, got ${other.sql}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = child.nullable
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "string_order_prefix"

  override def nullSafeEval(input: Any): Any =
    StringOrderPrefix.prefixDouble(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.StringOrderPrefix.prefixDouble($c)")

  override protected def withNewChildInternal(newChild: Expression): StringOrderPrefix =
    copy(child = newChild)
}

object StringOrderPrefix {
  def prefixDouble(s: UTF8String): Double = {
    val bytes = s.getBytes
    var v = 0L
    var i = 0
    while (i < 8) {
      v = (v << 8) | (if (i < bytes.length) bytes(i) & 0xffL else 0L)
      i += 1
    }
    // unsigned 64-bit -> double, order-preserving
    2.0 * (v >>> 1).toDouble + (v & 1L)
  }
}

/** Bucket index of a double value against a fixed sorted boundary
  * array (binary search; boundaries ship to executors as a codegen
  * reference object). Output is in [0, boundaries.length].
  */
case class BoundaryBucket(child: Expression, boundaries: Array[Double])
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs double, got ${other.sql}")
  }
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "boundary_bucket"

  override def nullSafeEval(input: Any): Any =
    ZOrderUtil.bucket(input.asInstanceOf[Double], boundaries)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val b = ctx.addReferenceObj("boundaries", boundaries, "double[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.ZOrderUtil.bucket($c, $b)")
  }

  override protected def withNewChildInternal(newChild: Expression): BoundaryBucket =
    copy(child = newChild)
}

/** MSB-first bit interleave of `bits`-wide non-negative ints into one
  * long: output bit (numChildren·j + k) (from the top) is bit j (from
  * the top of `bits`) of child k — the classic Morton/z-curve encode,
  * generalized to N dimensions.
  */
case class InterleaveBits(children: Seq[Expression], bits: Int)
    extends Expression {
  require(children.nonEmpty && bits > 0 && bits * children.size <= 63,
    s"${children.size} children × $bits bits must fit in 63 bits")

  override def checkInputDataTypes(): TypeCheckResult =
    children.find(_.dataType != IntegerType) match {
      case Some(c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs int children, got ${c.dataType.sql}")
      case None => TypeCheckResult.TypeCheckSuccess
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "interleave_bits"
  override def foldable: Boolean = children.forall(_.foldable)

  override def eval(input: InternalRow): Any = {
    val vals = new Array[Int](children.size)
    var k = 0
    while (k < children.size) {
      val v = children(k).eval(input)
      if (v == null) return null
      vals(k) = v.asInstanceOf[Int]
      k += 1
    }
    var out = 0L
    var j = bits - 1
    while (j >= 0) {
      var c = 0
      while (c < vals.length) {
        out = (out << 1) | ((vals(c) >> j) & 1)
        c += 1
      }
      j -= 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val evals = children.map(_.genCode(ctx))
    val vals = ctx.freshName("vals")
    val out = ctx.freshName("out")
    val j = ctx.freshName("j")
    val c = ctx.freshName("c")
    val n = children.size
    val childCode = evals.zipWithIndex.map { case (e, i) =>
      code"""
            |${e.code}
            |if (${e.isNull}) { ${ev.isNull} = true; }
            |else { $vals[$i] = ${e.value}; }
       """.stripMargin
    }.reduce(_ + _)
    ev.copy(code =
      code"""
            |boolean ${ev.isNull} = false;
            |long ${ev.value} = 0L;
            |int[] $vals = new int[$n];
            |$childCode
            |if (!${ev.isNull}) {
            |  long $out = 0L;
            |  for (int $j = $bits - 1; $j >= 0; $j--) {
            |    for (int $c = 0; $c < $n; $c++) {
            |      $out = ($out << 1) | (($vals[$c] >> $j) & 1);
            |    }
            |  }
            |  ${ev.value} = $out;
            |}
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): InterleaveBits =
    copy(children = newChildren)
}
