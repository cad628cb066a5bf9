package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd MinHash signature: one pass over the shingle array
  * computing all `numHashes` permutation minima.
  *
  * Semantically identical to the SQL higher-order-function formulation
  * in `graft.operators.Dedup` (same xxhash64 base hashes, same
  * a*h+b mod p permutations), but Spark evaluates nested lambda
  * expressions interpreted — this expression stays inside whole-stage
  * codegen and computes the signature in a tight compiled loop, which
  * is the difference between a per-row allocation storm and scan-speed
  * signatures on a 100 TB corpus.
  *
  * Permutation constants: a_j = pmod(xxhash64('minhash-a-' + j), 2^30)+1,
  * b_j = pmod(xxhash64('minhash-b-' + j), p), p = 4294967311 (prime >
  * 2^32); base hash folded to 32 bits so a*h+b never overflows a long.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_signature needs array<string>, got ${other.sql}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_signature"

  @transient private lazy val aConst: Array[Long] = MinHashSignature.aConsts(numHashes)
  @transient private lazy val bConst: Array[Long] = MinHashSignature.bConsts(numHashes)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val sig = MinHashSignature.compute(arr, numHashes, aConst, bConst)
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", aConst, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bConst, "long[]")
    nullSafeCodeGen(ctx, ev, arr => {
      val sig = ctx.freshName("sig")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val h32 = ctx.freshName("h32")
      val v = ctx.freshName("v")
      s"""
         |long[] $sig = new long[$numHashes];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |for (int $i = 0; $i < $arr.numElements(); $i++) {
         |  UTF8String $s = $arr.getUTF8String($i);
         |  long $h32 = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
         |    $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L) & 0xFFFFFFFFL;
         |  for (int $j = 0; $j < $numHashes; $j++) {
         |    // division-free Barrett reduction — EXACTLY floorMod(t, P)
         |    // for 0 <= t < 2^63, which covers t = a*h32 + b <=
         |    // 2^62 - 2^30 + P - 1 (see MinHashSignature.modP for the
         |    // proof): the per-(shingle x hash) hardware divide was
         |    // the dominant cost of the whole LSH pipeline at the
         |    // 5M-row soak
         |    long $v = $aRef[$j] * $h32 + $bRef[$j];
         |    $v -= Math.multiplyHigh($v, ${MinHashSignature.PRecip}L)
         |          * ${MinHashSignature.P}L;
         |    if ($v >= ${MinHashSignature.P}L) $v -= ${MinHashSignature.P}L;
         |    if ($v < $sig[$j]) $sig[$j] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {
  /** Prime > 2^32; permutation ring modulus. */
  val P: Long = 4294967311L

  /** floor(2^64 / P) — the Barrett constant of [[modP]]. (P is odd, so
    * floor((2^64−1)/P) = floor(2^64/P) and unsigned division of −1L
    * computes it without 128-bit arithmetic.)
    */
  val PRecip: Long = java.lang.Long.divideUnsigned(-1L, P)

  /** Division-free `Math.floorMod(v, P)` for 0 ≤ v < 2^63, via Barrett
    * reduction: q = floor(v·PRecip / 2^64) (one `multiplyHigh`, both
    * operands positive — PRecip < 2^33 — so the signed intrinsic is
    * exact) differs from floor(v/P) by at most 1: the error term is
    * v·(2^64 mod P)/(P·2^64) = v·225/(P·2^64) < 2^63·225/2^96 ≪ 1, so
    * one conditional subtract completes the reduction. The bound
    * covers the full input domain of the hash family: v = a·h32 + b
    * with a ≤ 2^30 (asserted in [[aConsts]]), h32 ≤ 2^32−1, b ≤ P−1
    * gives v ≤ 2^62 − 2^30 + P − 1 < 2^63 (ADVICE r12 — the previous
    * 2^62 statement was narrower than the real maximum). Replaces the
    * hardware divide that dominated the LSH signature stage (128
    * reductions per shingle).
    */
  @inline def modP(v: Long): Long = {
    var r = v - Math.multiplyHigh(v, PRecip) * P
    if (r >= P) r -= P
    r
  }

  /** xxhash64 (seed 42, same as SQL xxhash64) of a string's UTF-8 bytes. */
  private def sqlXxhash64(s: String): Long = {
    val u = UTF8String.fromString(s)
    XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
  }

  def aConsts(n: Int): Array[Long] = {
    val as = Array.tabulate(n)(j =>
      Math.floorMod(sqlXxhash64(s"minhash-a-$j"), 1073741824L) + 1L)
    // modP's exactness proof assumes a ≤ 2^30 (v = a·h32 + b < 2^63);
    // keep the bound enforced next to the constants so a future change
    // to the generator can't silently void the Barrett analysis
    assert(as.forall(a => a >= 1L && a <= 1073741824L))
    as
  }

  def bConsts(n: Int): Array[Long] =
    Array.tabulate(n)(j => Math.floorMod(sqlXxhash64(s"minhash-b-$j"), P))

  /** Interpreted path (also used by tests as the reference). */
  def compute(arr: ArrayData, n: Int, a: Array[Long], b: Array[Long]): Array[Long] = {
    val sig = Array.fill(n)(Long.MaxValue)
    var i = 0
    while (i < arr.numElements()) {
      val s = arr.getUTF8String(i)
      val h32 = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L) & 0xFFFFFFFFL
      var j = 0
      while (j < n) {
        val v = modP(a(j) * h32 + b(j))
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    sig
  }
}
