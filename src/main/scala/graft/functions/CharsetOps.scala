package graft.functions

import java.nio.charset.Charset

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd best-effort charset decode: `decode_charset(bytes, name)`
  * decodes `bytes` with ANY charset the running JDK supports —
  * windows-1252, shift_jis, gb2312/gbk/gb18030, euc-jp/euc-kr, big5,
  * the iso-8859 family, koi8-r, … — with the `new String(bytes,
  * charset)` replacement semantics (malformed sequences and unmappable
  * bytes become U+FFFD, never an exception: a web crawl is full of
  * mis-declared pages and a loud failure per bad byte would convert
  * nothing). An UNSUPPORTED or illegal charset name yields NULL, which
  * is the caller's skip signal — the WET conversion contract
  * ([[graft.sources.WarcSource.warcToWet]]): convert what the JDK can
  * decode, skip what it cannot, never mojibake.
  *
  * Why an expression and not the built-in `decode`: Spark's
  * `StringDecode` restricts the charset to a six-entry list
  * (US-ASCII/ISO-8859-1/UTF-8/UTF-16*) unless the session flips the
  * global `spark.sql.legacy.javaCharsets` escape hatch — a library
  * operator must not mutate session conf it does not own. This stays
  * inside whole-stage codegen (one static call per row) and keeps the
  * charset per-ROW, so one pass over a crawl handles every declared
  * encoding at once.
  *
  * Scale: decoders are cached per JVM by name (`Charset.forName` takes
  * a lock on some JDKs); per row the cost is one hash probe + the
  * decode itself. The decode allocates the decoded String — same cost
  * class as the built-in `decode`.
  */
case class DecodeCharset(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, StringType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"decode_charset needs (binary, string), got (${l.sql}, ${r.sql})")
    }
  override def dataType: DataType = StringType
  // nullable even over non-null children: an unsupported charset name
  // maps to null (the skip contract)
  override def nullable: Boolean = true
  override def prettyName: String = "decode_charset"

  override def nullSafeEval(bytes: Any, name: Any): Any =
    DecodeCharset.compute(bytes.asInstanceOf[Array[Byte]],
      name.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, n) =>
      s"""
         |${ev.value} = graft.functions.DecodeCharset.compute($b, $n);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DecodeCharset =
    copy(left = newLeft, right = newRight)
}

object DecodeCharset {

  /** The label cache is keyed on UNTRUSTED crawl content (Content-Type
    * header parameters), so it is bounded: past the cap — far above
    * the JDK's ~170 canonical names plus every alias a real crawl
    * declares — new labels resolve uncached instead of growing
    * executor memory on adversarial/garbage pages for the lifetime of
    * the JVM.
    */
  private[functions] val CacheCap = 1024

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Option[Charset]]()

  private def resolve(n: String): Option[Charset] = n match {
    case "latin-1" => Some(Charset.forName("ISO-8859-1"))
    case _ =>
      try { if (Charset.isSupported(n)) Some(Charset.forName(n)) else None }
      catch { case _: java.nio.charset.IllegalCharsetNameException => None }
  }

  /** Charset for a declared label, or None when the JDK cannot decode
    * it. Case-insensitive (Charset.forName already is); one extra
    * alias the web uses that the JDK does not register: `latin-1`
    * (with the dash) → ISO-8859-1.
    */
  def charsetFor(name: String): Option[Charset] = {
    val key = name.toLowerCase(java.util.Locale.ROOT)
    val hit = cache.get(key)
    if (hit != null) hit
    else if (cache.size < CacheCap) cache.computeIfAbsent(key, resolve)
    else resolve(key) // cache full: correct, just uncached
  }

  /** Shared by the interpreted path and the generated code. Null for
    * an unsupported/illegal charset name.
    */
  def compute(bytes: Array[Byte], name: UTF8String): UTF8String =
    charsetFor(name.toString) match {
      case Some(cs) => UTF8String.fromString(new String(bytes, cs))
      case None => null
    }
}
