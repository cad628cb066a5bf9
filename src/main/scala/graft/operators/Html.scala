package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → text extraction — the tier upstream of every text operator
  * in a real crawl pipeline (the Common-Crawl WARC→WET shape): strip
  * script/style/comments, turn block-level tags into line breaks, drop
  * every remaining tag, decode the common entities, and normalize
  * whitespace. Downstream, the extracted text flows into the existing
  * q16–q19/q39 text features unchanged.
  *
  * Two deliberate design choices:
  *
  *  - the pipeline is a COMPOSITION OF BUILT-IN STRING FUNCTIONS
  *    (regexp_replace/replace/trim), not a UDF or a custom expression:
  *    it stays inside whole-stage codegen, it is embarrassingly
  *    parallel (one projection, no shuffle — 100 TB scale = executors),
  *    and every stage is replayable verbatim by another engine, which
  *    is what makes the q108 gate a full hash gate rather than a
  *    rows-only check;
  *  - the regex dialect is kept to the Java ∩ RE2 intersection (inline
  *    `(?is)` flags, lazy `.*?`, explicit character classes — no `\b`,
  *    no lookaround, no `\s` whose definitions differ on vertical tab),
  *    so Spark and the DuckDB oracle compute byte-identical text.
  *
  * Scope (documented, not hidden): entities decoded are the named
  * lowercase five (`&lt; &gt; &quot; &apos; &amp;`) plus `&#39;`,
  * `&#160;` and `&nbsp;` — the set covering the overwhelming share of
  * web text; other numeric references pass through as literals.
  * Malformed markup degrades gracefully: an unclosed `<` with no `>`
  * in the rest of the document is left as text, an unclosed script
  * block swallows to end-of-document (the conservative choice for
  * boilerplate).
  */
object Html {

  /** Block-level tags that become line breaks (everything else melts
    * into a space). Longest-first where one name prefixes another.
    */
  private val blockTags =
    "pre|p|div|br|li|ul|ol|h[1-6]|tr|td|th|table|thead|tbody|" +
    "blockquote|section|article|header|footer|nav|form"

  /** Extracted plain text of an HTML column: lines separated by a
    * single `\n`, single-spaced within lines, trimmed.
    */
  def extractText(c: Column): Column = {
    val noComment = regexp_replace(c, "(?s)<!--.*?-->", " ")
    val noScript = regexp_replace(
      regexp_replace(noComment, "(?is)<script[^>]*>.*?</script>", " "),
      // an UNCLOSED script/style block swallows to end-of-document —
      // the conservative choice (leaked script text is worse noise
      // than truncated boilerplate)
      "(?is)<script[^>]*>.*", " ")
    val noStyle = regexp_replace(
      regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " "),
      "(?is)<style[^>]*>.*", " ")
    // SOURCE whitespace (including newlines) is insignificant in HTML:
    // flatten it to single spaces BEFORE block tags mint the real line
    // breaks, so an in-paragraph source newline never splits a line
    val flat = regexp_replace(noStyle, "[ \\t\\r\\n\\f]+", " ")
    val blocks = regexp_replace(flat,
      s"(?i)</?($blockTags)( [^>]*)?/?>", "\n")
    val noTags = regexp_replace(blocks, "<[^>]*>", " ")
    // &amp; LAST: "&amp;lt;" must decode to the literal text "&lt;",
    // not cascade to "<" (the standard single-pass decode order)
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&apos;" -> "'",
      "&#39;" -> "'", "&#160;" -> " ", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (acc, (k, v)) => replace(acc, lit(k), lit(v)) }
    // explicit classes, not \s: Java counts vertical tab as whitespace,
    // RE2 does not — the intersection keeps both engines byte-identical
    val hws = regexp_replace(decoded, "[ \\t\\r\\f]+", " ")
    val lines = regexp_replace(hws, " ?\\n[ \\n]*", "\n")
    trim(lines, " \n")
  }

  /** Line-level boilerplate guard (the Gopher-rule shape at its
    * simplest exact form): drop extracted lines shorter than
    * `minChars` — navigation crumbs, bare bullets, empty headings.
    * Composes after [[extractText]]; heavier per-line quality signals
    * are [[TextAnalysis]]'s job once lines become documents.
    */
  def dropShortLines(c: Column, minChars: Int): Column = {
    require(minChars >= 1, s"minChars must be >= 1, got $minChars")
    array_join(
      filter(split(c, "\n"), l => length(l) >= minChars), "\n")
  }
}
