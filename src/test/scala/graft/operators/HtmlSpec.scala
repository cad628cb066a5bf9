package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Formula-exact pins for [[Html.extractText]] on hand-built HTML with
  * a KNOWN text yield — the q108 gate's unit-level twin.
  */
class HtmlSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def extract(html: String): String = {
    import spark.implicits._
    Seq(html).toDF("h").select(Html.extractText(col("h"))).head.getString(0)
  }

  test("full page: script/style/comments gone, blocks break lines, entities decode") {
    val html =
      """<html><head><title>My Page</title>
        |<style>body { margin: 0; }</style>
        |<script type="text/javascript">
        |  if (a < b && c > d) { document.write("<p>not text</p>"); }
        |</script></head>
        |<body>
        |<h1 class="top">Heading</h1>
        |<!-- a comment with <div>fake markup</div> inside -->
        |<p>First   paragraph with &lt;escaped&gt; markup &amp; an
        |ampersand.</p>
        |<ul><li>one<li>two</ul>
        |<br/>Tail &quot;quoted&quot;, it&#39;s&nbsp;done.
        |</body></html>""".stripMargin
    val got = extract(html)
    val want =
      """My Page
        |Heading
        |First paragraph with <escaped> markup & an ampersand.
        |one
        |two
        |Tail "quoted", it's done.""".stripMargin
    assert(got == want, s"got:\n$got\nwant:\n$want")
  }

  test("entity decode is single-pass: &amp;lt; stays literal &lt;") {
    assert(extract("<p>&amp;lt; and &amp;amp;</p>") == "&lt; and &amp;")
  }

  test("malformed markup degrades, never throws") {
    // unclosed script swallows to end of document (conservative)
    assert(extract("<p>keep</p><script>var x = 1;") == "keep")
    // a lone '<' with no closing '>' is left as text
    assert(extract("a < b and more") == "a < b and more")
    // unclosed block tag still breaks the line
    assert(extract("<div>one<div>two") == "one\ntwo")
    // empty and tag-only inputs yield empty strings
    assert(extract("") == "")
    assert(extract("<p></p><div></div>") == "")
  }

  test("block tags with attributes and self-closing forms break lines") {
    assert(extract("<p class=\"a\" id='x'>one</p><br/>two<td >three</td>") ==
      "one\ntwo\nthree")
    // non-block inline tags melt into spaces, not breaks
    assert(extract("a<b>bold</b>c <span>s</span>d") == "a bold c s d")
  }

  test("dropShortLines keeps only lines >= minChars") {
    import spark.implicits._
    val got = Seq("a decent line\nok\nanother good line\nx")
      .toDF("t").select(Html.dropShortLines(col("t"), 3)).head.getString(0)
    assert(got == "a decent line\nanother good line")
  }

  test("extracted text feeds the existing text features unchanged") {
    import spark.implicits._
    val docs = Seq((1L, "<html><body><p>The quick brown fox jumps over " +
        "the lazy dog</p></body></html>"))
      .toDF("doc_id", "html")
      .select(col("doc_id"), Html.extractText(col("html")).as("text"))
    val r = TextAnalysis.documentFeatures(docs, "doc_id", "text").head
    assert(r.getAs[Int]("n_tokens") == 9)
    assert(r.getAs[String]("lang_pred") == "en")
  }
}
