package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Pins [[Url.canonicalize]]'s exactly-specified algebra case by case
  * — the q109 gate's unit-level twin.
  */
class UrlSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def canon(urls: String*): Seq[String] = {
    import spark.implicits._
    urls.toDF("u").select(Url.canonicalize(col("u"))).collect()
      .map(_.getString(0)).toSeq
  }

  test("authority case folds, path case survives") {
    assert(canon("HTTP://WWW.Example.COM/PaTh/X") ==
      Seq("http://www.example.com/PaTh/X"))
  }

  test("default port drops only for its own scheme") {
    assert(canon(
      "http://a.com:80/x", "https://a.com:443/x",
      "http://a.com:443/x", "https://a.com:80/x", "http://a.com:8080/x") ==
      Seq("http://a.com/x", "https://a.com/x",
        "http://a.com:443/x", "https://a.com:80/x", "http://a.com:8080/x"))
    // port at end-of-string (no path) drops too
    assert(canon("http://a.com:80") == Seq("http://a.com"))
  }

  test("fragments drop; tracking params drop; params sort; empty query drops") {
    assert(canon("https://a.com/x?b=2&a=1#sec") == Seq("https://a.com/x?a=1&b=2"))
    assert(canon("https://a.com/x?utm_source=f&utm_medium=m&gclid=1&fbclid=2&ref=r") ==
      Seq("https://a.com/x"))
    assert(canon("https://a.com/x?utm_source=f&keep=1") ==
      Seq("https://a.com/x?keep=1"))
    // '&&' yields an empty param: dropped, not kept as ""
    assert(canon("https://a.com/x?b=2&&a=1") == Seq("https://a.com/x?a=1&b=2"))
    // a param NAMED like content (refresh=1) is not the tracking 'ref='
    assert(canon("https://a.com/x?refresh=1") == Seq("https://a.com/x?refresh=1"))
    // param-name matching is case-sensitive (documented contract):
    // query case is never folded, so UTM_SOURCE is not the tracker
    assert(canon("https://a.com/x?UTM_SOURCE=f") ==
      Seq("https://a.com/x?UTM_SOURCE=f"))
  }

  test("planted crawl variants collapse to one canonical form") {
    val variants = canon(
      "HTTP://WWW.Example.COM:80/a/7?utm_source=feed&b=2&a=1#frag",
      "http://www.example.com/a/7?a=1&b=2",
      " http://www.example.com/a/7?b=2&a=1&utm_campaign=x ")
    assert(variants.distinct == Seq("http://www.example.com/a/7?a=1&b=2"),
      s"got $variants")
  }

  test("schemeless and non-http schemes degrade gracefully") {
    // no scheme: nothing to lowercase, query algebra still applies
    assert(canon("www.a.com/x?b=2&a=1") == Seq("www.a.com/x?a=1&b=2"))
    // ftp: authority lowercases, but the http/https port rules don't fire
    assert(canon("FTP://Mixed.Case:80/Path") == Seq("ftp://mixed.case:80/Path"))
  }
}
