package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.vintage.VintageTable

/** The standing crawl-refresh composition ([[CrawlRefresh]], q130):
  * exactly-once semantics of the watermarked MERGE, convergence of the
  * corpus-state-derived index maintenance across crash points, and the
  * declared-charset decode on the streamed path.
  */
class CrawlRefreshSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** WARC-record-shaped rows for `n` synthetic UTF-8 html pages. */
  private def recs(ids: Seq[Long], text: Long => String,
      ctype: String = "text/html"): DataFrame =
    ids.map { i =>
      val body = s"<html><body><p>${text(i)}</p></body></html>"
      (s"https://site-${i % 2}.example.com/p/$i", "response", ctype,
        body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }.toDF("url", "warc_type", "content_type", "bytes")

  private def tmp() = Files.createTempDirectory("crawl-refresh").toString

  test("MERGE withTxn: a replayed (appId, version) is skipped exactly-once") {
    val dir = tmp() + "/t"
    val t = VintageTable.create(spark,
      dir, Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    t.as("t").merge(Seq((2L, "B"), (3L, "c")).toDF("k", "v").as("s"),
        "t.k = s.k")
      .withTxn("app", 7L)
      .whenMatched().updateAll().whenNotMatched().insertAll()
      .execute()
    assert(t.toDF.orderBy("k").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "B"), (3L, "c")))
    val vAfter = t.version
    // replay of the same version with DIFFERENT source: must be a no-op
    t.as("t").merge(Seq((1L, "XXX")).toDF("k", "v").as("s"), "t.k = s.k")
      .withTxn("app", 7L)
      .whenMatched().updateAll().whenNotMatched().insertAll()
      .execute()
    assert(t.version == vAfter, "replayed merge must not commit")
    assert(t.toDF.filter(col("v") === "XXX").count() == 0L)
    // a LATER version proceeds
    t.as("t").merge(Seq((1L, "A2")).toDF("k", "v").as("s"), "t.k = s.k")
      .withTxn("app", 8L)
      .whenMatched().updateAll().whenNotMatched().insertAll()
      .execute()
    assert(t.toDF.filter(col("v") === "A2").count() == 1L)
  }

  test("refreshBatch is idempotent: a full replay leaves identical state") {
    val base = tmp()
    val (tp, sp) = (base + "/t", base + "/sig")
    CrawlRefresh.refreshBatch(recs(0L until 10L, i => s"first crawl doc $i " * 5),
      tp, sp, "app", 0L)
    CrawlRefresh.refreshBatch(
      recs(10L until 16L, i => s"second drop doc $i content " * 5),
      tp, sp, "app", 1L)
    val t = VintageTable.forPath(spark, tp)
    val sigT = VintageTable.forPath(spark, sp)
    val before = t.toDF.orderBy("url").collect().toSeq
    val sigBefore = sigT.toDF.orderBy("url", "band").collect().toSeq
    assert(before.size == 16)
    assert(sigBefore.size == 16 * 16, "bands x corpus invariant")
    // crash-between-commit-and-checkpoint: batch 1 replays verbatim
    CrawlRefresh.refreshBatch(
      recs(10L until 16L, i => s"second drop doc $i content " * 5),
      tp, sp, "app", 1L)
    assert(t.toDF.orderBy("url").collect().toSeq == before)
    assert(sigT.toDF.orderBy("url", "band").collect().toSeq == sigBefore)
  }

  test("crash between corpus and index writes: the index catches up from corpus state") {
    val base = tmp()
    val (tp, sp) = (base + "/t", base + "/sig")
    CrawlRefresh.refreshBatch(recs(0L until 8L, i => s"bootstrap doc $i " * 6),
      tp, sp, "app", 0L)
    // simulate the crash: bootstrap committed the corpus but the index
    // write was lost
    def rmrf(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rmrf)); f.delete(): Unit
    }
    rmrf(new java.io.File(sp))
    assert(!VintageTable.isVintageTable(sp))
    // next batch: refresh must rebuild the index from the corpus, then
    // proceed — and a near-dup of batch-0 content must still be caught
    val nearDup = recs(Seq(100L), _ => ("bootstrap doc 3 " * 6).dropRight(2))
    val fresh = recs(Seq(101L), i => s"genuinely new page $i " * 6)
    CrawlRefresh.refreshBatch(nearDup.unionByName(fresh), tp, sp, "app", 1L)
    val t = VintageTable.forPath(spark, tp)
    val sigT = VintageTable.forPath(spark, sp)
    assert(t.toDF.count() == 9L, "near-dup must be dropped, new page kept")
    assert(t.toDF.filter(col("url").contains("/p/100")).count() == 0L)
    assert(sigT.toDF.count() == 16L * 9L, "index rebuilt + maintained")
  }

  test("streamed pages honor declared charsets through DecodeCharset") {
    // ' “w€”' as windows-1252 bytes 20 93 77 80 94 — a blind UTF-8
    // cast would mangle all three non-ascii bytes
    val head = "<html><body><p>quoted text"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val cp = Array[Byte](0x20, 0x93.toByte, 0x77, 0x80.toByte, 0x94.toByte)
    val tail = "</p></body></html>"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val rows = Seq(
      ("https://a.example.com/cp", "response",
        "text/html; charset=windows-1252", head ++ cp ++ tail),
      ("https://a.example.com/plain", "response", "text/html",
        "<html><body><p>plain utf8</p></body></html>"
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)),
      ("https://a.example.com/skip", "response",
        "text/html; charset=x-no-such-enc", head ++ tail),
      ("https://a.example.com/meta", "metadata", "text/html",
        "<html><body><p>not a response</p></body></html>"
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      .toDF("url", "warc_type", "content_type", "bytes")
    val docs = CrawlRefresh.docsOf(rows)
      .select("url", "text").as[(String, String)].collect().toMap
    assert(docs.keySet == Set("https://a.example.com/cp",
      "https://a.example.com/plain"),
      "unsupported charset and non-response records must be skipped")
    assert(docs("https://a.example.com/cp") == "quoted text “w€”")
    assert(docs("https://a.example.com/plain") == "plain utf8")
  }
}
