package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.sources.WarcSource.WarcDoc

/** The WARC container source ([[WarcSource]]): distributed write of
  * one-gzip-member-per-record part files, streaming read-back, header
  * fidelity, binary-payload safety, uncompressed-container support,
  * and LOUD failure on every malformed-member class.
  */
class WarcSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def newDir(): String =
    Files.createTempDirectory("warc-src").toString

  test("roundtrip: urls, content types, and payload bytes survive exactly") {
    val dir = newDir()
    // payloads that would break a non-length-delimited parser: CRLF
    // pairs, a fake WARC version line, an empty payload, raw bytes
    val docs = Seq(
      WarcDoc("https://a.com/1", "text/html",
        "<html>line1\r\n\r\nline2</html>".getBytes(UTF_8)),
      WarcDoc("https://a.com/2", "text/plain",
        "WARC/1.0\r\nContent-Length: 999\r\n\r\nnot a record".getBytes(UTF_8)),
      WarcDoc("https://a.com/3", "application/octet-stream",
        Array.tabulate[Byte](257)(i => (i % 256).toByte)),
      WarcDoc("https://a.com/4", "text/empty", Array.empty[Byte]),
      WarcDoc("https://ünïcode.example/päth?q=ö", "text/html",
        "ümläuts".getBytes(UTF_8)))
    WarcSource.writeWarc(spark.createDataset(docs).repartition(2), dir)

    val back = WarcSource.readWarc(spark, dir)
      .select("url", "warc_type", "content_type", "bytes")
      .as[(String, String, String, Array[Byte])].collect()
      .sortBy(_._1).toSeq
    assert(back.map(_._1) == docs.map(_.url).sorted)
    assert(back.forall(_._2 == "response"))
    val byUrl = docs.map(d => d.url -> d).toMap
    back.foreach { case (url, _, ct, bytes) =>
      assert(ct == byUrl(url).content_type, s"content_type of $url")
      assert(bytes.toSeq == byUrl(url).bytes.toSeq, s"payload of $url")
    }
  }

  test("record_index is the per-file ordinal; multiple members per file") {
    val dir = newDir()
    val docs = (0 until 7).map(i =>
      WarcDoc(s"https://b.com/$i", "text/html", s"payload $i".getBytes(UTF_8)))
    WarcSource.writeWarc(spark.createDataset(docs).coalesce(1), dir)
    val back = WarcSource.readWarc(spark, dir)
      .select("record_index", "url").as[(Long, String)].collect().toSeq
    assert(back.map(_._1).sorted == (0L until 7L))
    // one part file, members in write order
    assert(back.sortBy(_._1).map(_._2) == docs.map(_.url))
  }

  test("uncompressed .warc containers parse too") {
    val dir = newDir()
    val payload = "plain container"
    val rec = "WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: https://c.com/x\r\nContent-Type: text/plain\r\n" +
      s"Content-Length: ${payload.length}\r\n\r\n$payload\r\n\r\n"
    Files.write(java.nio.file.Paths.get(dir, "one.warc"),
      (rec + rec).getBytes(UTF_8))
    val back = WarcSource.readWarc(spark, dir)
      .select("url", "bytes").as[(String, Array[Byte])].collect().toSeq
    assert(back.size == 2)
    assert(back.forall(r => new String(r._2, UTF_8) == payload))
  }

  test("corrupt gzip member fails loudly, not silently") {
    val dir = newDir()
    val junk = Array[Byte](0x1f, 0x8b.toByte, 1, 2, 3, 4, 5, 6, 7, 8)
    Files.write(java.nio.file.Paths.get(dir, "bad.warc.gz"), junk)
    val e = intercept[Exception] {
      WarcSource.readWarc(spark, dir).count()
    }
    assert(e.getMessage != null)
  }

  test("truncated payload names the path and record index") {
    val dir = newDir()
    val rec = "WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: https://c.com/t\r\n" +
      "Content-Length: 100\r\n\r\nonly ten b"
    Files.write(java.nio.file.Paths.get(dir, "trunc.warc"), rec.getBytes(UTF_8))
    val e = intercept[Exception] {
      WarcSource.readWarc(spark, dir).count()
    }
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg.contains("truncated WARC payload") || msg.contains("trunc.warc"),
      s"unhelpful failure: $e")
  }

  test("non-WARC header line fails loudly with the offending line") {
    val dir = newDir()
    Files.write(java.nio.file.Paths.get(dir, "notwarc.warc"),
      "HTTP/1.1 200 OK\r\n\r\n".getBytes(UTF_8))
    val e = intercept[Exception] {
      WarcSource.readWarc(spark, dir).count()
    }
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg.contains("expected version line") || msg.contains("notwarc"),
      s"unhelpful failure: $e")
  }

  test("the listing scan never selects file contents (metadata-only)") {
    val dir = newDir()
    WarcSource.writeWarc(spark.createDataset(Seq(
      WarcDoc("https://d.com/1", "text/html", "x".getBytes(UTF_8)))), dir)
    val df = WarcSource.readWarc(spark, dir)
    // the binaryFile scan's ReadSchema must be pruned to path — the
    // MediaSourceSpec explain-text assert (AQE wraps the physical tree)
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode)
    val scanLines = plan.linesIterator.filter(_.contains("binaryFile")).toSeq
    assert(scanLines.nonEmpty, s"expected a binaryFile scan in the plan:\n$plan")
    scanLines.foreach { l =>
      assert(!l.contains("content"),
        s"the listing scan must not materialize file contents: $l")
    }
    assert(df.count() == 1)
  }

  test("warcToWet: conversion records carry the extracted text, non-HTML skipped") {
    val warcDir = newDir(); val wetDir = newDir()
    WarcSource.writeWarc(spark.createDataset(Seq(
      WarcDoc("https://w.com/1", "text/html",
        "<html><body><p>hello &amp; goodbye</p></body></html>"
          .getBytes(UTF_8)),
      WarcDoc("https://w.com/2", "text/html; charset=utf-8",
        "<html><script>x<y</script><b>kept</b></html>".getBytes(UTF_8)),
      WarcDoc("https://w.com/3", "image/png",
        Array[Byte](1, 2, 3)))), warcDir)
    WarcSource.warcToWet(spark, warcDir, wetDir)
    val back = WarcSource.readWarc(spark, wetDir)
      .select("url", "warc_type", "content_type", "bytes")
      .as[(String, String, String, Array[Byte])].collect()
      .sortBy(_._1).toSeq
    // the png response has no text tier — WET carries only conversions
    assert(back.map(_._1) == Seq("https://w.com/1", "https://w.com/2"))
    assert(back.forall(_._2 == "conversion"))
    assert(back.forall(_._3 == "text/plain"))
    assert(new String(back(0)._4, UTF_8) == "hello & goodbye")
    assert(new String(back(1)._4, UTF_8) == "kept")
    // the conversion member points back at its response record
    val raw = {
      val f = new java.io.File(wetDir).listFiles()
        .filter(_.getName.endsWith(".warc.gz")).head
      val in = new java.util.zip.GZIPInputStream(
        new java.io.FileInputStream(f))
      try new String(in.readAllBytes(), UTF_8) finally in.close()
    }
    assert(raw.contains("WARC-Refers-To: <urn:md5:"))
  }

  test("MemberGzip emits bytes identical to GZIPOutputStream per member") {
    // the r18 write-path optimization reuses ONE native deflater per
    // task; its framing must stay bit-for-bit what the per-record
    // GZIPOutputStream produced (fixture determinism + any external
    // gunzip). Three members of varied content through one reused
    // encoder, each compared against a fresh reference stream.
    val chunks = Seq(
      Seq("WARC/1.0\r\n".getBytes(UTF_8), "hello".getBytes(UTF_8)),
      Seq(Array.fill[Byte](70000)(42), "\r\n\r\n".getBytes(UTF_8)),
      Seq(("mixed é 日本 " * 1000).getBytes(UTF_8)))
    val ours = new java.io.ByteArrayOutputStream()
    val gz = new WarcSource.MemberGzip(ours)
    val ref = new java.io.ByteArrayOutputStream()
    chunks.foreach { member =>
      gz.writeMember(member: _*)
      val g = new java.util.zip.GZIPOutputStream(ref)
      member.foreach(g.write)
      g.finish()
    }
    gz.end()
    assert(ours.toByteArray.sameElements(ref.toByteArray))
  }

  test("task commit: two attempts of the same pid leave exactly one member set") {
    val dir = newDir()
    val docs = (0 until 5).map(i =>
      WarcDoc(s"https://r.com/$i", "text/html", s"body $i".getBytes(UTF_8)))
    // the speculative-execution race: attempt 7 and attempt 8 of
    // partition 0 both run to completion, committing in sequence —
    // with the pre-r16 direct-to-final-path writer this interleaved
    // gzip members; with commit-by-rename the final file is exactly
    // ONE attempt's complete set
    WarcSource.writePartition(dir, 0, 7L, docs.iterator, "response")
    WarcSource.writePartition(dir, 0, 8L, docs.iterator, "response")
    val parts = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".warc.gz")).toSeq
    assert(parts.map(_.getName) == Seq("part-0.warc.gz"))
    val back = WarcSource.readWarc(spark, dir)
      .select("url").as[String].collect().toSeq.sorted
    assert(back == docs.map(_.url).sorted, "exactly one copy of each record")
  }

  test("a refused commit rename with the final file present does not throw") {
    // HDFS-semantics stores refuse a rename onto an existing
    // destination (the local FS falls back to a copy instead, so the
    // refusal is stubbed). The LOSER attempt must treat "rename
    // refused, final path present" as a successful (idempotent)
    // commit — not a spurious task failure — and clean up its own
    // temp file; the final path is NEVER deleted (the pre-r17
    // delete-then-rename let a zombie delete its twin's committed
    // file and die before renaming).
    import org.apache.hadoop.fs.Path
    val refusing = new org.apache.hadoop.fs.RawLocalFileSystem() {
      setConf(new org.apache.hadoop.conf.Configuration())
      override def rename(src: Path, dst: Path): Boolean = false
    }
    val dir = newDir()
    val tmp = new java.io.File(dir, "attempt-9.warc.gz")
    val fin = new java.io.File(dir, "part-0.warc.gz")
    Files.write(tmp.toPath, Array[Byte](1, 2))
    Files.write(fin.toPath, Array[Byte](3, 4, 5))
    WarcSource.commitTask(refusing,
      new Path(tmp.toString), new Path(fin.toString)) // must not throw
    assert(!tmp.exists(), "loser cleans up its temp file")
    assert(Files.readAllBytes(fin.toPath).toSeq == Seq[Byte](3, 4, 5),
      "the committed final file is untouched")
    // refusal with NO final file is a real commit failure
    Files.write(tmp.toPath, Array[Byte](1, 2))
    assert(fin.delete())
    intercept[java.io.IOException] {
      WarcSource.commitTask(refusing,
        new Path(tmp.toString), new Path(fin.toString))
    }
  }

  test("writeWarc publishes _SUCCESS, clears _temporary; reader skips markers and debris") {
    val dir = newDir()
    WarcSource.writeWarc(spark.createDataset(Seq(
      WarcDoc("https://m.com/1", "text/html", "x".getBytes(UTF_8)),
      WarcDoc("https://m.com/2", "text/html", "y".getBytes(UTF_8)))), dir)
    assert(new java.io.File(dir, "_SUCCESS").exists(), "job-commit marker")
    assert(!new java.io.File(dir, "_temporary").exists(), "attempt debris cleared")
    // plant zombie-attempt debris + hidden files: the reader must
    // never parse them as containers
    val tmp = new java.io.File(dir, "_temporary")
    tmp.mkdirs()
    Files.write(new java.io.File(tmp, "part-0-attempt-99.warc.gz").toPath,
      Array[Byte](1, 2, 3))
    Files.write(new java.io.File(dir, ".crc-junk").toPath, Array[Byte](9))
    val n = WarcSource.readWarc(spark, dir, requireComplete = true).count()
    assert(n == 2L)
  }

  test("requireComplete refuses a directory without the completion marker") {
    val dir = newDir()
    WarcSource.writeWarc(spark.createDataset(Seq(
      WarcDoc("https://p.com/1", "text/html", "x".getBytes(UTF_8)))), dir)
    // a killed job: part files look complete, marker never landed
    assert(new java.io.File(dir, "_SUCCESS").delete())
    val e = intercept[Exception] {
      WarcSource.readWarc(spark, dir, requireComplete = true).count()
    }
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg.contains("_SUCCESS") || msg.contains("incomplete"),
      s"unhelpful failure: $e")
    // without the requirement the partial read still works (explicit
    // caller opt-in, e.g. inspecting a crashed job's output)
    assert(WarcSource.readWarc(spark, dir).count() == 1L)
  }

  test("warcToWet: HTTP-enveloped response records (the Common Crawl shape)") {
    val warcDir = newDir(); val wetDir = newDir()
    def http(status: String, headers: String, body: Array[Byte]): Array[Byte] =
      (s"HTTP/1.1 $status\r\n$headers\r\n\r\n").getBytes(UTF_8) ++ body
    val httpCt = "application/http; msgtype=response"
    val cafeLatin1 = Array[Byte]('c', 'a', 'f', 0xE9.toByte) // café in latin-1
    WarcSource.writeWarc(spark.createDataset(Seq(
      // 200 + header text/html, no charset → UTF-8 default, converts
      WarcDoc("https://h.com/ok", httpCt,
        http("200 OK", "Server: x\r\nContent-Type: text/html",
          "<html><p>hello &amp; world</p></html>".getBytes(UTF_8))),
      // header name/value case-insensitive
      WarcDoc("https://h.com/case", httpCt,
        http("200 OK", "content-type: Text/HTML",
          "<html><b>upper</b></html>".getBytes(UTF_8))),
      // declared latin-1 body with a high byte decodes correctly
      WarcDoc("https://h.com/latin", httpCt,
        http("200 OK", "Content-Type: text/html; charset=iso-8859-1",
          "<html><p>".getBytes(UTF_8) ++ cafeLatin1 ++
            "</p></html>".getBytes(UTF_8))),
      // non-200 skipped
      WarcDoc("https://h.com/gone", httpCt,
        http("404 Not Found", "Content-Type: text/html",
          "<html>missing</html>".getBytes(UTF_8))),
      // header says plain text: skipped even though block smells like HTML
      WarcDoc("https://h.com/plain", httpCt,
        http("200 OK", "Content-Type: text/plain",
          "<html>not html</html>".getBytes(UTF_8))),
      // shift_jis CONVERTS (r17: any JDK-supported charset decodes) —
      // real multi-byte Japanese, 93FA 967B 8CEA = 日本語
      WarcDoc("https://h.com/sjis", httpCt,
        http("200 OK", "Content-Type: text/html; charset=shift_jis",
          "<html><p>".getBytes(UTF_8) ++
            Array[Byte](0x93.toByte, 0xFA.toByte, 0x96.toByte, 0x7B.toByte,
              0x8C.toByte, 0xEA.toByte) ++ "</p></html>".getBytes(UTF_8))),
      // windows-1252 high bytes decode to curly quotes + euro — NOT
      // latin-1 C1 controls (the 0x80-0x9F divergence)
      WarcDoc("https://h.com/cp1252", httpCt,
        http("200 OK", "Content-Type: text/html; charset=windows-1252",
          "<html><p>".getBytes(UTF_8) ++
            Array[Byte](0x93.toByte, 'w', 0x80.toByte, 0x94.toByte) ++
            "</p></html>".getBytes(UTF_8))),
      // a charset the JDK does not know: skipped, not mojibaked
      WarcDoc("https://h.com/unknowncs", httpCt,
        http("200 OK", "Content-Type: text/html; charset=x-unknown-enc",
          "<html>x</html>".getBytes(UTF_8))),
      // malformed message (no header/body separator): skipped
      WarcDoc("https://h.com/broken", httpCt,
        "HTTP/1.1 200 OK no separator here".getBytes(UTF_8)),
      // the repo's bare convention converts in the same pass
      WarcDoc("https://h.com/bare", "text/html",
        "<html><i>bare</i></html>".getBytes(UTF_8)),
      // bare with a charset parameter honors it too
      WarcDoc("https://h.com/barelatin", "text/html; charset=latin-1",
        "<html><p>".getBytes(UTF_8) ++ cafeLatin1 ++
          "</p></html>".getBytes(UTF_8)))), warcDir)
    WarcSource.warcToWet(spark, warcDir, wetDir, requireComplete = true)
    val back = WarcSource.readWarc(spark, wetDir, requireComplete = true)
      .select("url", "bytes").as[(String, Array[Byte])].collect()
      .map { case (u, b) => (u, new String(b, UTF_8)) }.sortBy(_._1).toSeq
    assert(back.map(_._1) == Seq("https://h.com/bare",
      "https://h.com/barelatin", "https://h.com/case", "https://h.com/cp1252",
      "https://h.com/latin", "https://h.com/ok", "https://h.com/sjis"))
    val byUrl = back.toMap
    assert(byUrl("https://h.com/ok") == "hello & world")
    assert(byUrl("https://h.com/case") == "upper")
    assert(byUrl("https://h.com/latin") == "café")
    assert(byUrl("https://h.com/bare") == "bare")
    assert(byUrl("https://h.com/barelatin") == "café")
    assert(byUrl("https://h.com/sjis") == "日本語")
    assert(byUrl("https://h.com/cp1252") == "“w€”")
  }
}
