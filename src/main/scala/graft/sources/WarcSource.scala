package graft.sources

import java.io.{BufferedInputStream, EOFException, InputStream, OutputStream}
import java.net.URI
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.GZIPInputStream

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (ISO 28500 / WARC 1.1) container source — the format every
  * real web crawl arrives in (Common Crawl, Heritrix, wget --warc):
  * a WARC file is a sequence of records, each a CRLF-delimited header
  * block (`WARC/1.0`, `Name: value` fields, blank line), exactly
  * `Content-Length` payload bytes, and a `\r\n\r\n` trailer; a
  * `.warc.gz` compresses EACH RECORD AS ITS OWN GZIP MEMBER and
  * concatenates the members. Everything here is JDK-only:
  * `java.util.zip.GZIPInputStream` consumes concatenated members
  * natively, so one streaming decoder reads the whole container.
  *
  * This completes the crawl chain: readWarc → [[graft.operators.Url
  * .canonicalize]] (q109/q113) → [[graft.operators.Html.extractText]]
  * (q108) → the dedup tier (q107/q110/q111/q112), gated end-to-end as
  * q114 on a fixture the distributed writer builds.
  *
  * 100 TB notes:
  *   - The scan lists files via `binaryFile` but selects ONLY the
  *     path — the pruned ReadSchema never loads file contents into
  *     rows (the MediaSource plan-assert precedent). Each task then
  *     opens its files through Hadoop `FileSystem` and parses a
  *     STREAM: memory per task is one record's payload, not the
  *     file — a 1 GB Common Crawl segment (4-5 GB decompressed)
  *     parses in constant memory.
  *   - One file = one task (WARC members don't split mid-file);
  *     parallelism = file count, which is the native Common Crawl
  *     layout (segments of ~1 GB). No shuffle anywhere in the read.
  *   - Malformed containers fail LOUDLY with the path and record
  *     index (a corrupt member, a truncated payload, a non-WARC
  *     header) — silently skipping records would under-report a
  *     corpus with no signal anywhere.
  *   - Payloads cap at 2 GB per record (an `Array[Byte]`); real
  *     response records are single pages.
  */
object WarcSource {

  /** One record to write: target URI, payload content type, payload. */
  case class WarcDoc(url: String, content_type: String, bytes: Array[Byte])

  /** One record read back. `record_index` is the record's ordinal
    * within its file (stable: files are parsed sequentially).
    */
  case class WarcRecord(path: String, record_index: Long, warc_type: String,
                        url: String, content_type: String, bytes: Array[Byte])

  /** A fixed, obviously-synthetic timestamp: gate fixtures must be
    * byte-deterministic, and WARC-Date is mandatory per the spec.
    * Real crawlers stamp capture time here.
    */
  private val FixtureDate = "2024-01-01T00:00:00Z"

  /** Name of the job-level completion marker [[writeWarc]] leaves
    * after every task has committed — the same contract as Hadoop's
    * `_SUCCESS`: a directory WITHOUT it is a partial or in-flight
    * write, and [[readWarc]] with `requireComplete = true` refuses it
    * loudly instead of silently under-reporting the corpus.
    */
  val SuccessMarker = "_SUCCESS"

  /** Write records as `.warc.gz` part files, one gzip member per
    * record (the standard layout — members re-concatenate and tools
    * can seek to member boundaries). Record IDs are deterministic
    * (md5 of the target URI) so a rewritten fixture is byte-identical.
    *
    * Committed-output protocol (the Hadoop v1-committer shape —
    * before r16 each task streamed straight into its FINAL path,
    * which under speculative execution let two attempts of one
    * partition interleave gzip members, and a killed job left a
    * complete-LOOKING directory):
    *   - each task writes `<dir>/_temporary/part-<pid>-attempt-<id>
    *     .warc.gz` — attempt IDs are globally unique, so concurrent
    *     attempts of the same partition never share a file;
    *   - on task success the temp file RENAMES to
    *     `<dir>/part-<pid>.warc.gz` (atomic on HDFS-compatible
    *     stores). The final path is NEVER deleted: if the rename is
    *     refused because a twin attempt already committed, the commit
    *     is treated as success (both attempts carry identical rows),
    *     so a zombie can neither clobber a committed file nor fail
    *     spuriously. On a rename-less object store front this with
    *     the store's committer, same as any Hadoop v1-style sink;
    *   - a failed task deletes its temp file and rethrows;
    *   - after ALL tasks commit, the driver drops `_temporary` and
    *     writes the [[SuccessMarker]] — the job-level commit a reader
    *     can require.
    */
  def writeWarc(records: Dataset[WarcDoc], dir: String,
      warcType: String = "response"): Unit = {
    val conf = new Configuration()
    val fs = FileSystem.get(new URI(dir), conf)
    fs.delete(new Path(dir), true)
    fs.mkdirs(new Path(dir))
    records.foreachPartition { (it: Iterator[WarcDoc]) =>
      if (it.hasNext) {
        val tc = org.apache.spark.TaskContext.get()
        writePartition(dir, tc.partitionId(), tc.taskAttemptId(), it, warcType)
      }
    }
    // job commit: all tasks succeeded — clear attempt debris, then
    // publish the completion marker LAST (marker present ⇒ every part
    // file is a committed, complete member set)
    fs.delete(new Path(dir, "_temporary"), true)
    fs.create(new Path(dir, SuccessMarker), true).close()
  }

  /** One task attempt's write-then-commit (see [[writeWarc]]).
    * Package-private so the spec can replay the speculative-execution
    * race directly: two attempts of the SAME pid committing in any
    * order must leave exactly one complete member set at the final
    * path — never an interleave, never an append.
    */
  private[sources] def writePartition(dir: String, pid: Int,
      attemptId: Long, it: Iterator[WarcDoc], warcType: String): Unit = {
    val tfs = FileSystem.get(new URI(dir), new Configuration())
    val tmp = new Path(s"$dir/_temporary/part-$pid-attempt-$attemptId.warc.gz")
    val fin = new Path(s"$dir/part-$pid.warc.gz")
    val out = tfs.create(tmp, true)
    // ONE native deflater + ONE digest for the whole task, reset per
    // member — a fresh GZIPOutputStream/MessageDigest per record is
    // pure allocator churn (zlib state is ~256 KB a member) and at
    // crawl scale the per-record init dominates the actual compress
    val gz = new MemberGzip(out)
    val md = java.security.MessageDigest.getInstance("MD5")
    try it.foreach(r => writeMember(gz, md, r, warcType))
    catch { case e: Throwable =>
      try { out.close(); tfs.delete(tmp, false) }
      catch { case _: java.io.IOException => () }
      gz.end()
      throw e
    }
    out.close()
    gz.end()
    commitTask(tfs, tmp, fin)
  }

  /** Reusable single-member gzip encoder: emits members byte-identical
    * to `new GZIPOutputStream(out).{write…; finish()}` at the default
    * level — the fixed 10-byte header (no mtime, OS 0xff), one DEFLATE
    * stream (output depends only on input bytes + level, not on write
    * chunking), CRC32 + ISIZE little-endian trailer — but with the
    * native zlib state allocated ONCE and `reset()` between members.
    */
  private[sources] final class MemberGzip(out: OutputStream) {
    private val deflater =
      new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    private val crc = new java.util.zip.CRC32
    private val buf = new Array[Byte](8192)
    private val header = Array[Byte](0x1f.toByte, 0x8b.toByte, 8,
      0, 0, 0, 0, 0, 0, 0xff.toByte) // OS=0xff (unknown), as the JDK writes
    private def le32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    /** Write `chunks` as one complete gzip member. */
    def writeMember(chunks: Array[Byte]*): Unit = {
      out.write(header)
      deflater.reset(); crc.reset()
      chunks.foreach { c =>
        crc.update(c)
        deflater.setInput(c)
        while (!deflater.needsInput()) {
          val n = deflater.deflate(buf)
          if (n > 0) out.write(buf, 0, n)
        }
      }
      deflater.finish()
      while (!deflater.finished()) {
        val n = deflater.deflate(buf)
        if (n > 0) out.write(buf, 0, n)
      }
      le32(crc.getValue); le32(deflater.getBytesRead)
    }
    /** Release the native zlib state (idempotent). */
    def end(): Unit = deflater.end()
  }

  /** Task commit: ONE rename, never a delete of the final path. The
    * pre-r17 delete-then-rename had a check-then-act window — a
    * zombie attempt could delete its twin's already-committed part
    * file and then die before renaming, leaving the job's `_SUCCESS`
    * over a MISSING part file (a silent under-read). Both attempts
    * carry identical rows, so commit is idempotent by construction:
    *  - rename lands → this attempt's complete member set is the file
    *    (on a POSIX local FS an existing destination is atomically
    *    replaced whole — never appended to);
    *  - rename refused (HDFS semantics: destination exists) → the
    *    twin already committed an identical file; drop the temp and
    *    report success instead of throwing a spurious task failure;
    *  - rename refused and NO final file → a real commit failure,
    *    thrown loudly.
    */
  private[sources] def commitTask(tfs: FileSystem, tmp: Path,
      fin: Path): Unit = {
    if (!tfs.rename(tmp, fin)) {
      if (tfs.exists(fin)) tfs.delete(tmp, false)
      else throw new java.io.IOException(
        s"WARC task commit failed: could not rename $tmp to $fin")
    }
  }

  /** WARC → WET: read the response records under `warcDir`, extract
    * text from the HTML payloads through the q108 tier
    * ([[graft.operators.Html.extractText]]), and write the standard
    * WET layout to `wetDir`: `conversion` records, `text/plain`,
    * UTF-8 bytes of the extracted text, each carrying a
    * `WARC-Refers-To` that equals the deterministic record ID
    * [[writeMember]] stamps on the response for the same target URI.
    *
    * BOTH payload conventions convert (r15 only handled the second —
    * fed an actual Common Crawl file it converted zero records):
    *   - `application/http; msgtype=response` (the shape Common Crawl
    *     and every ISO-28500 crawler writes): the block is a full HTTP
    *     message. The envelope is split from the body at the first
    *     `\r\n\r\n`, the status line and the HTTP `Content-Type`
    *     header (with its charset parameter) are honored, and only
    *     `200` responses whose header says `text/html` convert;
    *   - bare `text/html[; charset=…]` blocks (this repo's fixture
    *     convention): the block IS the HTML; a charset parameter on
    *     the WARC Content-Type is honored the same way.
    *
    * Charset contract (r17 — widened from the r16
    * utf-8/latin-1/ascii allowlist, which silently LOST every
    * windows-1252 page, the web's single most common non-UTF-8
    * declared charset): an absent charset defaults to UTF-8; any
    * charset the running JDK supports decodes —
    * windows-1252 (≠ latin-1 exactly in the 0x80-0x9F range),
    * shift_jis, gb2312/gbk/gb18030, euc-jp/euc-kr, big5, the
    * iso-8859 family, … — with replacement semantics for bad bytes
    * (the `new String(bytes, charset)` contract — a crawl is full of
    * mis-declared pages and a loud failure per bad byte would convert
    * nothing). A charset the JDK does NOT know marks the record
    * non-convertible and it is SKIPPED, like non-HTML and non-200
    * records — the standard WET generator behavior (conversion is
    * best-effort filtering, not container corruption, which still
    * fails loudly in the reader). The decode is the codegen'd
    * [[graft.functions.DecodeCharset]] — per-ROW charsets in one
    * compiled pass, no session-global legacy-charset conf flipped.
    *
    * Mechanics: the envelope split is one byte-preserving
    * `ISO-8859-1` decode (1:1 byte↔char, so `substr`/`instr` offsets
    * ARE byte offsets and the body re-encodes to its exact original
    * bytes) plus per-row regexes — all codegen projections.
    * Distributed end to end: the read streams containers per task,
    * the write streams members per partition; nothing corpus-sized
    * touches the driver.
    */
  def warcToWet(spark: SparkSession, warcDir: String, wetDir: String,
      requireComplete: Boolean = false): Unit = {
    import spark.implicits._
    val enveloped = readWarc(spark, warcDir, requireComplete)
      .filter(col("warc_type") === "response")
      .withColumn("__is_http",
        lower(col("content_type")).startsWith("application/http"))
      // byte-preserving view of the block for envelope surgery
      .withColumn("__raw", decode(col("bytes"), "ISO-8859-1"))
      .withColumn("__he",
        when(col("__is_http"), instr(col("__raw"), "\r\n\r\n"))
          .otherwise(lit(0)))
      .withColumn("__head",
        when(col("__is_http") && col("__he") > 0,
          col("__raw").substr(lit(1), col("__he") - 1)).otherwise(lit("")))
      .withColumn("__status",
        regexp_extract(col("__head"), "^HTTP/[0-9.]+ ([0-9]{3})", 1)
          .cast("int"))
      .withColumn("__ctype",
        when(col("__is_http"),
          regexp_extract(col("__head"),
            "(?i)\\r\\ncontent-type:[ \\t]*([^\\r\\n]+)", 1))
          .otherwise(col("content_type")))
      .withColumn("__mime", lower(trim(regexp_extract(col("__ctype"),
        "^([^;]+)", 1))))
      .withColumn("__charset", lower(regexp_extract(col("__ctype"),
        "(?i)charset=\"?([a-zA-Z0-9_\\-]+)", 1)))
      .withColumn("__body",
        when(col("__is_http"),
          encode(col("__raw").substr(col("__he") + 4,
            length(col("__raw")) - col("__he") - 3), "ISO-8859-1"))
          .otherwise(col("bytes")))
      .withColumn("__text",
        org.apache.spark.sql.graftshim.ColumnExpr.column(
          graft.functions.DecodeCharset(
            org.apache.spark.sql.graftshim.ColumnExpr.expr(col("__body")),
            org.apache.spark.sql.graftshim.ColumnExpr.expr(
              when(col("__charset") === "", lit("UTF-8"))
                .otherwise(col("__charset"))))))
    val recs = enveloped
      .filter(col("__mime") === "text/html" && col("__text").isNotNull &&
        (!col("__is_http") || (col("__he") > 0 && col("__status") === 200)))
      .select(col("url"), lit("text/plain").as("content_type"),
        encode(graft.operators.Html.extractText(col("__text")),
          "UTF-8").as("bytes"))
      .as[WarcDoc]
    writeWarc(recs, wetDir, warcType = "conversion")
  }

  private def writeMember(gz: MemberGzip, md: java.security.MessageDigest,
      r: WarcDoc, warcType: String): Unit = {
    // digest() resets the instance, so one MessageDigest serves every
    // record of the task
    def md5Of(s: String): String = md.digest(s.getBytes(UTF_8))
      .map("%02x".format(_)).mkString
    // record IDs are deterministic md5s: the response's is md5(target
    // URI); a conversion record gets its own distinct ID and a
    // WARC-Refers-To that reconstructs the response's — closed-form,
    // no cross-record state
    val ownId = md5Of(if (warcType == "response") r.url
      else s"$warcType:${r.url}")
    val refersTo =
      if (warcType == "conversion")
        s"WARC-Refers-To: <urn:md5:${md5Of(r.url)}>\r\n"
      else ""
    val header =
      "WARC/1.0\r\n" +
      s"WARC-Type: $warcType\r\n" +
      s"WARC-Record-ID: <urn:md5:$ownId>\r\n" +
      refersTo +
      s"WARC-Date: $FixtureDate\r\n" +
      s"WARC-Target-URI: ${r.url}\r\n" +
      s"Content-Type: ${r.content_type}\r\n" +
      s"Content-Length: ${r.bytes.length}\r\n\r\n"
    gz.writeMember(header.getBytes(UTF_8), r.bytes, "\r\n\r\n".getBytes(UTF_8))
  }

  /** Read WARC containers under `path` (glob ok): `binaryFile` lists
    * the files (content column never selected — the scan reads
    * metadata only), each task streams and parses its files. Output
    * columns: `path, record_index, warc_type, url, content_type,
    * bytes`.
    *
    * Listing hygiene: `_`/`.`-prefixed basenames (committer markers)
    * and anything under a `_temporary` subtree are never parsed as
    * containers. With `requireComplete = true` every DISTINCT
    * directory contributing files must carry [[SuccessMarker]], or
    * the read fails loudly BEFORE parsing — a killed [[writeWarc]]
    * job leaves complete-looking part files, and silently reading a
    * partial corpus is exactly the under-report this source's
    * loud-failure design exists to prevent. (The directory check is
    * metadata-bounded: one row per container directory, not per
    * file.)
    */
  def readWarc(spark: SparkSession, path: String,
      requireComplete: Boolean = false): DataFrame = {
    import spark.implicits._
    val paths = spark.read.format("binaryFile").load(path)
      .select("path").as[String]
      .filter(!element_at(split(col("path"), "/"), -1).startsWith("_") &&
        !element_at(split(col("path"), "/"), -1).startsWith(".") &&
        !col("path").contains("/_temporary/"))
    if (requireComplete) {
      val conf = new Configuration()
      val dirs = paths
        .select(regexp_extract(col("path"), "^(.*)/[^/]+$", 1).as("__dir"))
        .distinct().as[String].collect()
      dirs.foreach { d =>
        val fs = FileSystem.get(new URI(d), conf)
        if (!fs.exists(new Path(d, SuccessMarker)))
          throw new java.io.IOException(
            s"incomplete WARC directory (no $SuccessMarker): $d — " +
              "the write job did not commit; refusing to silently " +
              "under-read a partial corpus")
      }
    }
    paths.mapPartitions(openAndParse).toDF()
  }

  /** Streaming WARC source: incremental file discovery over a growing
    * crawl directory — the standing-pipeline sibling of [[readWarc]],
    * so a live crawl's new segments feed a refresh continuously
    * instead of by batch replay. Spark's file-stream machinery does
    * the hard part (exactly-once discovery through the checkpoint log,
    * `maxFilesPerTrigger` batching, glob paths); the scan is the same
    * metadata-only `binaryFile` listing as the batch reader (contents
    * are never materialized into rows — the pruned-ReadSchema
    * contract), and each task streams and parses its files with the
    * identical record iterator. Committer markers and `_temporary`
    * debris are excluded exactly as in [[readWarc]].
    *
    * Restart/refresh semantics: with a persistent `checkpointLocation`
    * a later run (e.g. `Trigger.AvailableNow` fired per crawl drop)
    * processes ONLY files the checkpoint has not seen — pair with
    * [[graft.streaming.VintageStreaming.appendSink]]'s transaction
    * watermark for an end-to-end exactly-once standing refresh (q129).
    *
    * LISTING LIFECYCLE — the operational cost model of Spark's file
    * stream source, which this reader inherits: every trigger LISTS
    * the watched glob, and the seen-files map in the checkpoint grows
    * with every file ever processed — both are O(all-files-ever), not
    * O(new). A crawl directory accumulating millions of segments
    * makes each trigger's listing (and the checkpoint compact files)
    * the bottleneck long before parsing does. Deployments bound it
    * with the source's own lifecycle `options`, forwarded verbatim:
    *  - `cleanSource=archive` + `sourceArchiveDir=...` (or
    *    `cleanSource=delete`): processed files are moved out of the
    *    watched tree a few triggers after commit, so the LISTING
    *    stays O(unprocessed). The archive dir must be outside the
    *    watched glob's depth or the source refuses it.
    *  - `maxFileAge=7d`: files older than the age (relative to the
    *    newest file) are ignored AND aged out of the seen-map, so the
    *    CHECKPOINT stays bounded on a rolling-window crawl dir. (The
    *    default is already 7d; it only disables when
    *    `latestFirst=true` with a trigger cap.)
    *  - date-bucketed segment dirs with a moving glob bound the
    *    listing without either option, at the cost of re-pointing the
    *    query per window (new glob = new source = fresh seen-map).
    * WarcStreamSpec exercises the archive path end to end.
    *
    * `requireComplete` is the streaming sibling of [[readWarc]]'s
    * gate, with per-TASK enforcement (streaming discovery has no
    * batch-front-door to check at): each task verifies its files'
    * container directories carry [[SuccessMarker]] BEFORE parsing —
    * one metadata call per distinct directory per task — and fails
    * the micro-batch loudly otherwise. A drain racing a mid-write
    * segment therefore ERRORS instead of silently ingesting the part
    * files committed so far; the failed batch was never committed, so
    * re-draining after the writer's job-level commit processes the
    * complete segment (offsets are replayed from the checkpoint).
    * Sequence drains after writer commits to avoid the error path
    * entirely.
    */
  def readWarcStream(spark: SparkSession, path: String,
      maxFilesPerTrigger: Int = 0,
      requireComplete: Boolean = false,
      options: Map[String, String] = Map.empty): DataFrame = {
    import spark.implicits._
    // binaryFile's FIXED schema, stated explicitly (streaming file
    // sources refuse inference); only `path` is ever selected — the
    // content column stays pruned out of the scan, as in the batch
    // reader
    val reader = spark.readStream.format("binaryFile")
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("path",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("modificationTime",
          org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.types.StructField("length",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("content",
          org.apache.spark.sql.types.BinaryType))))
    if (maxFilesPerTrigger > 0)
      reader.option("maxFilesPerTrigger", maxFilesPerTrigger)
    options.foreach { case (k, v) => reader.option(k, v) }
    val paths = reader.load(path)
      .select("path").as[String]
      .filter(!element_at(split(col("path"), "/"), -1).startsWith("_") &&
        !element_at(split(col("path"), "/"), -1).startsWith(".") &&
        !col("path").contains("/_temporary/"))
    val parse: Iterator[String] => Iterator[WarcRecord] =
      if (requireComplete) openAndParseComplete else openAndParse
    paths.mapPartitions(parse).toDF()
  }

  /** [[openAndParse]] behind the per-task completeness gate: every
    * distinct container directory in the partition must carry
    * [[SuccessMarker]] before any of its files is parsed. The
    * verified-dir cache is per task, so the cost is one `exists` per
    * directory per task — metadata-bounded, like the batch reader's
    * front-door check.
    */
  private def openAndParseComplete(it: Iterator[String])
      : Iterator[WarcRecord] = {
    val conf = new Configuration()
    val verified = scala.collection.mutable.HashSet[String]()
    openAndParse(it.map { p =>
      val dir = p.substring(0, p.lastIndexOf('/'))
      if (verified.add(dir)) {
        val fs = FileSystem.get(new URI(dir), conf)
        if (!fs.exists(new Path(dir, SuccessMarker)))
          throw new java.io.IOException(
            s"incomplete WARC directory (no $SuccessMarker): $dir — " +
              "the write job has not committed; failing this drain " +
              "rather than silently under-reading a partial segment " +
              "(re-drain after the writer commits: the batch was not " +
              "committed, so its files replay)")
      }
      p
    })
  }

  /** Per-task open+parse over a partition of container paths — shared
    * by the batch and streaming readers.
    */
  private def openAndParse(it: Iterator[String]): Iterator[WarcRecord] = {
    val conf = new Configuration()
    // the parser closes its stream at EOF, but a downstream operator
    // that short-circuits (limit, take) abandons the iterator mid-
    // file — the task-completion hook closes whatever is still open
    val open = new java.util.ArrayList[InputStream]()
    Option(org.apache.spark.TaskContext.get()).foreach(
      _.addTaskCompletionListener[Unit] { _ =>
        open.forEach { s =>
          try s.close() catch { case _: java.io.IOException => () }
        }
      })
    it.flatMap { p =>
      val fs = FileSystem.get(new URI(p), conf)
      val raw = fs.open(new Path(new URI(p)))
      val head = new Array[Byte](2)
      val n = raw.read(head)
      raw.seek(0)
      val gzipped = n == 2 &&
        (head(0) & 0xff) == 0x1f && (head(1) & 0xff) == 0x8b
      val in = new BufferedInputStream(
        if (gzipped) new GZIPInputStream(raw) else raw, 1 << 16)
      open.add(in)
      parseWarcStream(p, in)
    }
  }

  /** Streaming record iterator over one decompressed WARC byte stream.
    * Closes the stream at EOF; throws (with path + record index) on
    * any malformed structure.
    */
  private[sources] def parseWarcStream(path: String,
      in: InputStream): Iterator[WarcRecord] = new Iterator[WarcRecord] {
    private var idx = 0L
    private var nextRec: WarcRecord = _
    private var done = false

    /** Bytes until LF (exclusive), trailing CR stripped, decoded as
      * UTF-8 (header values — target URIs — are UTF-8 on the wire;
      * per-byte toChar would mojibake multi-byte code points); null at
      * EOF before any byte.
      */
    private def readLine(): String = {
      val buf = new java.io.ByteArrayOutputStream(128)
      var b = in.read()
      if (b < 0) return null
      while (b >= 0 && b != '\n') { buf.write(b); b = in.read() }
      val bytes = buf.toByteArray
      val n = if (bytes.nonEmpty && bytes(bytes.length - 1) == '\r')
        bytes.length - 1 else bytes.length
      new String(bytes, 0, n, UTF_8)
    }

    private def parseNext(): WarcRecord = {
      // skip inter-record blank lines (the \r\n\r\n trailers)
      var line = readLine()
      while (line != null && line.isEmpty) line = readLine()
      if (line == null) { in.close(); return null }
      if (!line.startsWith("WARC/"))
        throw new java.io.IOException(
          s"malformed WARC at $path record $idx: expected version line, got '$line'")
      val fields = scala.collection.mutable.Map.empty[String, String]
      line = readLine()
      while (line != null && line.nonEmpty) {
        val colon = line.indexOf(':')
        if (colon < 0) throw new java.io.IOException(
          s"malformed WARC header field at $path record $idx: '$line'")
        fields(line.substring(0, colon).trim.toLowerCase) =
          line.substring(colon + 1).trim
        line = readLine()
      }
      if (line == null) throw new EOFException(
        s"truncated WARC header at $path record $idx")
      val len = fields.getOrElse("content-length", throw new java.io.IOException(
        s"WARC record without Content-Length at $path record $idx")).toLong
      require(len <= Int.MaxValue,
        s"WARC payload over 2 GB at $path record $idx: $len")
      val block = in.readNBytes(len.toInt)
      if (block.length != len) throw new EOFException(
        s"truncated WARC payload at $path record $idx: " +
          s"expected $len bytes, got ${block.length}")
      val r = WarcRecord(path, idx,
        fields.getOrElse("warc-type", ""),
        fields.getOrElse("warc-target-uri", ""),
        fields.getOrElse("content-type", ""), block)
      idx += 1
      r
    }

    override def hasNext: Boolean = {
      if (!done && nextRec == null) {
        nextRec = parseNext()
        if (nextRec == null) done = true
      }
      !done
    }
    override def next(): WarcRecord = {
      if (!hasNext) throw new NoSuchElementException("end of WARC stream")
      val r = nextRec; nextRec = null; r
    }
  }
}
