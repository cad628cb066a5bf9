package graft.operators

import java.io.{BufferedInputStream, BufferedOutputStream}

import org.apache.spark.sql.Dataset

/** Inter-frame video decode (H.264/VP9/AV1 — anything the host's
  * `ffmpeg` reads) behind a RUNTIME-PROBED binary: the JDK ships no
  * inter-frame codec (see [[VideoCodec]]'s header — DIB and MJPEG are
  * the honest JDK-only tier), so this stage shells out to an `ffmpeg`
  * found on PATH (or `GRAFT_FFMPEG`) and SKIPS CLEANLY — empty output,
  * one log line — when no binary exists, keeping every pipeline that
  * composes it runnable in codec-less containers.
  *
  * The Spark-side plumbing is the real thing either way: the stage is
  * `mapPartitions` iterator-in/iterator-out like [[MediaCodec]] (one
  * ffmpeg process per record, container bytes in via stdin, raw RGB24
  * frames out via stdout, stderr discarded so neither pipe can
  * deadlock), produces the exact [[VideoCodec.FrameStats]] rows the
  * JDK decoder produces, and shuffles nothing. Output geometry is
  * caller-fixed (`-vf scale`) so the rawvideo stream parses without
  * trusting container headers; `stride` samples every n-th frame via
  * ffmpeg's `select` filter — the decode itself cannot skip delta
  * frames (inter-frame dependencies), which is precisely why the
  * keyframe-grid access pattern uses `-skip_frame nokey` on real
  * deployments.
  *
  * FfmpegVideoSpec pins BOTH contracts: in a container with ffmpeg it
  * decodes an MJPEG AVI rendered by [[VideoCodec.renderAvis]] and
  * checks the channel sums against the JDK decode of the same bytes;
  * without ffmpeg it asserts the clean-skip behavior.
  */
object FfmpegVideo extends org.apache.spark.internal.Logging {

  /** Resolved ffmpeg binary, probed once per JVM. `GRAFT_FFMPEG` is
    * an exclusive override: when set, ONLY that binary is probed (a
    * user pinning a specific build must not silently get a PATH
    * fallback); otherwise the first working `ffmpeg` on PATH wins.
    * `None` unless `<binary> -version` runs and exits 0 within 10 s —
    * the probe output is drained on a daemon thread and the process
    * force-killed on timeout, so a wedged candidate can neither hang
    * the (lazy, once-per-JVM) probe nor leak.
    */
  lazy val binary: Option[String] = {
    val candidates = sys.env.get("GRAFT_FFMPEG") match {
      case Some(pinned) => Seq(pinned)
      case None => sys.env.getOrElse("PATH", "")
        .split(java.io.File.pathSeparator).toSeq.filter(_.nonEmpty)
        .map(d => java.nio.file.Paths.get(d, "ffmpeg").toString)
    }
    candidates.find { bin =>
      try {
        val p = new ProcessBuilder(bin, "-version")
          .redirectErrorStream(true).start()
        val drain = new Thread(() => {
          try p.getInputStream.readAllBytes()
          catch { case _: java.io.IOException => () }
        }, "ffmpeg-probe-drain")
        drain.setDaemon(true)
        drain.start()
        val done = p.waitFor(10, java.util.concurrent.TimeUnit.SECONDS)
        if (!done) p.destroyForcibly()
        done && p.exitValue() == 0
      } catch { case _: java.io.IOException => false }
    }
  }

  def isAvailable: Boolean = binary.isDefined

  /** Decode every `stride`-th frame of each record to exact channel
    * sums at a caller-fixed `width`×`height` (ffmpeg scales — the
    * resize every feature-extract pipeline does anyway). Records an
    * ffmpeg run fails on are SKIPPED with a log line, not fatal: a
    * 100 TB video corpus always contains undecodable members, and one
    * of them must not kill a stage. Returns an EMPTY dataset (plus
    * one warning) when no ffmpeg binary exists.
    */
  def decodeFrames(ds: Dataset[Multimodal.MediaRecord], width: Int,
      height: Int, stride: Int = 1): Dataset[VideoCodec.FrameStats] = {
    require(width > 0 && height > 0, s"bad geometry ${width}x$height")
    require(stride >= 1, s"stride must be >= 1, got $stride")
    import ds.sparkSession.implicits._
    binary match {
      case None =>
        logWarning("no ffmpeg binary on PATH (or GRAFT_FFMPEG) — " +
          "inter-frame decode stage skipped; JDK-tier codecs (DIB, " +
          "MJPEG) remain available via VideoCodec.decodeFrames")
        ds.sparkSession.emptyDataset[VideoCodec.FrameStats]
      case Some(bin) => decodeFramesWith(bin, ds, width, height, stride)
    }
  }

  /** [[decodeFrames]] with an explicit binary, bypassing the probe —
    * the spec seam: FfmpegVideoSpec drives the full process plumbing
    * (feeder thread, watchdog kill, frame slicing, failure skip)
    * against stub executables in containers that ship no ffmpeg.
    */
  private[operators] def decodeFramesWith(bin: String,
      ds: Dataset[Multimodal.MediaRecord], width: Int, height: Int,
      stride: Int): Dataset[VideoCodec.FrameStats] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap(m => decodeOne(bin, m, width, height, stride)))
  }

  /** Per-record decode deadline, ms. Overridable via the
    * `graft.ffmpeg.timeout.ms` system property (the spec shrinks it to
    * test the watchdog without a 60 s wait).
    */
  private def timeoutMs: Long =
    sys.props.get("graft.ffmpeg.timeout.ms").flatMap(_.toLongOption)
      .getOrElse(60000L)

  /** One record through one ffmpeg process. stdin is fed from a
    * separate thread (ffmpeg reads input and writes output
    * concurrently; a single-threaded write-then-read deadlocks once
    * either pipe buffer fills), stderr goes to /dev/null, stdout is
    * consumed as fixed-size RGB24 frames.
    */
  private def decodeOne(bin: String, m: Multimodal.MediaRecord,
      width: Int, height: Int, stride: Int): Iterator[VideoCodec.FrameStats] = {
    val cmd = Seq(bin, "-v", "error", "-i", "pipe:0",
      "-vf", s"select=not(mod(n\\,$stride)),scale=$width:$height",
      "-fps_mode", "passthrough",
      "-f", "rawvideo", "-pix_fmt", "rgb24", "pipe:1")
    val frameBytes = width * height * 3
    try {
      val p = new ProcessBuilder(cmd: _*)
        .redirectError(ProcessBuilder.Redirect.DISCARD).start()
      // hard deadline enforced OUT-OF-BAND: the stdout drain below
      // blocks in readNBytes with no timeout of its own, so a wedged
      // ffmpeg (demuxer loop, no output, no exit) would otherwise hang
      // the Spark task forever — killing the process TREE EOFs the
      // pipe and unblocks the read, turning a stall into a skipped
      // record. Descendants first: a wrapper script's child inherits
      // the stdout fd and would keep the pipe open past its parent's
      // death (measured: a stub wrapper's child held the read blocked
      // for its full sleep).
      def killTree(): Unit = {
        p.descendants().forEach(h => { h.destroyForcibly(); () })
        p.destroyForcibly()
        ()
      }
      val watchdog = new java.util.Timer(s"ffmpeg-watchdog-${m.media_id}", true)
      val deadline = timeoutMs
      watchdog.schedule(new java.util.TimerTask {
        def run(): Unit = killTree()
      }, deadline)
      val feeder = new Thread(() => {
        val in = new BufferedOutputStream(p.getOutputStream)
        try { in.write(m.bytes); in.close() }
        catch { case _: java.io.IOException => () } // ffmpeg closed early
      }, s"ffmpeg-feed-${m.media_id}")
      feeder.setDaemon(true)
      feeder.start()
      val out = new BufferedInputStream(p.getInputStream)
      val stats = Iterator.continually(out.readNBytes(frameBytes))
        .takeWhile(_.length == frameBytes)
        .zipWithIndex.map { case (px, i) =>
          var (sr, sg, sb) = (0L, 0L, 0L)
          var o = 0
          while (o < px.length) {
            sr += px(o) & 0xff; sg += px(o + 1) & 0xff; sb += px(o + 2) & 0xff
            o += 3
          }
          VideoCodec.FrameStats(m.media_id, i * stride, width, height,
            sr, sg, sb)
        }.toVector // drain fully before waitFor
      feeder.join(10000)
      val done = p.waitFor(deadline + 1000,
        java.util.concurrent.TimeUnit.MILLISECONDS)
      watchdog.cancel()
      if (!done) killTree()
      if (!done || p.exitValue() != 0) {
        logWarning(s"ffmpeg failed on media_id=${m.media_id} " +
          s"(exit=${if (done) p.exitValue() else "timeout"}) — record skipped")
        Iterator.empty
      } else stats.iterator
    } catch {
      case e: java.io.IOException =>
        logWarning(s"ffmpeg spawn failed on media_id=${m.media_id}: " +
          s"${e.getMessage} — record skipped")
        Iterator.empty
    }
  }
}
