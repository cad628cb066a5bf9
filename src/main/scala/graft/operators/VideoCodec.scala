package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.{ByteBuffer, ByteOrder}

import javax.imageio.ImageIO

import org.apache.spark.sql.Dataset

/** REAL video codec, JDK-only: AVI is a RIFF container (the same
  * chunk grammar as WAVE), and two genuine video codecs are writable
  * without any native library —
  *
  *   - `"DIB "`: uncompressed bottom-up BGR24 device-independent
  *     bitmap frames (`biCompression = BI_RGB`), byte-exact and
  *     LOSSLESS — the gate codec, every decoded statistic is
  *     formula-predictable;
  *   - `"MJPG"`: Motion-JPEG, one baseline JPEG per frame via
  *     `javax.imageio` — lossy, so specs assert near-equality, not
  *     hashes.
  *
  * The muxer writes RIFF('AVI ') → LIST(hdrl){avih, LIST(strl){strh,
  * strf}} → LIST(movi){00db/00dc…}; the demuxer walks the chunk tree
  * (header-only probe never touches frame bytes). This replaces the
  * former header stub ([[Multimodal]]) with a real container + real
  * codecs; H.264/VP9 have no JDK implementation — [[FfmpegVideo]]
  * decodes them through a runtime-probed `ffmpeg` binary where one
  * exists and skips cleanly where none does.
  *
  * 100 TB notes: same batch discipline as [[MediaCodec]] — every
  * stage is `mapPartitions` iterator-in/iterator-out, zero shuffle,
  * `ImageIO.setUseCache(false)` in the MJPG prologue; frame sampling
  * (`stride`) skips whole encoded frames WITHOUT decoding them, the
  * keyframe-extraction access pattern.
  */
object VideoCodec {

  /** What to render. Frame `i`'s solid color advances deterministically
    * from the base: `r_i=(r0+7i)%256, g_i=(g0+11i)%256, b_i=(b0+13i)%256`
    * — distinct per frame, so a frame-ordering or sampling bug is
    * arithmetically visible downstream.
    */
  case class VideoSpec(media_id: Long, width: Int, height: Int,
                       n_frames: Int, r0: Int, g0: Int, b0: Int,
                       fps: Int, codec: String)

  /** Container metadata, readable WITHOUT decoding any frame. */
  case class VideoMeta(media_id: Long, width: Int, height: Int,
                       n_frames: Long, fps: Int, codec: String, n_bytes: Int)

  /** Exact per-frame channel sums (for DIB; MJPG sums are approximate
    * by nature of JPEG).
    */
  case class FrameStats(media_id: Long, frame_idx: Int, width: Int,
                        height: Int, sum_r: Long, sum_g: Long, sum_b: Long)

  def frameColor(s: VideoSpec, i: Int): (Int, Int, Int) =
    ((s.r0 + 7 * i) % 256, (s.g0 + 11 * i) % 256, (s.b0 + 13 * i) % 256)

  // ---- RIFF plumbing (little-endian throughout) ----

  private def put4(bb: ByteBuffer, s: String): Unit = {
    require(s.length == 4, s"fourcc must be 4 chars: '$s'")
    bb.put(s.getBytes("US-ASCII"))
  }

  /** One encoded DIB frame: bottom-up BGR rows, stride padded to 4. */
  private def dibFrame(w: Int, h: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    val stride = ((w * 3 + 3) / 4) * 4
    val out = new Array[Byte](stride * h)
    var row = 0
    while (row < h) {
      var x = 0
      while (x < w) {
        val o = row * stride + x * 3
        out(o) = b.toByte; out(o + 1) = g.toByte; out(o + 2) = r.toByte
        x += 1
      }
      row += 1
    }
    out
  }

  private def jpegFrame(w: Int, h: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g2 = img.createGraphics()
    try { g2.setColor(new java.awt.Color(r, g, b)); g2.fillRect(0, 0, w, h) }
    finally g2.dispose()
    val out = new ByteArrayOutputStream()
    require(ImageIO.write(img, "jpg", out), "no JPEG writer")
    out.toByteArray
  }

  /** Assemble the AVI container around pre-encoded frames. */
  private def muxAvi(w: Int, h: Int, fps: Int, codec: String,
      frames: Seq[Array[Byte]]): Array[Byte] = {
    val isDib = codec == "DIB "
    val frameCk = if (isDib) "00db" else "00dc" // uncompressed vs compressed
    def padded(n: Int) = n + (n & 1) // RIFF chunks are word-aligned
    val moviData = 4 + frames.map(f => 8 + padded(f.length)).sum
    val hdrlData = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40))
    val riffData = 4 + (8 + hdrlData) + (8 + moviData)
    val bb = ByteBuffer.allocate(8 + riffData).order(ByteOrder.LITTLE_ENDIAN)

    put4(bb, "RIFF"); bb.putInt(riffData); put4(bb, "AVI ")
    put4(bb, "LIST"); bb.putInt(hdrlData); put4(bb, "hdrl")
    // avih: MainAVIHeader (56 bytes)
    put4(bb, "avih"); bb.putInt(56)
    bb.putInt(1000000 / fps)                  // microSecPerFrame
    bb.putInt(0).putInt(0).putInt(0)          // maxBytesPerSec, padding, flags (no idx1 → no AVIF_HASINDEX)
    bb.putInt(frames.size)                    // totalFrames
    bb.putInt(0).putInt(1)                    // initialFrames, streams
    bb.putInt(frames.map(_.length).foldLeft(0)(math.max)) // suggestedBufferSize
    bb.putInt(w).putInt(h)
    bb.putInt(0).putInt(0).putInt(0).putInt(0) // reserved
    // strl list
    put4(bb, "LIST"); bb.putInt(4 + (8 + 56) + (8 + 40)); put4(bb, "strl")
    // strh: AVIStreamHeader (56 bytes)
    put4(bb, "strh"); bb.putInt(56)
    put4(bb, "vids"); put4(bb, codec)
    bb.putInt(0).putInt(0).putInt(0)          // flags, prio+lang, initialFrames
    bb.putInt(1).putInt(fps)                  // scale, rate → fps = rate/scale
    bb.putInt(0).putInt(frames.size)          // start, length (in frames)
    bb.putInt(frames.map(_.length).foldLeft(0)(math.max))
    bb.putInt(-1).putInt(0)                   // quality, sampleSize
    bb.putShort(0).putShort(0)
      .putShort(w.toShort).putShort(h.toShort) // rcFrame
    // strf: BITMAPINFOHEADER (40 bytes)
    put4(bb, "strf"); bb.putInt(40)
    bb.putInt(40).putInt(w).putInt(h)
    bb.putShort(1).putShort(24)               // planes, bitcount
    if (isDib) bb.putInt(0) else put4(bb, "MJPG") // biCompression
    bb.putInt(if (isDib) ((w * 3 + 3) / 4) * 4 * h else 0) // biSizeImage
    bb.putInt(0).putInt(0).putInt(0).putInt(0)
    // movi
    put4(bb, "LIST"); bb.putInt(moviData); put4(bb, "movi")
    frames.foreach { f =>
      put4(bb, frameCk); bb.putInt(f.length); bb.put(f)
      if ((f.length & 1) == 1) bb.put(0.toByte)
    }
    require(bb.remaining() == 0, s"mux size accounting off by ${bb.remaining()}")
    bb.array()
  }

  /** Parsed container: dims/fps/codec from the headers, each frame's
    * `(offset, length)` into `bytes` — frames are NOT copied until a
    * decoder asks (the probe path stays O(headers)).
    */
  private final case class ParsedAvi(width: Int, height: Int, fps: Int,
      codec: String, frameSpans: Seq[(Int, Int)])

  private def parseAvi(bytes: Array[Byte], framesWanted: Boolean): ParsedAvi = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def fourcc(): String = {
      val b = new Array[Byte](4); bb.get(b); new String(b, "US-ASCII")
    }
    require(fourcc() == "RIFF", "not a RIFF file")
    bb.getInt() // riff size
    require(fourcc() == "AVI ", "not an AVI container")
    var (w, h, fps, codec) = (0, 0, 0, "")
    val spans = Seq.newBuilder[(Int, Int)]
    def walk(end: Int): Unit = {
      while (bb.position() < end) {
        val id = fourcc()
        val size = bb.getInt()
        val dataStart = bb.position()
        id match {
          case "LIST" =>
            fourcc() // list type (hdrl/strl/movi) — children carry the data
            walk(dataStart + size)
          case "strh" =>
            val tpe = fourcc(); val handler = fourcc()
            if (tpe == "vids") {
              codec = handler
              bb.position(dataStart + 20)
              val scale = bb.getInt(); val rate = bb.getInt()
              fps = if (scale != 0) rate / scale else 0
            }
          case "strf" =>
            bb.position(dataStart + 4)
            w = bb.getInt(); h = bb.getInt()
          case ck if ck.endsWith("db") || ck.endsWith("dc") =>
            if (framesWanted) spans += ((dataStart, size))
          case _ => () // avih (totals derivable), idx1, junk: skip
        }
        bb.position(dataStart + size + (size & 1))
      }
    }
    walk(bytes.length)
    require(w > 0 && h > 0 && codec.nonEmpty,
      "AVI missing vids stream headers")
    ParsedAvi(w, h, fps, codec, spans.result())
  }

  // ---- Spark stages ----

  /** Render each spec to a complete AVI file (real container, real
    * frames). Batch-shaped like every media stage.
    */
  def renderAvis(ds: Dataset[VideoSpec]): Dataset[Multimodal.MediaRecord] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { batch =>
      ImageIO.setUseCache(false)
      batch.map { s =>
        require(s.codec == "DIB " || s.codec == "MJPG",
          s"media_id=${s.media_id}: codec must be 'DIB ' or 'MJPG', got '${s.codec}'")
        val frames = (0 until s.n_frames).map { i =>
          val (r, g, b) = frameColor(s, i)
          if (s.codec == "DIB ") dibFrame(s.width, s.height, r, g, b)
          else jpegFrame(s.width, s.height, r, g, b)
        }
        Multimodal.MediaRecord(s.media_id, "video",
          muxAvi(s.width, s.height, s.fps, s.codec, frames))
      }
    }
  }

  /** Header-only probe: dims, fps, codec, frame count — never touches
    * a frame's bytes (the metadata pass over a video corpus).
    */
  def probeAvis(ds: Dataset[Multimodal.MediaRecord]): Dataset[VideoMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map { m =>
      val p = parseAvi(m.bytes, framesWanted = true)
      VideoMeta(m.media_id, p.width, p.height, p.frameSpans.size.toLong,
        p.fps, p.codec.trim, m.bytes.length)
    })
  }

  /** Decode every `stride`-th frame to exact channel sums. Skipped
    * frames are never decoded (for MJPG never even JPEG-parsed) —
    * sampling a 1% keyframe grid over a PB of video costs 1% of the
    * decode, not a full pass.
    */
  def decodeFrames(ds: Dataset[Multimodal.MediaRecord],
      stride: Int = 1): Dataset[FrameStats] = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    import ds.sparkSession.implicits._
    ds.mapPartitions { batch =>
      ImageIO.setUseCache(false)
      batch.flatMap { m =>
        val p = parseAvi(m.bytes, framesWanted = true)
        val stride3 = ((p.width * 3 + 3) / 4) * 4
        p.frameSpans.zipWithIndex.collect {
          case ((off, len), idx) if idx % stride == 0 =>
            var (sr, sg, sb) = (0L, 0L, 0L)
            if (p.codec == "DIB ") {
              require(len == stride3 * p.height,
                s"media_id=${m.media_id} frame $idx: DIB length $len != ${stride3 * p.height}")
              var row = 0
              while (row < p.height) {
                var x = 0
                while (x < p.width) {
                  val o = off + row * stride3 + x * 3
                  sb += m.bytes(o) & 0xff
                  sg += m.bytes(o + 1) & 0xff
                  sr += m.bytes(o + 2) & 0xff
                  x += 1
                }
                row += 1
              }
            } else {
              val img = ImageIO.read(
                new ByteArrayInputStream(m.bytes, off, len))
              require(img != null,
                s"media_id=${m.media_id} frame $idx: undecodable MJPG frame")
              val px = img.getRGB(0, 0, img.getWidth, img.getHeight,
                null, 0, img.getWidth)
              var i = 0
              while (i < px.length) {
                val v = px(i)
                sr += (v >> 16) & 0xff; sg += (v >> 8) & 0xff; sb += v & 0xff
                i += 1
              }
            }
            FrameStats(m.media_id, idx, p.width, p.height, sr, sg, sb)
        }.iterator
      }
    }
  }
}
