package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.Dataset

/** REAL media codecs behind the [[Multimodal]] seam, using only the
  * JDK: `javax.imageio` (PNG, JPEG, BMP, GIF) for images and
  * `javax.sound.sampled` (WAVE/AU/AIFF) for audio. No external
  * libraries; everything here ships with Java 17's `java.desktop`
  * module and runs headless.
  *
  * This fulfils the swap the stub stages were shaped for
  * (Multimodal.scala:20-27): each heavy stage is iterator-in /
  * iterator-out over a typed Dataset, with per-partition codec setup in
  * the `mapPartitions` prologue. Video (H.264 etc.) remains honestly
  * stubbed in [[Multimodal]] — no video codec exists in the JDK.
  *
  * Reference scope: the reference engine (sosna/sdlt) has no media
  * surface; this layer is part of the training-data-pipeline mandate
  * (multimodal binary columns with real decode / resize / feature
  * stages).
  *
  * 100 TB notes:
  *   - `ImageIO.setUseCache(false)` in every partition prologue: the
  *     default disk-backed stream cache would add a tmp-file write per
  *     image on every executor — pure overhead for in-memory blobs.
  *   - Blobs dominate row size; size `spark.sql.files.maxPartitionBytes`
  *     so one task's batch of decoded `BufferedImage`s (w*h*4 bytes
  *     each, often 10-50x the encoded payload) fits in executor memory.
  *   - Decode is CPU-bound and embarrassingly parallel: no shuffle in
  *     any stage below; scale = add executors.
  */
object MediaCodec {

  /** What to render: a solid-color image (deterministic by
    * construction, so downstream pixel statistics are formula-
    * predictable — this is what lets the driver gate hash-pin a real
    * encode→decode→resize→decode roundtrip against a SQL oracle).
    */
  case class ImageSpec(media_id: Long, width: Int, height: Int,
                       r: Int, g: Int, b: Int, format: String)

  /** Decoded pixel statistics. Channel SUMS (not means) so every value
    * is an exact integer: for a solid-color image sum_r = r * w * h.
    */
  case class ImageStats(media_id: Long, width: Int, height: Int,
                        sum_r: Long, sum_g: Long, sum_b: Long, n_bytes: Int)

  case class AudioSpec(media_id: Long, n_samples: Int, amplitude: Int,
                       sample_rate: Int)

  /** Decoded audio statistics: 16-bit PCM peak is exact for a square
    * wave of known amplitude.
    */
  case class AudioStats(media_id: Long, n_samples: Long, sample_rate: Int,
                        peak: Int, n_bytes: Int)

  /** Render each spec to real encoded bytes (PNG/JPEG/BMP/GIF via
    * ImageIO). Batch-shaped: writer lookup and cache config once per
    * partition.
    */
  def renderImages(ds: Dataset[ImageSpec]): Dataset[Multimodal.MediaRecord] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { batch =>
      ImageIO.setUseCache(false)
      batch.map { s =>
        val img = new BufferedImage(s.width, s.height, BufferedImage.TYPE_INT_RGB)
        val rgb = (s.r << 16) | (s.g << 8) | s.b
        val g2 = img.createGraphics()
        try { g2.setColor(new java.awt.Color(rgb)); g2.fillRect(0, 0, s.width, s.height) }
        finally g2.dispose()
        val out = new ByteArrayOutputStream()
        require(ImageIO.write(img, s.format, out), s"no ImageIO writer for '${s.format}'")
        Multimodal.MediaRecord(s.media_id, "image", out.toByteArray)
      }
    }
  }

  /** REAL decode: `ImageIO.read` sniffs the container format from the
    * bytes (PNG/JPEG/BMP/GIF) and yields pixels; we fold exact
    * per-channel sums. Fails loudly on undecodable bytes — silently
    * skipping corrupt media is how a 100 TB corpus quietly loses rows.
    */
  def decodeImages(ds: Dataset[Multimodal.MediaRecord]): Dataset[ImageStats] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { batch =>
      ImageIO.setUseCache(false)
      batch.map { m =>
        val img = ImageIO.read(new ByteArrayInputStream(m.bytes))
        require(img != null, s"media_id=${m.media_id}: bytes are not a decodable image")
        val (w, h) = (img.getWidth, img.getHeight)
        val px = img.getRGB(0, 0, w, h, null, 0, w)
        var (sr, sg, sb) = (0L, 0L, 0L)
        var i = 0
        while (i < px.length) {
          val p = px(i)
          sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
          i += 1
        }
        ImageStats(m.media_id, w, h, sr, sg, sb, m.bytes.length)
      }
    }
  }

  /** REAL resize: decode, scale with Graphics2D (any interpolation is
    * exact on solid-color sources — every sample site sees the same
    * color), re-encode. Same batch shape as the stub resize it
    * replaces.
    */
  def resizeImages(ds: Dataset[Multimodal.MediaRecord], width: Int, height: Int,
                   format: String = "png"): Dataset[Multimodal.MediaRecord] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { batch =>
      ImageIO.setUseCache(false)
      batch.map { m =>
        val src = ImageIO.read(new ByteArrayInputStream(m.bytes))
        require(src != null, s"media_id=${m.media_id}: bytes are not a decodable image")
        val dst = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
        val g2 = dst.createGraphics()
        try g2.drawImage(src, 0, 0, width, height, null) finally g2.dispose()
        val out = new ByteArrayOutputStream()
        require(ImageIO.write(dst, format, out), s"no ImageIO writer for '$format'")
        Multimodal.MediaRecord(m.media_id, m.kind, out.toByteArray)
      }
    }
  }

  /** Render 16-bit mono PCM square waves to real WAVE containers
    * (RIFF header + little-endian samples) via `AudioSystem`.
    */
  def renderWavs(ds: Dataset[AudioSpec]): Dataset[Multimodal.MediaRecord] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { batch =>
      batch.map { s =>
        val amp = s.amplitude
        val pcm = new Array[Byte](s.n_samples * 2)
        var i = 0
        while (i < s.n_samples) {
          val v = if ((i / 8) % 2 == 0) amp else -amp // square wave, period 16
          pcm(2 * i) = (v & 0xff).toByte
          pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
          i += 1
        }
        val fmt = new AudioFormat(s.sample_rate.toFloat, 16, 1, true, false)
        val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt, s.n_samples.toLong)
        val out = new ByteArrayOutputStream()
        AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
        Multimodal.MediaRecord(s.media_id, "audio", out.toByteArray)
      }
    }
  }

  /** REAL audio decode: `AudioSystem` parses the WAVE container
    * (format chunk, sample rate, frame count), then we scan the 16-bit
    * little-endian PCM frames for the absolute peak.
    */
  def decodeWavs(ds: Dataset[Multimodal.MediaRecord]): Dataset[AudioStats] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { batch =>
      batch.map { m =>
        val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(m.bytes))
        try {
          val fmt = ais.getFormat
          require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
            s"media_id=${m.media_id}: expected 16-bit mono PCM, got $fmt")
          val nFrames = ais.getFrameLength
          val pcm = ais.readAllBytes()
          var peak = 0
          var i = 0
          while (i + 1 < pcm.length) {
            val v = ((pcm(i + 1) << 8) | (pcm(i) & 0xff)).toShort.toInt
            val a = math.abs(v)
            if (a > peak) peak = a
            i += 2
          }
          AudioStats(m.media_id, nFrames, fmt.getSampleRate.toInt, peak, m.bytes.length)
        } finally ais.close()
      }
    }
  }
}
