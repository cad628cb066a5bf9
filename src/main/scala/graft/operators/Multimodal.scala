package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing: media as opaque
  * `binary` columns with a typed metadata struct, plus the
  * decode / feature-extract / resize / frame-sample pipeline stages a
  * training-data pipeline needs.
  *
  * Image (PNG/JPEG/BMP/GIF) and audio (WAVE) codecs are REAL — see
  * [[MediaCodec]] (`javax.imageio` / `javax.sound.sampled`) — and so
  * is VIDEO: [[VideoCodec]] muxes/demuxes real AVI containers with
  * uncompressed DIB or Motion-JPEG frames, all JDK-only, in exactly
  * the batch shapes below. Only inter-frame codecs (H.264/VP9) stay
  * out of scope — no JDK implementation exists. The synthetic `GRFT`
  * 16-byte-header rows remain as the format-agnostic plumbing
  * fixture (schema, pruning, batch shapes):
  *   - schema: (media_id, kind, bytes, meta struct) — binary payload
  *     opaque to the engine, metadata queryable/prunable;
  *   - header parsing as codegen'd expressions (substring on binary +
  *     hex/conv), no UDF;
  *   - batch-shaped heavy stages via `mapPartitions` over a typed
  *     Dataset (the JVM analog of arrow-batched python UDFs): per-batch
  *     setup cost amortized across rows, iterator in / iterator out,
  *     so swapping the stub for a real codec touches one function;
  *   - 100 TB notes: binary payloads dominate row size — size
  *     `spark.sql.files.maxPartitionBytes` so a task's batch fits in
  *     memory, and project `meta` without `bytes` wherever the payload
  *     is not needed (column pruning drops the blob IO entirely).
  */
object Multimodal {

  /** Typed row for the batch-shaped stages. */
  case class MediaRecord(media_id: Long, kind: String, bytes: Array[Byte])

  case class MediaFeatures(media_id: Long, kind: String,
                           embedding: Array[Float], n_bytes: Int)

  private val Magic = "GRFT".getBytes("UTF-8")
  private val KindCodes = Map("image" -> 1, "audio" -> 2, "video" -> 3)

  /** Deterministic synthetic media: GRFT header + pseudo-random payload
    * derived from media_id. Stands in for reading real files; layout is
    * what `decodeMeta` parses.
    */
  def synthesize(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    val kinds = Seq("image", "audio", "video")
    (0 until n).map { i =>
      val kind = kinds(i % 3)
      val width = 64 + (i % 8) * 32
      val height = 64 + (i % 5) * 32
      val frames = if (kind == "video") 8 + i % 16 else 1
      val payload = Array.tabulate[Byte](256 + i % 512)(j => ((i * 31 + j * 7) % 256).toByte)
      val bb = java.nio.ByteBuffer.allocate(16 + payload.length)
      bb.put(Magic).put(KindCodes(kind).toByte).put(0.toByte)
      bb.putShort(frames.toShort).putInt(width).putInt(height)
      bb.put(payload)
      (i.toLong, kind, bb.array())
    }.toDF("media_id", "kind", "bytes")
  }

  /** Parse the media header into a typed metadata struct with pure
    * binary expressions (substring on binary + hex/conv) — stays inside
    * whole-stage codegen, no UDF, no payload copy.
    */
  def decodeMeta(df: DataFrame, bytesCol: String = "bytes"): DataFrame = {
    def beInt(pos: Int, len: Int) = // big-endian unsigned int from binary slice
      conv(hex(expr(s"substring($bytesCol, $pos, $len)")), 16, 10).cast("int")
    df.withColumn("meta", struct(
      expr(s"decode(substring($bytesCol, 1, 4), 'UTF-8')").as("magic"),
      beInt(5, 1).as("kind_code"),
      beInt(7, 2).as("n_frames"),
      beInt(9, 4).as("width"),
      beInt(13, 4).as("height"),
      (length(col(bytesCol)) - 16).as("payload_bytes")))
  }

  /** Batch-shaped feature extraction: one `mapPartitions` pass turning
    * each media blob into a fixed-width embedding. The per-partition
    * prologue is where a real implementation would initialize the
    * codec/model once per batch; the STUB derives deterministic
    * features by hashing payload chunks.
    */
  def extractFeatures(ds: Dataset[MediaRecord], dim: Int = 16): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { batch =>
      // per-batch setup happens HERE (codec init, model load) — stub: none
      batch.map { m =>
        val emb = Array.tabulate(dim) { j =>
          var h = 1125899906842597L + j * 2654435761L
          var i = 16 // skip header; features come from the payload
          while (i < m.bytes.length) { h = h * 31 + m.bytes(i); i += 7 }
          (h % 1000) / 1000.0f
        }
        MediaFeatures(m.media_id, m.kind, emb, m.bytes.length)
      }
    }
  }

  /** STUB resize: rewrites only the header dims, leaving the payload
    * bytes untouched (a real impl decodes, scales, re-encodes — same
    * iterator-in/iterator-out batch shape).
    */
  def resize(ds: Dataset[MediaRecord], width: Int, height: Int): Dataset[MediaRecord] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { batch =>
      batch.map { m =>
        val bb = java.nio.ByteBuffer.wrap(m.bytes.clone())
        bb.putInt(8, width).putInt(12, height)
        MediaRecord(m.media_id, m.kind, bb.array())
      }
    }
  }

  /** Frame sampling for video rows: every `stride`-th fixed-size chunk
    * of the payload as an array<binary> column (stand-in for keyframe
    * extraction; chunking/plumbing is real, the "frame" is a stub).
    */
  def sampleFrames(df: DataFrame, stride: Int, frameBytes: Int = 64): DataFrame =
    df.withColumn("frames", expr(
      s"""transform(
         |  sequence(0, int(floor((length(bytes) - 16) / ${frameBytes * stride}))),
         |  i -> substring(bytes, 17 + i * ${frameBytes * stride}, $frameBytes))""".stripMargin))
}
