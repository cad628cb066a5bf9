package graft.sources

import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Multimodal.MediaRecord

/** A REAL on-disk media layout for the multimodal tier: loose encoded
  * files (PNG/WAV/…) under `<dir>/media/` read through Spark's
  * `binaryFile` source, joined with a metadata sidecar (CSV with
  * header, or JSON-lines) at `<dir>/meta.<ext>` — so the codec stages
  * ([[graft.operators.MediaCodec]]) are exercised from the layout a
  * crawler actually produces, not only from in-memory rendered specs.
  *
  * File naming contract: `<media_id>_<kind>.<ext>`, e.g.
  * `17_image.png`, `4_audio.wav` — the id is recovered from the path
  * with a codegen'd `regexp_extract`, never by listing driver-side.
  *
  * 100 TB notes:
  *   - `binaryFile` scans are splittable ACROSS files (one blob is one
  *     row, tasks pack whole files), which is exactly the multimodal
  *     shape: millions of small-to-medium blobs, zero shuffle to read.
  *   - Column pruning is load-bearing: a query that selects only
  *     sidecar columns + path never materializes `content`
  *     (plan-asserted in MediaSourceSpec) — metadata-only passes over
  *     a blob corpus cost metadata IO.
  *   - The sidecar join keys on `media_id`; the sidecar is row-per-file
  *     (~100 B/row) so AQE broadcasts it while it fits and falls back
  *     to a shuffle join at the 10⁷-file scale where a broadcast would
  *     not — no hand-forced `broadcast()` that becomes a driver OOM at
  *     scale.
  *   - Writes go through each task's Hadoop `FileSystem` (works for
  *     `file://` in tests and any distributed store in production);
  *     the driver never sees a blob.
  */
object MediaSource {

  val sidecarSchema = "media_id LONG, kind STRING, format STRING"

  private def extFor(kind: String, format: String): String =
    if (kind == "audio") "wav" else format

  /** Write records as individual encoded files plus a sidecar.
    * `format` is the per-record container (png/jpeg/bmp/gif for
    * images; audio is always WAVE). Distributed: each task writes its
    * partition's blobs directly; only the sidecar rows (metadata) go
    * through a normal DataFrame write.
    */
  def writeMediaDir(records: Dataset[(MediaRecord, String)], dir: String,
      sidecarFormat: String = "csv"): Unit = {
    val spark = records.sparkSession
    records.foreachPartition { (it: Iterator[(MediaRecord, String)]) =>
      val conf = new Configuration()
      val fs = FileSystem.get(new URI(dir), conf)
      it.foreach { case (m, format) =>
        val p = new Path(s"$dir/media/${m.media_id}_${m.kind}.${extFor(m.kind, format)}")
        val out = fs.create(p, true)
        try out.write(m.bytes) finally out.close()
      }
    }
    import spark.implicits._
    val meta = records
      .map { case (m, format) => (m.media_id, m.kind, format) }
      .toDF("media_id", "kind", "format")
    sidecarFormat match {
      case "csv" => meta.write.mode("overwrite").option("header", "true")
        .csv(s"$dir/meta.csv")
      case "json" => meta.write.mode("overwrite").json(s"$dir/meta.json")
      case other => throw new IllegalArgumentException(
        s"sidecar format must be csv or json, got '$other'")
    }
  }

  /** Read the layout back: blobs via `binaryFile` (media_id recovered
    * from the file name), sidecar via the schema'd CSV/JSON reader, an
    * inner equi-join on media_id. Columns:
    * `media_id, kind, format, bytes, n_bytes, path`.
    */
  def readMediaDir(spark: SparkSession, dir: String,
      sidecarFormat: String = "csv"): DataFrame = {
    val bin = spark.read.format("binaryFile").load(s"$dir/media")
      .select(
        regexp_extract(col("path"), "/([0-9]+)_([a-z]+)\\.[a-zA-Z0-9]+$", 1)
          .cast("long").as("media_id"),
        regexp_extract(col("path"), "/([0-9]+)_([a-z]+)\\.[a-zA-Z0-9]+$", 2)
          .as("kind"),
        col("content").as("bytes"),
        col("length").as("n_bytes"),
        col("path"))
    val sidecar = sidecarFormat match {
      case "csv" => spark.read.schema(sidecarSchema).option("header", "true")
        .csv(s"$dir/meta.csv")
      case "json" => spark.read.schema(sidecarSchema).json(s"$dir/meta.json")
      case other => throw new IllegalArgumentException(
        s"sidecar format must be csv or json, got '$other'")
    }
    // (media_id, kind) is the identity: an image and an audio blob may
    // share an id, the file name disambiguates
    bin.join(sidecar, Seq("media_id", "kind"))
  }

  /** Metadata-only view: sidecar + per-file size WITHOUT the blob —
    * the `content` column is never selected, so the binaryFile scan's
    * pruned ReadSchema skips payload IO entirely.
    */
  def readMediaMeta(spark: SparkSession, dir: String,
      sidecarFormat: String = "csv"): DataFrame = {
    val bin = spark.read.format("binaryFile").load(s"$dir/media")
      .select(
        regexp_extract(col("path"), "/([0-9]+)_([a-z]+)\\.[a-zA-Z0-9]+$", 1)
          .cast("long").as("media_id"),
        regexp_extract(col("path"), "/([0-9]+)_([a-z]+)\\.[a-zA-Z0-9]+$", 2)
          .as("kind"),
        col("length").as("n_bytes"))
    val sidecar = sidecarFormat match {
      case "csv" => spark.read.schema(sidecarSchema).option("header", "true")
        .csv(s"$dir/meta.csv")
      case _ => spark.read.schema(sidecarSchema).json(s"$dir/meta.json")
    }
    bin.join(sidecar, Seq("media_id", "kind"))
  }
}
