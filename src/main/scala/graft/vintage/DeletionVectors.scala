package graft.vintage

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Merge-on-read deletion vectors: subtract per-file deleted row
  * positions ([[AddFile.dv]]) from a scan WITHOUT rewriting data files.
  *
  * Read-side mechanics (the whole trick): Spark's parquet source
  * exposes `_metadata.row_index` — the physical position of each row
  * inside its file, kept correct under file splits and row-group/page
  * skipping. A table's deletion state is therefore exactly a
  * broadcast ANTI-JOIN of the scan against the (file, position) set
  * from the log. The join is a plan-level wrapper: the vectorized
  * parquet reader, pushed filters, and column pruning underneath are
  * untouched, and the DV set is tiny by construction (inline DVs are
  * capped per file — dense deletes rewrite the file copy-on-write,
  * where a rewrite is the cheaper plan anyway).
  *
  * Capability parity note: the reference's own delete
  * (/root/reference/README.md:281) is copy-on-write via Delta 0.6.1;
  * deletion vectors are the scale path modern Delta added for the
  * identical operation — at 100 TB a GDPR-style sparse delete must not
  * rewrite a terabyte of survivors to drop a few thousand rows.
  */
object DeletionVectors {

  /** Table property enabling merge-on-read deletes. */
  val EnabledProp = "vintage.deletionVectors.enabled"

  /** Table property bounding the inline DV size per file; a delete
    * that would push a file's DV beyond this rewrites that file
    * instead (per-file hybrid).
    */
  val MaxInlineProp = "vintage.deletionVectors.maxInline"
  val DefaultMaxInline = 10000

  def enabled(props: Map[String, String]): Boolean =
    props.get(EnabledProp).exists(_.toBoolean)

  def maxInline(props: Map[String, String]): Int =
    props.get(MaxInlineProp).map(_.toInt).getOrElse(DefaultMaxInline)

  def hasDvs(files: Seq[AddFile]): Boolean = files.exists(_.dv.nonEmpty)

  /** Canonical file key used on BOTH join sides — the SQL mirror of
    * [[VintageTable.canonicalKey]]: local-FS URIs reduce to a plain
    * path (`file:///a`, `file:/a`, and authority-carrying
    * `file://host/a` all → `/a`), other schemes pass through — so the
    * log's AddFile paths and the scan's `_metadata.file_path` strings
    * meet on equal terms.
    */
  private[vintage] def fileKeyExpr(filePathCol: Column): Column =
    regexp_replace(
      regexp_replace(filePathCol, "^file://[^/]*/", "/"),
      "^file:/+", "/")

  private[vintage] def fileKey(absPath: String): String =
    VintageTable.canonicalKey(absPath)

  /** The deleted (fileKey, position) set of `files` as a local
    * DataFrame — bounded by the per-file inline cap, so always
    * broadcastable. Column names are caller-supplied so they can be
    * collision-proofed against the table schema.
    */
  private def dvFrame(spark: SparkSession, tablePath: String,
      files: Seq[AddFile], fileCol: String, posCol: String): DataFrame = {
    import spark.implicits._
    files.filter(_.dv.nonEmpty)
      .flatMap(f => f.dv.map(p => (fileKey(f.absolutePath(tablePath)), p)))
      .toDF(fileCol, posCol)
  }

  /** Fresh helper-column names per call: a table column named
    * `__dv_file` must not break DV reads.
    */
  private def freshNames(): (String, String) = {
    val tag = java.util.UUID.randomUUID().toString.take(8)
    (s"__dv_file_$tag", s"__dv_pos_$tag")
  }

  /** Scan columns + the canonical file key and in-file position. */
  private def withKeys(df: DataFrame, outputCols: Seq[Column],
      fileCol: String, posCol: String): DataFrame =
    df.select(
      (outputCols :+
        fileKeyExpr(col("_metadata.file_path")).as(fileCol) :+
        col("_metadata.row_index").as(posCol)): _*)

  /** Wrap `df` (a scan over exactly `files`, any of which may carry a
    * DV) so deleted positions vanish. No-op when no file has a DV. The
    * input frame must still expose the parquet `_metadata` column —
    * i.e. call this directly on the scan, before projections.
    */
  def applyTo(df: DataFrame, tablePath: String, files: Seq[AddFile],
      outputCols: Seq[Column]): DataFrame = {
    if (!hasDvs(files)) return df.select(outputCols: _*)
    val (fileCol, posCol) = freshNames()
    withKeys(df, outputCols, fileCol, posCol)
      .join(broadcast(dvFrame(df.sparkSession, tablePath, files, fileCol, posCol)),
        Seq(fileCol, posCol), "left_anti")
      .drop(fileCol, posCol)
  }

  /** `(fileKey, position)` of the LIVE rows of `df` matching
    * `condition` — the write-side primitive of a merge-on-read
    * delete/update: rows already in a file's DV are excluded first, so
    * a repeated delete never double-counts a position. Output columns
    * are named `fileCol`/`posCol` (pass fresh names via
    * [[VintageTable]]'s merge-on-read planner).
    */
  private[vintage] def livePositionsMatching(
      df: DataFrame, tablePath: String, files: Seq[AddFile],
      outputCols: Seq[Column], condition: Column,
      fileCol: String, posCol: String): DataFrame = {
    val keyed = withKeys(df, outputCols, fileCol, posCol)
    val live =
      if (!hasDvs(files)) keyed
      else keyed.join(
        broadcast(dvFrame(df.sparkSession, tablePath, files, fileCol, posCol)),
        Seq(fileCol, posCol), "left_anti")
    live.filter(condition).select(col(fileCol), col(posCol))
  }
}
