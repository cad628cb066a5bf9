package org.apache.spark.sql.graftshim

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, Expression}
import org.apache.spark.sql.classic.ClassicConversions
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources.BaseRelation
import org.apache.spark.sql.types.StructType

import graft.vintage.{FileSkipping, Snapshot}

/** FileIndex over a vintage snapshot: the live file list comes from
  * transaction-log replay (version-pinned for time travel) and
  * `listFiles` applies stats-based skipping to the pushed data filters.
  *
  * Backing the `vintage` format with a FileIndex + HadoopFsRelation +
  * ParquetFileFormat (the same architecture Delta Lake uses for its
  * Spark read path) keeps the entire native scan pipeline: vectorized
  * parquet reader, whole-stage codegen, parquet row-group pushdown and
  * column pruning — our only insertion point is which files to list.
  */
class VintageFileIndex(spark: SparkSession, tablePath: String, snapshot: Snapshot)
    extends FileIndex {

  override def rootPaths: Seq[Path] = Seq(new Path(tablePath))
  override def partitionSchema: StructType = StructType(Nil)
  override def sizeInBytes: Long = snapshot.files.map(_.size).sum
  override def inputFiles: Array[String] =
    snapshot.files.map(f => s"$tablePath/${f.path}").toArray
  override def refresh(): Unit = ()

  override def listFiles(
      partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val pruned =
      if (dataFilters.isEmpty) snapshot.files
      else FileSkipping.candidates(snapshot.schema, snapshot.files,
        dataFilters.reduce(And))
    val statuses = pruned.map { f =>
      new FileStatus(f.size, false, 1, 128L * 1024 * 1024, f.modificationTime,
        new Path(s"$tablePath/${f.path}"))
    }.toArray
    Seq(PartitionDirectory(InternalRow.empty, statuses))
  }
}

object VintageRelation {
  /** A BaseRelation for one snapshot of a vintage table; the schema is
    * the snapshot's own (time travel to pre-evolution versions must not
    * show later columns).
    */
  def apply(spark: SparkSession, tablePath: String, snapshot: Snapshot): BaseRelation =
    HadoopFsRelation(
      location = new VintageFileIndex(spark, tablePath, snapshot),
      partitionSchema = StructType(Nil),
      dataSchema = snapshot.schema,
      bucketSpec = None,
      fileFormat = new ParquetFileFormat(),
      options = Map.empty)(ClassicConversions.castToImpl(spark))
}
