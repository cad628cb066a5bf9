package org.apache.spark.sql.graftshim

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, Cast, Expression, Literal}
import org.apache.spark.sql.classic.ClassicConversions
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources.BaseRelation
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

import graft.vintage.{AddFile, ColumnMapping, FileSkipping, PartitionPaths, Snapshot}

/** FileIndex over a vintage snapshot: the live file list comes from
  * transaction-log replay (version-pinned for time travel) and
  * `listFiles` applies stats-based skipping to the pushed filters —
  * partition predicates included, via the synthetic min=max partition
  * stats on `Snapshot.statFiles`.
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

  override val partitionSchema: StructType =
    StructType(snapshot.partitionColumns.flatMap(c =>
      snapshot.schema.fields.find(_.name.equalsIgnoreCase(c))))

  override def sizeInBytes: Long = snapshot.spilled match {
    // planner statistic only — computed distributed on spilled
    // snapshots so relation creation never forces the file list
    case Some(ix) =>
      ix.approxSizeInBytes(org.apache.spark.sql.SparkSession.active)
    case None => snapshot.files.map(_.size).sum
  }
  override def inputFiles: Array[String] =
    snapshot.files.map(_.absolutePath(tablePath)).toArray
  override def refresh(): Unit = ()

  override def listFiles(
      partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val allFilters = partitionFilters ++ dataFilters
    val pruned =
      if (allFilters.isEmpty) snapshot.statFiles
      else graft.vintage.SnapshotPruning.candidates(
        org.apache.spark.sql.SparkSession.active, snapshot,
        allFilters.reduce(And))
    if (partitionSchema.isEmpty)
      Seq(PartitionDirectory(InternalRow.empty, statuses(pruned)))
    else
      // one PartitionDirectory per distinct partition tuple; the reader
      // appends these typed values to every row of the grouped files
      pruned.groupBy(_.partitionValues).toSeq.map { case (pv, fs) =>
        val row = InternalRow.fromSeq(partitionSchema.fields.toSeq.map { f =>
          pv.get(f.name).filterNot(_ == PartitionPaths.HiveDefaultPartition) match {
            case None => null
            case Some(raw) =>
              Cast(Literal(UTF8String.fromString(raw), StringType), f.dataType,
                Some("UTC")).eval(InternalRow.empty)
          }
        })
        PartitionDirectory(row, statuses(fs))
      }
  }

  private def statuses(files: Seq[AddFile]): Array[FileStatus] =
    files.map { f =>
      new FileStatus(f.size, false, 1, 128L * 1024 * 1024, f.modificationTime,
        new Path(f.absolutePath(tablePath)))
    }.toArray
}

object VintageRelation {
  /** A BaseRelation for one snapshot of a vintage table; the schema is
    * the snapshot's own (time travel to pre-evolution versions must not
    * show later columns). Partition columns are served from directory
    * values, the rest from the parquet data files.
    */
  def apply(spark: SparkSession, tablePath: String, snapshot: Snapshot): BaseRelation = {
    val index = new VintageFileIndex(spark, tablePath, snapshot)
    val dataSchema = StructType(snapshot.schema.filterNot(f =>
      snapshot.partitionColumns.exists(_.equalsIgnoreCase(f.name))))
    // under column mapping the whole relation speaks LOGICAL names;
    // only the parquet reader boundary translates to the physical
    // names inside the files (rows are positional, so nothing else
    // needs to know)
    val format =
      if (!ColumnMapping.mapped(snapshot.schema)) new ParquetFileFormat()
      else new MappedParquetFileFormat(snapshot.schema.fields
        .map(f => f.name -> ColumnMapping.physicalName(f)).toMap)
    // bucketed table: declare the layout so joins/aggregations on the
    // bucket columns plan without an Exchange on this side. Every
    // write path re-buckets (see graft.vintage.Bucketing), so the
    // claim holds across DML; the cheap per-name check below guards
    // the non-spilled case anyway (a spilled million-file snapshot
    // trusts the writer invariant rather than materialize its list).
    val bucketSpec = graft.vintage.Bucketing.spec(snapshot.properties) match {
      case Some((cols, n))
          if snapshot.spilled.isDefined ||
             snapshot.files.forall(f => graft.vintage.Bucketing
               .bucketId(new Path(f.path).getName).isDefined) =>
        Some(org.apache.spark.sql.catalyst.catalog.BucketSpec(n, cols,
          graft.vintage.Bucketing.sortCols(snapshot.properties)))
      case _ => None
    }
    HadoopFsRelation(
      location = index,
      partitionSchema = index.partitionSchema,
      dataSchema = dataSchema,
      bucketSpec = bucketSpec,
      fileFormat = format,
      options = Map.empty)(ClassicConversions.castToImpl(spark))
  }
}
