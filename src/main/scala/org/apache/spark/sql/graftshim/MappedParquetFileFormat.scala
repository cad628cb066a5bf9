package org.apache.spark.sql.graftshim

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType

import graft.vintage.connector.Filters

/** ParquetFileFormat that translates LOGICAL column names to the
  * PHYSICAL names stored in the files (vintage column mapping) at the
  * reader boundary. Spark's scan machinery — column pruning, batch
  * support, codegen — all runs against the logical schema; only the
  * requested parquet schema and the row-group filters are renamed.
  * Rows are positional, so the translated read is byte-identical to a
  * logical one. Filters whose shape can't be renamed are dropped here:
  * the vintage scan keeps every filter residual, so Spark re-applies
  * them above the scan and only row-group pruning is lost.
  */
class MappedParquetFileFormat(val logicalToPhysical: Map[String, String])
    extends ParquetFileFormat {

  private def rename(s: StructType): StructType =
    StructType(s.fields.map(f =>
      f.copy(name = logicalToPhysical.getOrElse(f.name, f.name))))

  override def buildReaderWithPartitionValues(
      sparkSession: SparkSession,
      dataSchema: StructType,
      partitionSchema: StructType,
      requiredSchema: StructType,
      filters: Seq[Filter],
      options: Map[String, String],
      hadoopConf: Configuration): PartitionedFile => Iterator[InternalRow] =
    super.buildReaderWithPartitionValues(
      sparkSession,
      rename(dataSchema),
      partitionSchema,
      rename(requiredSchema),
      filters.flatMap(Filters.renameRefs(_,
        n => logicalToPhysical.getOrElse(n, n))),
      options,
      hadoopConf)

  override def toString: String = "Parquet(mapped)"
  override def equals(other: Any): Boolean = other match {
    case m: MappedParquetFileFormat => m.logicalToPhysical == logicalToPhysical
    case _ => false
  }
  override def hashCode(): Int = logicalToPhysical.hashCode()
}
