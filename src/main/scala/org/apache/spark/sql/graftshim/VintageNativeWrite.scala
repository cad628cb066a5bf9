package org.apache.spark.sql.graftshim

import java.util.UUID

import scala.collection.mutable

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.hadoop.mapreduce.{Job, JobID, TaskAttemptID, TaskID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BindReferences, BoundReference, Coalesce, Expression, Literal, Predicate, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.Filter
import org.apache.spark.sql.connector.{distributions, expressions}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.execution.datasources.{OutputWriter, OutputWriterFactory}
import org.apache.spark.sql.execution.datasources.parquet.{ParquetOptions, ParquetUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

import graft.vintage.{AddFile, ColumnMapping, ParquetStats, PartitionPaths, VintageTable}

/** Native DSv2 write path for vintage tables — the write-side twin of
  * [[VintageNativeScan]].
  *
  * The previous seam was a `V1Write`/`InsertableRelation` fallback:
  * Spark planned a V1 command node, the DataFrame was re-written
  * through `df.write.parquet` into a staging directory, and a second
  * task wave renamed files into the table and re-opened their footers
  * for stats. This path cuts both seams: executors stream
  * `InternalRow`s straight into final parquet files via Spark's own
  * parquet `OutputWriter` (same encoder the scan reads back
  * vectorized), each task reports its `AddFile`s — footer stats
  * included — in its commit message, and the driver folds them into
  * ONE optimistic log commit. One task wave, no staging rename, no V1
  * row-conversion node in the plan.
  *
  * Hive-partitioned tables write dynamically: each task routes rows to
  * per-partition-value open writers (no clustering shuffle is forced —
  * at 100 TB an imposed shuffle-by-partition-value would both add a
  * full exchange and concentrate hot partitions onto single tasks; the
  * trade is bounded open-writer memory per task, the same default
  * Spark's own dynamic-partition insert makes).
  */
class VintageWrite(
    tablePath: String, tableSchema: StructType,
    partitionCols: Seq[String], overwrite: Boolean,
    tableProperties: Map[String, String],
    queryId: String = "") extends Write
    with RequiresDistributionAndOrdering {

  private val bucketing = graft.vintage.Bucketing.spec(tableProperties)

  // Partitioned writes request a LOCAL sort by the partition columns
  // (no distribution → no shuffle): each task then sees its partition
  // values as contiguous runs, so the dynamic writer holds ONE open
  // file at a time instead of cycling through the LRU cap — the same
  // reason Spark's own dynamic-partition insert sorts by partition
  // expressions. The LRU cap in VintageDataWriter stays as a backstop
  // for unsorted paths.
  //
  // BUCKETED tables instead require a clustered distribution on the
  // bucket columns with exactly `numBuckets` partitions: Spark plans
  // the same HashPartitioning the bucketed-scan side assumes, so the
  // write task's partition index IS the bucket id the task writer
  // stamps into its file names.
  override def requiredDistribution(): distributions.Distribution =
    bucketing match {
      case Some((cols, _)) => distributions.Distributions.clustered(
        cols.map(c => expressions.Expressions.identity(c): expressions.Expression)
          .toArray)
      case None => distributions.Distributions.unspecified()
    }
  override def requiredNumPartitions(): Int =
    bucketing.map(_._2).getOrElse(0)
  override def requiredOrdering(): Array[expressions.SortOrder] =
    (partitionCols ++
      graft.vintage.Bucketing.sortCols(tableProperties)).map { c =>
      expressions.Expressions.sort(
        expressions.Expressions.identity(c),
        expressions.SortDirection.ASCENDING)
    }.toArray

  override def toBatch: BatchWrite = prepared

  /** Native streaming sink: identical executor write path (one task
    * wave straight into final parquet files, footer stats in commit
    * messages), one log commit per epoch. Exactly-once across
    * restarts: each epoch commits with the transaction watermark
    * (`vintage-streaming-<queryId>`, epochId) — Spark's streaming
    * queryId is the persistent id from the checkpoint, so a replayed
    * epoch after a crash-between-commit-and-checkpoint is recognized
    * in the log, its freshly written duplicate files are deleted, and
    * nothing commits twice (the Delta sink's txnVersion contract,
    * native).
    */
  override def toStreaming
      : org.apache.spark.sql.connector.write.streaming.StreamingWrite = {
    // streaming epochs do not honor a write distribution requirement,
    // so a streamed micro-batch cannot be bucket-aligned — refuse
    // rather than corrupt the layout
    require(bucketing.isEmpty,
      s"bucketed vintage table $tablePath: the streaming sink cannot " +
      "produce bucket-aligned files; stream into an unbucketed table")
    new VintageStreamingWrite(prepared, tablePath, overwrite, queryId)
  }

  private lazy val prepared: VintageBatchWrite = {
    val spark = SparkSession.active
    val dataSchema = StructType(tableSchema.filterNot(f =>
      partitionCols.exists(_.equalsIgnoreCase(f.name))))
    // column mapping: projections, constraints, and partition-ordinal
    // lookups all speak LOGICAL names; only what touches the files —
    // the parquet writer schema, footer stat keys, bloom options, and
    // hive directory names — is renamed to the PHYSICAL names
    val physDataSchema = ColumnMapping.physicalSchema(dataSchema)
    val physPartitionCols = partitionCols.map(ColumnMapping.toPhysical(tableSchema, _))
    val job = Job.getInstance(spark.sessionState.newHadoopConf())
    // honor the vintage.bloom.columns table property on the native
    // path too (see VintageTable.writeFiles); properties come from the
    // enclosing table's snapshot — no extra log replay per write
    graft.vintage.VintageTable.bloomColumns(tableProperties)
      .foreach(c => job.getConfiguration.set(
        s"parquet.bloom.filter.enabled#${ColumnMapping.toPhysical(tableSchema, c)}", "true"))
    val factory = ParquetUtils.prepareWrite(
      spark.sessionState.conf, job, physDataSchema,
      new ParquetOptions(Map.empty[String, String], spark.sessionState.conf))
    // CHECK constraints: resolve each predicate against the table
    // schema ONCE here (analyzer pass over an empty frame), wrap for
    // SQL null semantics (NULL passes), bind to row ordinals, and ship
    // the bound expression to tasks — each task compiles it to a
    // codegen'd Predicate and checks rows inline as they stream into
    // parquet. No second pass, no driver involvement per row.
    val constraints: Seq[(String, String, Expression)] =
      graft.vintage.Constraints.fromProperties(tableProperties)
        .toSeq.sortBy(_._1).map { case (name, sql) =>
          val empty = spark.createDataFrame(
            new java.util.ArrayList[org.apache.spark.sql.Row](), tableSchema)
          val analyzed = empty.filter(
            org.apache.spark.sql.functions.expr(sql)).queryExecution.analyzed
          val (cond, out) = analyzed match {
            case f: Filter => (f.condition, f.child.output)
            case other => throw new IllegalStateException(
              s"unexpected plan for constraint $name: $other")
          }
          (name, sql, BindReferences.bindReference(
            Coalesce(Seq(cond, Literal(true))), out))
        }
    // GENERATED BY DEFAULT identity columns may legally arrive NULL
    // from a native INSERT/MERGE clause that omitted them — the task
    // writer fills those slots with generated values (same
    // per-partition id spacing as the fluent allocation), so the
    // commit's high-water-mark advance sees allocated ids, not a
    // NULL-rejection after the files were already written
    val idFills: Seq[(String, Int, Long, Long)] =
      graft.vintage.IdentityColumns.specs(tableProperties).toSeq.flatMap {
        case (c, spec) =>
          val ord = tableSchema.fields.indexWhere(_.name.equalsIgnoreCase(c))
          if (ord < 0) None
          else Some((c, ord, spec.nextBase(
            graft.vintage.IdentityColumns.hwm(tableProperties, c)), spec.step))
      }
    // log-level per-file bloom stats (physical names), mirroring
    // VintageTable.writeFiles
    val logBloomCols = graft.vintage.VintageTable.bloomColumns(tableProperties)
      .map(c => ColumnMapping.toPhysical(tableSchema, c))
    val logBloomBits = tableProperties.getOrElse("vintage.bloom.bits",
      graft.vintage.StatsBloom.DefaultBits.toString).toInt
    new VintageBatchWrite(tablePath, tableSchema.json, dataSchema.json,
      physDataSchema.json, partitionCols, physPartitionCols, overwrite, factory,
      new SerializableConfiguration(job.getConfiguration), constraints, idFills,
      logBloomCols, logBloomBits, bucketed = bucketing.isDefined)
  }
}

// public: the native row-level delta write (graft.vintage.connector)
// unwraps these from its wrapped insert writer's commits. `idFilled`
// reports that the task ALLOCATED identity values for NULL slots —
// the driver's commit retry must then treat a raced high-water mark
// as a collision hazard, not bookkeeping (see VintageTable.commitFiles)
case class VintageCommitMessage(adds: Seq[AddFile], idFilled: Boolean = false)
    extends WriterCommitMessage

/** Per-epoch streaming commit over the shared native write machinery;
  * see [[VintageWrite.toStreaming]] for the idempotence contract.
  */
class VintageStreamingWrite(
    delegate: VintageBatchWrite, tablePath: String, overwrite: Boolean,
    queryId: String)
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {

  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory =
    new VintageStreamingWriterFactory(delegate.createBatchWriterFactory(info))

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val msgs = messages.toSeq
    val adds = msgs.flatMap {
      case VintageCommitMessage(a, _) => a
      case _ => Nil
    }
    val filled = msgs.exists {
      case VintageCommitMessage(_, f) => f
      case _ => false
    }
    VintageTable.forPath(SparkSession.active, tablePath)
      .commitFiles(adds, overwrite,
        txn = Some((s"vintage-streaming-$queryId", epochId)),
        idFilledBases = if (filled) delegate.idFillBases else Map.empty)
  }

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit =
    delegate.abort(messages)
}

case class VintageStreamingWriterFactory(delegate: DataWriterFactory)
    extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    delegate.createWriter(partitionId, taskId)
}

class VintageBatchWrite(
    tablePath: String, tableSchemaJson: String, dataSchemaJson: String,
    physDataSchemaJson: String,
    partitionCols: Seq[String], physPartitionCols: Seq[String],
    overwrite: Boolean,
    factory: OutputWriterFactory, conf: SerializableConfiguration,
    constraints: Seq[(String, String, Expression)] = Nil,
    idFills: Seq[(String, Int, Long, Long)] = Nil,
    logBloomCols: Seq[String] = Nil,
    logBloomBits: Int = graft.vintage.StatsBloom.DefaultBits,
    bucketed: Boolean = false)
    extends BatchWrite {

  /** (column -> allocation base) of this write's identity fills — the
    * collision horizon the commit retry checks a raced mark against.
    */
  private[graftshim] def idFillBases: Map[String, Long] =
    idFills.map(f => f._1 -> f._3).toMap

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new VintageWriterFactory(tablePath, tableSchemaJson, dataSchemaJson,
      physDataSchemaJson, partitionCols, physPartitionCols, factory, conf,
      constraints, idFills, logBloomCols, logBloomBits, bucketed)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val msgs = messages.toSeq
    val adds = msgs.flatMap {
      case VintageCommitMessage(a, _) => a
      case _ => Nil
    }
    val filled = msgs.exists {
      case VintageCommitMessage(_, f) => f
      case _ => false
    }
    VintageTable.forPath(SparkSession.active, tablePath)
      .commitFiles(adds, overwrite,
        idFilledBases = if (filled) idFillBases else Map.empty)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val hconf = conf.value
    messages.foreach {
      case VintageCommitMessage(adds, _) => adds.foreach { a =>
        val p = new HPath(tablePath, a.path)
        try p.getFileSystem(hconf).delete(p, false)
        catch { case _: java.io.IOException => () }
      }
      case _ => ()
    }
  }
}

class VintageWriterFactory(
    tableDir: String, tableSchemaJson: String, dataSchemaJson: String,
    physDataSchemaJson: String,
    partitionCols: Seq[String], physPartitionCols: Seq[String],
    factory: OutputWriterFactory,
    conf: SerializableConfiguration,
    constraints: Seq[(String, String, Expression)] = Nil,
    idFills: Seq[(String, Int, Long, Long)] = Nil,
    logBloomCols: Seq[String] = Nil,
    logBloomBits: Int = graft.vintage.StatsBloom.DefaultBits,
    bucketed: Boolean = false)
    extends DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new VintageDataWriter(tableDir,
      DataType.fromJson(tableSchemaJson).asInstanceOf[StructType],
      DataType.fromJson(dataSchemaJson).asInstanceOf[StructType],
      DataType.fromJson(physDataSchemaJson).asInstanceOf[StructType],
      partitionCols, physPartitionCols, factory, conf, partitionId, taskId,
      constraints, idFills, logBloomCols, logBloomBits, bucketed)
}

/** Task-side writer: one open parquet `OutputWriter` per partition
  * prefix ("" when unpartitioned), stats read from each file's own
  * footer at close — the task that wrote the file also stats it, no
  * extra IO wave.
  */
class VintageDataWriter(
    tableDir: String, tableSchema: StructType, dataSchema: StructType,
    physDataSchema: StructType,
    partitionCols: Seq[String], physPartitionCols: Seq[String],
    factory: OutputWriterFactory,
    conf: SerializableConfiguration, partitionId: Int, taskId: Long,
    constraints: Seq[(String, String, Expression)] = Nil,
    idFills: Seq[(String, Int, Long, Long)] = Nil,
    logBloomCols: Seq[String] = Nil,
    logBloomBits: Int = graft.vintage.StatsBloom.DefaultBits,
    bucketed: Boolean = false)
    extends DataWriter[InternalRow] {

  private val hconf = conf.value
  // bound constraint expressions arrive null-safe (NULL passes);
  // compiled once per task, evaluated per row inline
  private val checks = constraints.map { case (n, sql, e) =>
    (n, sql, Predicate.create(e))
  }
  private val statCols = ParquetStats.statsColumns(physDataSchema)
  private val dataProj = UnsafeProjection.create(
    dataSchema.map { f =>
      val i = tableSchema.fieldIndex(f.name)
      BoundReference(i, tableSchema(i).dataType, tableSchema(i).nullable)
    }.toIndexedSeq)
  private val partFields = partitionCols.map(c =>
    tableSchema.fieldIndex(c) -> tableSchema(tableSchema.fieldIndex(c)).dataType)

  // relPath -> open writer
  private val writers = mutable.LinkedHashMap[String, OutputWriter]()

  private def attemptContext() = {
    val attemptId = new TaskAttemptID(
      new TaskID(new JobID("vintage", 0), TaskType.MAP, partitionId), taskId.toInt)
    new TaskAttemptContextImpl(hconf, attemptId)
  }

  /** Hive path segment value of a partition column (Spark's own
    * formatting: dates as ISO local dates, everything else toString).
    */
  private def partitionValueString(row: InternalRow, i: Int, dt: DataType): String = {
    if (row.isNullAt(i)) return PartitionPaths.HiveDefaultPartition
    dt match {
      case StringType =>
        val s = row.getUTF8String(i).toString
        if (s.isEmpty) PartitionPaths.HiveDefaultPartition else escapePathName(s)
      case DateType =>
        java.time.LocalDate.ofEpochDay(row.getInt(i).toLong).toString
      case BooleanType => row.getBoolean(i).toString
      case ByteType => row.getByte(i).toString
      case ShortType => row.getShort(i).toString
      case IntegerType => row.getInt(i).toString
      case LongType => row.getLong(i).toString
      case FloatType => row.getFloat(i).toString
      case DoubleType => row.getDouble(i).toString
      case d: DecimalType => row.getDecimal(i, d.precision, d.scale).toString
      case other => throw new UnsupportedOperationException(
        s"unsupported partition column type ${other.sql}")
    }
  }

  /** Escape characters illegal in hive path segments with %XX (the
    * inverse of [[PartitionPaths.unescapePathName]]).
    */
  private def escapePathName(s: String): String = {
    val needs = s.exists(c => c < ' ' || "\"#%'*/:=?\\{}[]^".indexOf(c) >= 0)
    if (!needs) s
    else s.flatMap { c =>
      if (c < ' ' || "\"#%'*/:=?\\{}[]^".indexOf(c) >= 0) f"%%${c.toInt}%02X"
      else c.toString
    }
  }

  // partition prefix ("" when unpartitioned) -> file path relative to
  // the table root (the currently-open file for that prefix)
  private val openPaths = mutable.LinkedHashMap[String, String]()
  // files already closed by LRU eviction — still part of this task's
  // commit (several files per partition value are fine; unbounded open
  // writers are not)
  private val completedPaths = mutable.ArrayBuffer[String]()

  /** Cap on simultaneously open parquet writers per task. Each open
    * writer buffers up to a row group, so an unsorted insert into a
    * high-cardinality partition column would otherwise hold one buffer
    * per distinct value seen — executor OOM. On overflow the
    * least-recently-used writer is closed (its file is final and
    * recorded); a later row for that partition simply opens a new
    * file. Spark's own dynamic-partition insert bounds memory the same
    * way (spark.sql.maxConcurrentOutputFileWriters + sort fallback).
    */
  private val maxOpenWriters =
    math.max(1, hconf.getInt("spark.vintage.write.maxOpenWriters", 32))

  private def writerFor(row: InternalRow): OutputWriter = {
    val key =
      if (partFields.isEmpty) ""
      else partFields.zip(physPartitionCols).map { case ((i, dt), c) =>
        s"${escapePathName(c)}=${partitionValueString(row, i, dt)}"
      }.mkString("/")
    writers.get(key) match {
      case Some(w) =>
        // refresh LRU position
        writers.remove(key); writers(key) = w
        val rel = openPaths.remove(key).get; openPaths(key) = rel
        w
      case None =>
        if (writers.size >= maxOpenWriters) {
          val (oldKey, oldW) = writers.head
          oldW.close()
          writers.remove(oldKey)
          completedPaths += openPaths.remove(oldKey).get
        }
        // bucketed: the required clustered distribution made this
        // task's partition index the bucket id — stamp it in the name
        val name =
          if (bucketed)
            f"part-${UUID.randomUUID().toString}_$partitionId%05d.snappy.parquet"
          else s"part-${UUID.randomUUID().toString}.snappy.parquet"
        val rel = if (key.isEmpty) name else s"$key/$name"
        val target = new HPath(tableDir, rel)
        val fs = target.getFileSystem(hconf)
        if (rel.contains('/')) fs.mkdirs(target.getParent)
        val w = factory.newInstance(target.toString, physDataSchema, attemptContext())
        openPaths(key) = rel
        writers(key) = w
        w
    }
  }

  // identity NULL fill (GENERATED BY DEFAULT columns a native
  // INSERT/MERGE clause omitted): per-row counter under the same
  // (partition << 33) + row spacing the fluent allocation uses, so
  // values are unique without coordination and the commit's mark
  // advance records them like any explicit value
  private var idFillCount: Long = 0L
  private def fillIdentity(row: InternalRow): InternalRow = {
    if (idFills.isEmpty) return row
    var needs = false
    var j = 0
    while (j < idFills.length && !needs) {
      needs = row.isNullAt(idFills(j)._2); j += 1
    }
    if (!needs) return row
    val g = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      tableSchema.length)
    var i = 0
    while (i < tableSchema.length) {
      g.update(i, if (row.isNullAt(i)) null else row.get(i, tableSchema(i).dataType))
      i += 1
    }
    idFills.foreach { case (_, ord, base, step) =>
      if (g.isNullAt(ord))
        g.update(ord, base + step *
          ((partitionId.toLong << 33) + idFillCount))
    }
    idFillCount += 1
    g
  }

  override def write(row0: InternalRow): Unit = {
    val row = fillIdentity(row0)
    var i = 0
    while (i < checks.length) {
      val (name, sql, p) = checks(i)
      if (!p.eval(row))
        throw new IllegalArgumentException(
          s"CHECK constraint $name ($sql) violated by a written row")
      i += 1
    }
    writerFor(row).write(dataProj(row))
  }

  override def commit(): WriterCommitMessage = {
    writers.values.foreach(_.close())
    val adds = (completedPaths.toSeq ++ openPaths.values.toSeq).map { rel =>
      val target = new HPath(tableDir, rel)
      val fs = target.getFileSystem(hconf)
      val (numRecords, stats) = ParquetStats.read(target, hconf, statCols)
      val blooms =
        if (logBloomCols.isEmpty) Map.empty[String, String]
        else ParquetStats.bloomStats(target, hconf, logBloomCols, logBloomBits)
      val withBlooms = blooms.foldLeft(stats) { case (m, (c, b)) =>
        m.updated(c, m.getOrElse(c, graft.vintage.ColStats(None, None, None))
          .copy(bloom = Some(b)))
      }
      val st = fs.getFileStatus(target)
      AddFile(rel, st.getLen, st.getModificationTime, dataChange = true,
        Some(numRecords), withBlooms, PartitionPaths.parsePartitionValues(rel))
    }
    VintageCommitMessage(adds, idFillCount > 0)
  }

  override def abort(): Unit = {
    writers.values.foreach(w => try w.close() catch { case _: Exception => () })
    (completedPaths.toSeq ++ openPaths.values.toSeq).foreach { rel =>
      val p = new HPath(tableDir, rel)
      try p.getFileSystem(hconf).delete(p, false)
      catch { case _: java.io.IOException => () }
    }
  }

  override def close(): Unit = ()
}
