package graft.vintage.connector

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types._

import graft.vintage.VintageTable

/** SQL maintenance statements for vintage tables, Delta-flavored:
  *
  * {{{
  * OPTIMIZE vin.t                           -- compact to ~128MB files
  * OPTIMIZE vin.t ZORDER BY (a, b)          -- cluster on (a, b)
  * VACUUM vin.t [RETAIN 0.5 HOURS]
  * RESTORE TABLE vin.t TO VERSION AS OF 3
  * DESCRIBE HISTORY vin.t
  * }}}
  *
  * Implemented as a delegating parser (installed by
  * [[VintageSqlExtension]]): the four statement shapes are intercepted
  * by pattern, everything else passes through to Spark's parser. The
  * table reference is `catalog.name` (resolved via the catalog's
  * warehouse conf) or a quoted filesystem path. Each command is a thin
  * wrapper over the fluent maintenance API (compact/cluster/vacuum/
  * restoreToVersion/history).
  */
class VintageMaintenanceParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  import VintageMaintenanceParser._

  override def parsePlan(sqlText: String): LogicalPlan =
    tryVintage(sqlText).getOrElse(delegate.parsePlan(sqlText))

  /** A statement is ours only when every table reference resolves to a
    * vintage path — a ref in some OTHER catalog (`delta_cat.t`, a
    * single-part name) falls through to the delegate parser that owns
    * the identical Delta syntax instead of erroring here.
    */
  private def tryVintage(sqlText: String): Option[LogicalPlan] = {
    def resolved(ref: String): Option[String] =
      try Some(resolvePath(session, ref))
      catch { case _: IllegalArgumentException => None }
    sqlText match {
      case OptimizeRe(ref, _, where, _, zorder) => resolved(ref).map(p =>
        VintageOptimizeCommand(p,
          Option(zorder).toSeq.flatMap(_.split(',')).map(unquote).filter(_.nonEmpty),
          Option(where).map(_.trim).filter(_.nonEmpty)))
      case VacuumRe(ref, _, hours, dry) => resolved(ref).map(p =>
        VintageVacuumCommand(p, Option(hours).map(_.toDouble), dry != null))
      case RestoreRe(ref, version) => resolved(ref).map(p =>
        VintageRestoreCommand(p, version.toLong))
      // timestamp parsing AND version resolution happen at RUN time,
      // not parse time (EXPLAIN must not pin a version or do log IO)
      case RestoreTsRe(ref, ts) => resolved(ref).map(p =>
        VintageRestoreTsCommand(p, ts))
      case HistoryRe(ref) => resolved(ref).map(VintageHistoryCommand)
      case DetailRe(ref) => resolved(ref).map(VintageDetailCommand)
      case CloneRe(dest, kind, src) =>
        for (d <- resolved(dest); s <- resolved(src))
          yield VintageCloneCommand(d, s,
            deep = kind == null || !kind.equalsIgnoreCase("SHALLOW"))
      case ConvertRe(ref, _, partDdl) => resolved(ref).map(p =>
        VintageConvertCommand(p, Option(partDdl).map(_.trim).filter(_.nonEmpty)))
      case CopyIntoRe(ref, source, _, fmt, _, opts) => resolved(ref).map(p =>
        VintageCopyIntoCommand(p, source,
          Option(fmt).map(_.toLowerCase).getOrElse("parquet"),
          parseOptions(Option(opts).getOrElse(""))))
      case AddConstraintRe(ref, name, predicate) => resolved(ref).map(p =>
        VintageAddConstraintCommand(p, name, predicate.trim))
      case DropConstraintRe(ref, ifExists, name) => resolved(ref).map(p =>
        VintageDropConstraintCommand(p, name, ifExists != null))
      case SyncIdentityRe(ref, column) => resolved(ref).map(p =>
        VintageSyncIdentityCommand(p, column))
      case _ => None
    }
  }

  override def parseExpression(s: String) = delegate.parseExpression(s)
  override def parseTableIdentifier(s: String): TableIdentifier =
    delegate.parseTableIdentifier(s)
  override def parseFunctionIdentifier(s: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(s)
  override def parseMultipartIdentifier(s: String): Seq[String] =
    delegate.parseMultipartIdentifier(s)
  override def parseTableSchema(s: String): StructType = delegate.parseTableSchema(s)
  override def parseDataType(s: String): DataType = delegate.parseDataType(s)
  override def parseQuery(s: String): LogicalPlan = delegate.parseQuery(s)
  override def parseRoutineParam(s: String): StructType = delegate.parseRoutineParam(s)
}

object VintageMaintenanceParser {
  // table ref: quoted path ('…' or `…`) or a dotted identifier
  private val Ref = """('[^']+'|`[^`]+`|[\w.]+)"""
  private[connector] val OptimizeRe =
    (s"""(?is)^\\s*OPTIMIZE\\s+$Ref(\\s+WHERE\\s+(.+?))?(\\s+ZORDER\\s+BY\\s*\\(([^)]*)\\))?\\s*;?\\s*$$""").r
  private[connector] val VacuumRe =
    (s"""(?is)^\\s*VACUUM\\s+$Ref(\\s+RETAIN\\s+([\\d.]+)\\s+HOURS)?(\\s+DRY\\s+RUN)?\\s*;?\\s*$$""").r
  private[connector] val RestoreRe =
    (s"""(?is)^\\s*RESTORE\\s+(?:TABLE\\s+)?$Ref\\s+(?:TO\\s+)?VERSION\\s+AS\\s+OF\\s+(\\d+)\\s*;?\\s*$$""").r
  private[connector] val RestoreTsRe =
    (s"""(?is)^\\s*RESTORE\\s+(?:TABLE\\s+)?$Ref\\s+(?:TO\\s+)?TIMESTAMP\\s+AS\\s+OF\\s+'([^']+)'\\s*;?\\s*$$""").r
  private[connector] val HistoryRe =
    (s"""(?is)^\\s*DESC(?:RIBE)?\\s+HISTORY\\s+$Ref\\s*;?\\s*$$""").r
  private[connector] val DetailRe =
    (s"""(?is)^\\s*DESC(?:RIBE)?\\s+DETAIL\\s+$Ref\\s*;?\\s*$$""").r
  // bare CLONE is DEEP (Delta's convention); SHALLOW must be spelled
  private[connector] val CloneRe =
    (s"""(?is)^\\s*CREATE\\s+TABLE\\s+$Ref\\s+(?:(SHALLOW|DEEP)\\s+)?CLONE\\s+$Ref\\s*;?\\s*$$""").r
  private[connector] val ConvertRe =
    (s"""(?is)^\\s*CONVERT\\s+TO\\s+VINTAGE\\s+$Ref(\\s+PARTITIONED\\s+BY\\s*\\(([^)]*)\\))?\\s*;?\\s*$$""").r
  // FORMAT_OPTIONS body is captured greedily to the LAST ')' so quoted
  // values may themselves contain parentheses
  private[connector] val CopyIntoRe =
    (s"""(?is)^\\s*COPY\\s+INTO\\s+$Ref\\s+FROM\\s+'([^']+)'(\\s+FILEFORMAT\\s*=\\s*(\\w+))?(\\s+FORMAT_OPTIONS\\s*\\((.*)\\))?\\s*;?\\s*$$""").r
  private[connector] val AddConstraintRe =
    (s"""(?is)^\\s*ALTER\\s+TABLE\\s+$Ref\\s+ADD\\s+CONSTRAINT\\s+(\\w+)\\s+CHECK\\s*\\((.+)\\)\\s*;?\\s*$$""").r
  private[connector] val DropConstraintRe =
    (s"""(?is)^\\s*ALTER\\s+TABLE\\s+$Ref\\s+DROP\\s+CONSTRAINT\\s+(IF\\s+EXISTS\\s+)?(\\w+)\\s*;?\\s*$$""").r
  private[connector] val SyncIdentityRe =
    (s"""(?is)^\\s*ALTER\\s+TABLE\\s+$Ref\\s+ALTER\\s+COLUMN\\s+(\\w+)\\s+SYNC\\s+IDENTITY\\s*;?\\s*$$""").r

  /** `'k' = 'v', 'k2' = 'v2'` → Map (FORMAT_OPTIONS body). */
  private[connector] def parseOptions(s: String): Map[String, String] =
    """'([^']*)'\s*=\s*'([^']*)'""".r.findAllMatchIn(s)
      .map(m => m.group(1) -> m.group(2)).toMap

  private def unquote(s: String): String = {
    val t = s.trim
    if ((t.startsWith("'") && t.endsWith("'")) ||
        (t.startsWith("`") && t.endsWith("`"))) t.substring(1, t.length - 1)
    else t
  }

  /** A quoted ref is a filesystem path; a dotted ref resolves through
    * the named (or current) catalog's warehouse directory. The catalog
    * must actually BE a VintageCatalog — a foreign catalog (Iceberg,
    * Delta, …) that merely happens to have a `warehouse` conf must
    * fall through to the parser that owns its tables, especially for
    * core-grammar statements like ALTER TABLE … ADD CONSTRAINT.
    */
  private[connector] def resolvePath(session: SparkSession, ref: String): String = {
    val r = unquote(ref)
    if (ref.trim.startsWith("'") || ref.trim.startsWith("`") ||
        r.startsWith("/") || r.contains(":/")) return r
    val parts = r.split('.')
    require(parts.length >= 2,
      s"qualify the table as <catalog>.<name> or quote a path, got '$r'")
    val impl = session.conf.getOption(s"spark.sql.catalog.${parts.head}")
    require(impl.contains(classOf[VintageCatalog].getName),
      s"'${parts.head}' is not a vintage catalog")
    val warehouse = session.conf.getOption(
      s"spark.sql.catalog.${parts.head}.warehouse").getOrElse(
      throw new IllegalArgumentException(
        s"'${parts.head}' is not a configured vintage catalog"))
    (warehouse +: parts.tail).mkString("/")
  }
}

case class VintageOptimizeCommand(path: String, zorderBy: Seq[String],
    where: Option[String] = None) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", StringType, nullable = false)(),
    AttributeReference("filesBefore", LongType, nullable = false)(),
    AttributeReference("filesAfter", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    require(where.isEmpty || zorderBy.isEmpty,
      "OPTIMIZE ... WHERE cannot be combined with ZORDER BY")
    val t = VintageTable.forPath(spark, path)
    val before = t.snapshot.files.size
    where match {
      case Some(pred) =>
        t.compactWhere(org.apache.spark.sql.functions.expr(pred)): Unit
      case None =>
        // target ~128 MB files, the classic compaction sweet spot
        if (zorderBy.isEmpty) t.optimize(): Unit // bin-pack small files only
        else {
          val totalBytes = t.snapshot.files.map(_.size).sum
          val target = math.max(1,
            math.ceil(totalBytes / (128.0 * 1024 * 1024)).toInt)
          t.cluster(target, zorderBy: _*)
        }
    }
    Seq(Row(path, before.toLong, t.snapshot.files.size.toLong))
  }
}

case class VintageVacuumCommand(path: String, retainHours: Option[Double],
    dryRun: Boolean = false) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", StringType, nullable = false)(),
    AttributeReference("filesDeleted", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val t = VintageTable.forPath(spark, path)
    val h = retainHours.getOrElse(VintageTable.MinSafeRetentionHours)
    val deleted = t.vacuum(h, dryRun)
    Seq(Row(path, deleted))
  }
}

case class VintageRestoreCommand(path: String, version: Long)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    VintageTable.forPath(spark, path).restoreToVersion(version)
    Seq.empty
  }
}

/** `RESTORE … TIMESTAMP AS OF 'ts'` — accepts the same timestamp
  * grammar as the read-side `timestampAsOf` option (epoch millis, SQL
  * timestamp, ISO instant), resolved at execution time.
  */
case class VintageRestoreTsCommand(path: String, ts: String)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val millis = VintageSource.parseTs(ts)
    VintageTable.forPath(spark, path).restoreToVersion(
      graft.vintage.VintageLog.versionAtTimestamp(path, millis))
    Seq.empty
  }
}

case class VintageHistoryCommand(path: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("timestamp", TimestampType, nullable = false)(),
    AttributeReference("operation", StringType, nullable = false)(),
    AttributeReference("operationParameters",
      MapType(StringType, StringType), nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    VintageTable.forPath(spark, path).snapshot.commits.sortBy(-_.version).map { c =>
      Row(c.version, new java.sql.Timestamp(c.timestamp), c.operation,
        c.operationParameters)
    }
  }
}

/** `DESCRIBE DETAIL t` — one row of table-level metadata (Delta's
  * command of the same name): format, location, current version,
  * file/byte totals, partition columns, and user properties.
  */
case class VintageDetailCommand(path: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("format", StringType, nullable = false)(),
    AttributeReference("location", StringType, nullable = false)(),
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("numFiles", LongType, nullable = false)(),
    AttributeReference("sizeInBytes", LongType, nullable = false)(),
    AttributeReference("partitionColumns", ArrayType(StringType), nullable = false)(),
    AttributeReference("properties",
      MapType(StringType, StringType), nullable = false)(),
    AttributeReference("readerFeatures", ArrayType(StringType), nullable = false)(),
    AttributeReference("writerFeatures", ArrayType(StringType), nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val snap = VintageTable.forPath(spark, path).snapshot
    Seq(Row("vintage", path, snap.version, snap.files.size.toLong,
      snap.files.map(_.size).sum, snap.partitionColumns, snap.properties,
      snap.protocol.readerFeatures, snap.protocol.writerFeatures))
  }
}

/** `CONVERT TO VINTAGE 'path' [PARTITIONED BY (col type, ...)]` —
  * in-place, metadata-only import of an existing Parquet directory
  * (see [[graft.vintage.VintageTable.convert]]).
  */
case class VintageConvertCommand(path: String, partitionDdl: Option[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", StringType, nullable = false)(),
    AttributeReference("numFiles", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val partSchema = partitionDdl.map(StructType.fromDDL)
      .getOrElse(new StructType())
    val t = VintageTable.convert(spark, path, partSchema)
    Seq(Row(path, t.snapshot.files.size.toLong))
  }
}

/** `COPY INTO t FROM 'src' [FILEFORMAT = PARQUET|CSV|JSON]
  * [FORMAT_OPTIONS('k'='v', …)]` — incremental idempotent ingestion
  * (see [[graft.vintage.VintageTable.copyInto]]).
  */
case class VintageCopyIntoCommand(path: String, source: String,
    format: String, options: Map[String, String]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", StringType, nullable = false)(),
    AttributeReference("filesIngested", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val n = VintageTable.forPath(spark, path).copyInto(source, format, options)
    Seq(Row(path, n))
  }
}

/** `ALTER TABLE t ADD CONSTRAINT name CHECK (predicate)` — validates
  * existing rows, then enforces the predicate on every future write
  * (see [[graft.vintage.VintageTable.addConstraint]]).
  */
case class VintageAddConstraintCommand(path: String, name: String,
    predicate: String) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    VintageTable.forPath(spark, path).addConstraint(name, predicate)
    Seq.empty
  }
}

case class VintageDropConstraintCommand(path: String, name: String,
    ifExists: Boolean) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    VintageTable.forPath(spark, path).dropConstraint(name, ifExists)
    Seq.empty
  }
}

/** `ALTER TABLE t ALTER COLUMN c SYNC IDENTITY` — re-derive the
  * identity high-water mark from the data (see
  * [[graft.vintage.VintageTable.syncIdentity]]).
  */
case class VintageSyncIdentityCommand(path: String, column: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("column", StringType, nullable = false)(),
    AttributeReference("highWaterMark", LongType, nullable = true)())
  override def run(spark: SparkSession): Seq[Row] = {
    val mark = VintageTable.forPath(spark, path).syncIdentity(column)
    Seq(Row(column, mark.map(Long.box).orNull))
  }
}

/** `CREATE TABLE dst [SHALLOW|DEEP] CLONE src` — bare CLONE is deep
  * (independent data copy); SHALLOW is the metadata-only variant (see
  * [[graft.vintage.VintageTable.deepClone]] / `shallowClone`).
  */
case class VintageCloneCommand(destPath: String, srcPath: String,
    deep: Boolean = false)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("destination", StringType, nullable = false)(),
    AttributeReference("sourceVersion", LongType, nullable = false)(),
    AttributeReference("numFiles", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val src = VintageTable.forPath(spark, srcPath)
    val cl = if (deep) src.deepClone(destPath)
             else src.shallowClone(destPath)
    // the version the clone actually pinned is in its own v0 commit —
    // re-reading the source here could race a concurrent writer
    val snap = cl.snapshot
    val pinned = snap.commits.find(_.version == 0L)
      .flatMap(_.operationParameters.get("sourceVersion"))
      .map(_.toLong).getOrElse(-1L)
    Seq(Row(cl.path, pinned, snap.files.size.toLong))
  }
}
