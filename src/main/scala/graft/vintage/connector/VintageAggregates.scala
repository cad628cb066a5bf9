package graft.vintage.connector

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.{Expression => VExpr, FieldReference, NamedReference}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.{Batch, LocalScan, Scan}
import org.apache.spark.sql.types._

import graft.vintage.{AddFile, ColStats, PartitionPaths, Snapshot}

/** Metadata-only aggregate answering from the transaction log.
  *
  * `SELECT count(*) FROM t` (and min/max/count over stats-covered
  * columns, optionally grouped by partition columns) never needs to
  * touch a data file: every live [[AddFile]] carries `numRecords` and
  * per-column min/max/nullCount written from the parquet footers at
  * commit time. At 100 TB that turns a full-table scan into a driver
  * fold over the snapshot — the same trick Delta's
  * OptimizeMetadataOnlyDeltaQuery and Spark's own parquet aggregate
  * pushdown (`AggregatePushDownUtils`) apply, here served through a
  * DSv2 [[LocalScan]] so the plan degenerates to a local table scan.
  *
  * Soundness rules:
  *   - any file missing the needed stat → refuse the pushdown
  *     (Spark falls back to the normal columnar scan);
  *   - Min/Max only over types whose stat-string encoding round-trips
  *     exactly (integrals, date/timestamp, decimal, boolean). Strings
  *     are excluded (parquet footers may truncate binary stats) and
  *     floats are excluded (footer min/max ignores NaN, Spark's
  *     ordering puts NaN above all values);
  *   - Count(col) = sum(numRecords - nullCount), so it needs both;
  *   - all-null files (nullCount == numRecords) legitimately
  *     contribute nothing to Min/Max even without min/max stats.
  *
  * Spark only attempts aggregate pushdown when no post-scan filter
  * remains, and this connector keeps every filter residual, so the
  * pushdown is offered exactly for unfiltered aggregates.
  */
object VintageAggregates {

  /** One pushed-aggregate result: output schema (group-by columns
    * first, then aggregate columns — the order V2ScanRelationPushDown
    * expects) and the precomputed rows.
    */
  case class Result(schema: StructType, rows: Array[InternalRow], desc: String)

  def tryCompute(snapshot: Snapshot, agg: Aggregation): Option[Result] = {
    // spilled snapshots (SnapshotSpill): the driver fold below would
    // materialize the full file list — refuse the pushdown and let the
    // normal (pruned, distributed) scan answer; a distributed
    // metadata fold is the future upgrade path here
    if (snapshot.spilled.isDefined) return None
    val groupCols: Option[Seq[StructField]] =
      traverse(agg.groupByExpressions.toSeq) {
        case ref: NamedReference if ref.fieldNames.length == 1 =>
          val n = ref.fieldNames.head
          if (snapshot.partitionColumns.exists(_.equalsIgnoreCase(n)))
            snapshot.schema.fields.find(_.name.equalsIgnoreCase(n))
          else None
        case _ => None
      }
    groupCols.flatMap { keys =>
      val groups: Seq[(Seq[String], Seq[AddFile])] =
        if (keys.isEmpty) Seq(Nil -> snapshot.statFiles)
        else snapshot.statFiles
          .groupBy(f => keys.map(k => partValue(f, k.name)))
          .toSeq.sortBy(_._1.mkString("\u0000"))
      traverse(agg.aggregateExpressions.toSeq)(aggField(snapshot.schema, _))
        .flatMap { aggFields =>
          val rows = traverse(groups) { case (keyVals, files) =>
            traverse(agg.aggregateExpressions.toSeq)(evalAgg(snapshot.schema, files, _))
              .map { aggVals =>
                val keyTyped = keys.zip(keyVals).map { case (f, raw) =>
                  PartitionPaths.castValue(raw, f.dataType)
                }
                InternalRow.fromSeq(keyTyped ++ aggVals)
              }
          }
          rows.map { rs =>
            Result(
              StructType(keys ++ aggFields),
              rs.toArray,
              s"groupBy=[${keys.map(_.name).mkString(",")}] " +
                s"aggs=[${agg.aggregateExpressions.mkString(", ")}]")
          }
        }
    }
  }

  /** Raw partition-value string of file `f` for column `col` (the hive
    * null sentinel if genuinely null-partitioned).
    */
  private def partValue(f: AddFile, col: String): String =
    f.partitionValues.collectFirst {
      case (k, v) if k.equalsIgnoreCase(col) => v
    }.getOrElse(PartitionPaths.HiveDefaultPartition)

  /** Output field for one aggregate function, None if unsupported. */
  private def aggField(schema: StructType, fn: AggregateFunc): Option[StructField] =
    fn match {
      case _: CountStar => Some(StructField("count(*)", LongType, nullable = false))
      case c: Count if !c.isDistinct =>
        singleField(schema, c.column).map(f =>
          StructField(s"count(${f.name})", LongType, nullable = false))
      case m: Min =>
        singleField(schema, m.column).filter(f => exactStatType(f.dataType))
          .map(f => StructField(s"min(${f.name})", f.dataType))
      case m: Max =>
        singleField(schema, m.column).filter(f => exactStatType(f.dataType))
          .map(f => StructField(s"max(${f.name})", f.dataType))
      case _ => None
    }

  /** Evaluate one aggregate over a file group; None aborts the pushdown.
    *
    * Deletion vectors: `count(*)` stays metadata-answerable
    * (`liveRecords` = footer count minus DV cardinality — exact by
    * construction). `count(col)`, min, and max REFUSE files carrying a
    * DV: the footer null count and min/max include the deleted rows,
    * so the stats may over- or under-state the live answer.
    */
  private def evalAgg(schema: StructType, files: Seq[AddFile],
                      fn: AggregateFunc): Option[Any] = fn match {
    case _: CountStar =>
      traverse(files)(_.liveRecords).map(_.sum)
    case c: Count if !c.isDistinct =>
      singleField(schema, c.column).flatMap { f =>
        traverse(files) { file =>
          for {
            n <- file.numRecords
            if !file.hasDv
            nulls <- colStats(file, f.name).flatMap(_.nullCount)
          } yield n - nulls
        }.map(_.sum)
      }
    case m: Min => minMax(schema, files, m.column, isMin = true)
    case m: Max => minMax(schema, files, m.column, isMin = false)
    case _ => None
  }

  private def minMax(schema: StructType, files: Seq[AddFile],
                     col: VExpr, isMin: Boolean): Option[Any] =
    singleField(schema, col).filter(f => exactStatType(f.dataType)).flatMap { f =>
      // each file contributes Some(ordKey -> value), or None for an
      // all-null file; a file with no usable stat kills the pushdown —
      // as does a deletion vector (the extremum may be a deleted row)
      val perFile = traverse(files) { file =>
        if (file.hasDv) None
        else {
          val st = colStats(file, f.name)
          val bound = st.flatMap(s => if (isMin) s.min else s.max)
          bound.flatMap(decode(f.dataType, _)) match {
            case Some(kv) => Some(Some(kv))
            case None =>
              val allNull = for {n <- file.numRecords; s <- st; nc <- s.nullCount}
                yield nc == n
              if (allNull.contains(true)) Some(None) else None
          }
        }
      }
      perFile.map { contribs =>
        val present = contribs.flatten
        if (present.isEmpty) null
        else (if (isMin) present.minBy(_._1) else present.maxBy(_._1))._2
      }
    }

  /** Stat string → (ordering key, catalyst value). Only types whose
    * encoding (ParquetStats: integrals/datetimes as decimal strings in
    * their internal unit, decimals as plain decimal strings, booleans
    * as true/false) round-trips exactly.
    */
  private def decode(dt: DataType, s: String): Option[(BigDecimal, Any)] =
    try dt match {
      case ByteType => Some(BigDecimal(s) -> s.toByte)
      case ShortType => Some(BigDecimal(s) -> s.toShort)
      case IntegerType | DateType => Some(BigDecimal(s) -> s.toInt)
      case LongType | TimestampType | TimestampNTZType =>
        Some(BigDecimal(s) -> s.toLong)
      case BooleanType =>
        val b = s.toBoolean
        Some(BigDecimal(if (b) 1 else 0) -> b)
      case d: DecimalType =>
        val bd = BigDecimal(s)
        val dec = org.apache.spark.sql.types.Decimal(bd)
        if (dec.changePrecision(d.precision, d.scale)) Some(bd -> dec) else None
      case _ => None
    } catch { case _: IllegalArgumentException => None }

  private def exactStatType(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | DateType |
         TimestampType | TimestampNTZType | BooleanType => true
    case _: DecimalType => true
    case _ => false
  }

  private def singleField(schema: StructType, e: VExpr): Option[StructField] =
    e match {
      case ref: NamedReference if ref.fieldNames.length == 1 =>
        schema.fields.find(_.name.equalsIgnoreCase(ref.fieldNames.head))
      case _ => None
    }

  private def colStats(f: AddFile, col: String): Option[ColStats] =
    f.stats.collectFirst { case (k, v) if k.equalsIgnoreCase(col) => v }

  /** Option-valued map over a Seq: None if any element maps to None. */
  private def traverse[A, B](xs: Seq[A])(f: A => Option[B]): Option[Seq[B]] = {
    val out = Seq.newBuilder[B]
    val it = xs.iterator
    while (it.hasNext) f(it.next()) match {
      case Some(b) => out += b
      case None => return None
    }
    Some(out.result())
  }
}

/** Driver-side scan carrying a precomputed metadata-aggregate result. */
class VintageMetadataScan(result: VintageAggregates.Result, table: String)
    extends LocalScan {
  override def readSchema(): StructType = result.schema
  override def rows(): Array[InternalRow] = result.rows
  override def description(): String =
    s"VintageMetadataScan $table ${result.desc}"
}
