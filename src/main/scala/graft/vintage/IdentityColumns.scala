package graft.vintage

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, Metadata => FieldMetadata, MetadataBuilder, StructType}

/** Identity columns, Delta-style: `id BIGINT GENERATED ALWAYS AS
  * IDENTITY (START WITH s INCREMENT BY k)` in SQL DDL (via
  * `TableCatalogCapability.SUPPORTS_CREATE_TABLE_WITH_IDENTITY_COLUMNS`),
  * stored as table properties:
  *
  *  - `vintage.identity.<col>` = `start,step,allowExplicitInsert`
  *  - `vintage.identity.<col>.hwm` = the HIGH WATER MARK: the most
  *    extreme value ever allocated or accepted, carried in the commit
  *    that wrote past it (so allocation is transactional: a racing
  *    writer that read the same mark hits the metadata-conflict rule
  *    in the commit loop and re-allocates from the fresh snapshot).
  *
  * Allocation contract (Delta's documented semantics): values are
  * UNIQUE and move strictly away from `start` in the direction of
  * `step`, but are NOT guaranteed consecutive — parallel writers and
  * per-partition allocation leave gaps. Each generated row gets
  * `base + step * monotonically_increasing_id()` where `base` is one
  * step past the high water mark; the id packs (partition, row) so
  * uniqueness needs no coordination inside the write.
  *
  * GENERATED ALWAYS rejects writer-supplied values; BY DEFAULT
  * (`allowExplicitInsert`) accepts them and advances the mark past
  * them, so later generated values never collide.
  */
object IdentityColumns {

  val Prefix = "vintage.identity."
  private val HwmSuffix = ".hwm"

  /** Per-partition id spacing of `monotonically_increasing_id` (upper
    * 31 bits partition, lower 33 bits row) — documented so the gap
    * arithmetic in scaladoc/tests has a name.
    */
  val RowsPerPartition: Long = 1L << 33

  case class IdentitySpec(start: Long, step: Long, allowExplicit: Boolean) {
    require(step != 0, "identity INCREMENT must be non-zero")
    /** First value to allocate when the mark is `hwm`. */
    def nextBase(hwm: Option[Long]): Long = hwm.map(_ + step).getOrElse(start)
    /** True when `a` is strictly beyond `b` in step direction. */
    def beyond(a: Long, b: Long): Boolean = if (step > 0) a > b else a < b
  }

  /** (col -> spec) of every identity column in the table properties. */
  def specs(props: Map[String, String]): Map[String, IdentitySpec] =
    props.collect {
      case (k, v) if k.startsWith(Prefix) && !k.endsWith(HwmSuffix) =>
        // hand-set properties reach here unvalidated — fail with the
        // property name, not a MatchError in the middle of a DML op
        v.split(",", 3) match {
          case Array(s, i, a) =>
            try k.stripPrefix(Prefix) -> IdentitySpec(s.toLong, i.toLong, a.toBoolean)
            catch { case _: NumberFormatException =>
              throw new IllegalArgumentException(
                s"malformed identity property $k = '$v' " +
                s"(expected 'start,step,allowExplicitInsert')")
            }
          case _ => throw new IllegalArgumentException(
            s"malformed identity property $k = '$v' " +
            s"(expected 'start,step,allowExplicitInsert')")
        }
    }

  /** Property key of `col`'s high water mark. */
  def hwmKey(col: String): String = s"$Prefix$col$HwmSuffix"

  /** Recorded high water mark for `col`, absent until first allocation. */
  def hwm(props: Map[String, String], col: String): Option[Long] =
    props.get(hwmKey(col)).map(_.toLong)

  /** Table properties recording the given specs. */
  def properties(id: Map[String, IdentitySpec]): Map[String, String] =
    id.map { case (c, s) =>
      s"$Prefix$c" -> s"${s.start},${s.step},${s.allowExplicit}"
    }

  /** Extract identity specs Spark's DDL path ships in field metadata
    * (`IdentityColumn.getIdentityInfo`) and return the schema with
    * that metadata stripped — like [[GeneratedColumns]], the log
    * stores the contract as table properties, not field metadata.
    */
  def fromCreateSchema(schema: StructType): (StructType, Map[String, IdentitySpec]) = {
    val ic = org.apache.spark.sql.catalyst.util.IdentityColumn
    val out = scala.collection.mutable.Map[String, IdentitySpec]()
    val stripped = StructType(schema.fields.map { f =>
      ic.getIdentityInfo(f) match {
        case Some(s) =>
          require(f.dataType == LongType,
            s"identity column ${f.name} must be BIGINT, got ${f.dataType.sql}")
          out(f.name) = IdentitySpec(s.getStart, s.getStep, s.isAllowExplicitInsert)
          f.copy(metadata = dropKeys(f.metadata, Seq(
            ic.IDENTITY_INFO_START, ic.IDENTITY_INFO_STEP,
            ic.IDENTITY_INFO_ALLOW_EXPLICIT_INSERT)))
        case None => f
      }
    })
    (stripped, out.toMap)
  }

  private def dropKeys(m: FieldMetadata, keys: Seq[String]): FieldMetadata = {
    val b = new MetadataBuilder().withMetadata(m)
    keys.foreach(b.remove)
    b.build()
  }

  /** Ingest-side allocation: add each identity column MISSING from
    * `df` as generated values from one step past the mark; reject a
    * PRESENT column on a GENERATED ALWAYS spec. Returns the completed
    * frame plus the columns actually generated (the caller's cue to
    * carry a mark update and to re-allocate on commit conflict).
    */
  def complete(df: DataFrame, props: Map[String, String]): (DataFrame, Seq[String]) = {
    val id = specs(props)
    if (id.isEmpty) return (df, Nil)
    var out = df
    val generated = scala.collection.mutable.Buffer[String]()
    id.foreach { case (c, spec) =>
      if (df.schema.fieldNames.exists(_.equalsIgnoreCase(c))) {
        require(spec.allowExplicit,
          s"identity column $c is GENERATED ALWAYS — writers cannot supply " +
          s"it (declare it GENERATED BY DEFAULT to allow explicit values)")
      } else {
        val base = spec.nextBase(hwm(props, c))
        out = out.withColumn(c,
          lit(base) + lit(spec.step) * monotonically_increasing_id())
        generated += c
      }
    }
    (out, generated.toSeq)
  }

  /** MERGE-side allocation: the merge projection yields NULL for an
    * identity column on inserted rows whose clause did not supply it —
    * fill exactly those with generated values (existing target rows
    * keep their ids through `coalesce`). Returns the filled frame plus
    * the columns that had an allocation expression attached.
    */
  def fillNulls(df: DataFrame, props: Map[String, String]): (DataFrame, Seq[String]) = {
    val id = specs(props)
    if (id.isEmpty) return (df, Nil)
    var out = df
    val generated = scala.collection.mutable.Buffer[String]()
    id.foreach { case (c, spec) =>
      if (df.schema.fieldNames.exists(_.equalsIgnoreCase(c))) {
        val base = spec.nextBase(hwm(props, c))
        out = out.withColumn(c, coalesce(col(c),
          lit(base) + lit(spec.step) * monotonically_increasing_id()))
        generated += c
      }
    }
    (out, generated.toSeq)
  }

  /** Observed (min, max, nullCount) of `col` across the written files:
    * from log stats when every non-empty file carries them, else one
    * bounded scan of exactly the written files (stats cap wide tables
    * at 32 columns, and soundness must not depend on column position).
    */
  private def observedRange(
      spark: SparkSession, tableDir: String, adds: Seq[AddFile],
      physCol: String): Option[(Long, Long, Long)] = {
    val nonEmpty = adds.filterNot(_.numRecords.contains(0L))
    if (nonEmpty.isEmpty) return None
    val fromStats = nonEmpty.flatMap { a =>
      a.stats.get(physCol) match {
        case Some(ColStats(Some(mn), Some(mx), nulls, _)) =>
          Some((mn.toLong, mx.toLong, nulls.getOrElse(0L)))
        case _ => None
      }
    }
    if (fromStats.size == nonEmpty.size)
      Some((fromStats.map(_._1).min, fromStats.map(_._2).max,
        fromStats.map(_._3).sum))
    else {
      val paths = nonEmpty.map(_.absolutePath(tableDir))
      val r = spark.read.parquet(paths: _*)
        .agg(min(col(physCol)), max(col(physCol)),
          sum(when(col(physCol).isNull, 1L).otherwise(0L)))
        .head()
      if (r.isNullAt(0)) Some((0L, 0L, r.getLong(2)))
      else Some((r.getLong(0), r.getLong(1), r.getLong(2)))
    }
  }

  /** Mark updates for one commit's written files: for each identity
    * column, the property map advancing its high water mark past every
    * observed value (empty when nothing moved). `generated` columns
    * additionally get an allocation-sanity check: every value must lie
    * at-or-beyond this write's base in step direction — a violation
    * means arithmetic overflow wrapped the allocation, and the commit
    * must fail rather than record colliding ids. Explicit values must
    * be non-null (an identity column holds allocated ids, not NULLs).
    */
  def advance(
      spark: SparkSession, tableDir: String, tableSchema: StructType,
      props: Map[String, String], adds: Seq[AddFile],
      generated: Seq[String]): Map[String, String] = {
    val id = specs(props)
    if (id.isEmpty) return Map.empty
    val genSet = generated.map(_.toLowerCase).toSet
    id.flatMap { case (c, spec) =>
      val phys = if (ColumnMapping.mapped(tableSchema))
        ColumnMapping.toPhysical(tableSchema, c) else c
      observedRange(spark, tableDir, adds, phys).flatMap {
        case (mn, mx, nulls) =>
          require(nulls == 0,
            s"identity column $c contains $nulls NULLs — identity values " +
            s"must be allocated or explicitly supplied, never null")
          if (genSet(c.toLowerCase)) {
            val base = spec.nextBase(hwm(props, c))
            val inRange =
              if (spec.step > 0) mn >= base else mx <= base
            require(inRange,
              s"identity allocation for $c overflowed BIGINT (observed " +
              s"[$mn,$mx] vs base $base) — the id space is exhausted")
          }
          val observedEdge = if (spec.step > 0) mx else mn
          val current = hwm(props, c)
          if (current.forall(h => spec.beyond(observedEdge, h)) &&
              (current.nonEmpty || spec.beyond(observedEdge, spec.start) ||
               observedEdge == spec.start))
            Some(s"$Prefix$c$HwmSuffix" -> observedEdge.toString)
          else None
      }
    }
  }

  /** Carry identity properties through RENAME COLUMN (`to = Some`) or
    * remove them on DROP COLUMN (`to = None`) — orphaned
    * `vintage.identity.<old>` entries would make [[complete]] add a
    * phantom column under the old name and brick every append.
    */
  def rewriteProps(props: Map[String, String], from: String,
      to: Option[String]): Map[String, String] = {
    val specKey = props.keys.find(k => k.startsWith(Prefix) &&
      !k.endsWith(HwmSuffix) && k.stripPrefix(Prefix).equalsIgnoreCase(from))
    specKey match {
      case None => props
      case Some(k) =>
        val old = k.stripPrefix(Prefix)
        val stripped = props - k - hwmKey(old)
        to match {
          case None => stripped
          case Some(n) =>
            stripped ++ Seq(s"$Prefix$n" -> props(k)) ++
              props.get(hwmKey(old)).map(hwmKey(n) -> _)
        }
    }
  }

  /** Reject row-level assignments to GENERATED ALWAYS identity columns
    * (UPDATE/MERGE SET id = …): explicit values there break the
    * allocation contract exactly like explicit INSERTs do.
    */
  def validateAssignments(setCols: Iterable[String],
      props: Map[String, String]): Unit = {
    val id = specs(props)
    if (id.isEmpty) return
    setCols.foreach { c =>
      id.find(_._1.equalsIgnoreCase(c)).foreach { case (_, s) =>
        require(s.allowExplicit,
          s"cannot assign identity column $c: it is GENERATED ALWAYS")
      }
    }
  }
}
