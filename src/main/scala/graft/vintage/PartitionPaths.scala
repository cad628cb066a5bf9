package graft.vintage

import org.apache.spark.sql.types._

/** Hive-style partition path handling: `p1=v1/p2=v2/part-*.parquet`.
  *
  * Spark's `df.write.partitionBy` produces escaped directory names
  * (`%XX` for characters illegal in paths, `__HIVE_DEFAULT_PARTITION__`
  * for null); we parse those back into per-file partitionValues for the
  * log and synthesize min=max=value column stats from them, so the
  * existing [[FileSkipping]] machinery prunes partitions everywhere a
  * predicate is consulted — scan, delete/update/merge touched-file
  * discovery — with no separate partition-pruning code path.
  */
object PartitionPaths {

  val HiveDefaultPartition = "__HIVE_DEFAULT_PARTITION__"

  /** Unescape a hive path-name segment (inverse of Spark's
    * escapePathName: `%XX` hex escapes only; '+' is a literal plus).
    */
  def unescapePathName(s: String): String = {
    if (!s.contains('%')) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length) {
        val hex = try Integer.parseInt(s.substring(i + 1, i + 3), 16) catch {
          case _: NumberFormatException => -1
        }
        if (hex >= 0) { sb.append(hex.toChar); i += 3 }
        else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Parse `p1=v1/p2=v2` directory segments of a file path relative to
    * the table root into partition values (unescaped, hive-default
    * sentinel preserved). The final path segment (the file name) is
    * ignored; non-`k=v` segments stop the parse.
    */
  def parsePartitionValues(relPath: String): Map[String, String] = {
    val segs = relPath.split('/').dropRight(1)
    segs.iterator.takeWhile(_.contains('=')).map { seg =>
      val eq = seg.indexOf('=')
      unescapePathName(seg.substring(0, eq)) -> unescapePathName(seg.substring(eq + 1))
    }.toMap
  }

  /** Synthetic ColStats for a partition column: every row in the file
    * has exactly this value, so min = max = value and the null count is
    * all-or-nothing. Only emitted for types whose stat-string encoding
    * can be derived from the partition string (see [[ParquetStats]]
    * encoding: dates as epoch days, integrals/decimals as decimal
    * strings, strings raw); other types get no stats — skipping
    * degrades to "may match", never to wrong pruning.
    */
  def statsFor(dt: DataType, value: String, numRecords: Option[Long]): Option[ColStats] = {
    if (value == HiveDefaultPartition)
      return Some(ColStats(None, None, numRecords.orElse(Some(Long.MaxValue))))
    val encoded: Option[String] = dt match {
      case StringType => Some(value)
      case BooleanType => Some(value)
      case ByteType | ShortType | IntegerType | LongType | _: DecimalType |
           FloatType | DoubleType => Some(value)
      case DateType =>
        try Some(java.time.LocalDate.parse(value).toEpochDay.toString)
        catch { case _: java.time.format.DateTimeParseException => None }
      case _ => None // timestamps etc.: no synthetic stats (sound)
    }
    encoded.map(v => ColStats(Some(v), Some(v), Some(0L)))
  }

  /** Catalyst value of a raw partition string for column type `dt`
    * (null for the hive default sentinel), for building the
    * partition-values InternalRow the parquet reader appends to rows.
    */
  def castValue(raw: String, dt: DataType): Any =
    if (raw == HiveDefaultPartition) null
    else org.apache.spark.sql.catalyst.expressions.Cast(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(raw), StringType),
      dt, Some("UTC")).eval(null)

  /** Augment a file's stats with synthetic partition-column stats. */
  def augment(schema: StructType, f: AddFile): AddFile =
    if (f.partitionValues.isEmpty) f
    else {
      val extra = f.partitionValues.flatMap { case (c, v) =>
        schema.fields.collectFirst { case sf if sf.name.equalsIgnoreCase(c) => sf }
          .flatMap(sf => statsFor(sf.dataType, v, f.numRecords).map(sf.name -> _))
      }
      f.copy(stats = extra ++ f.stats)
    }
}
