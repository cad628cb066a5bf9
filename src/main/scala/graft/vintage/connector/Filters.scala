package graft.vintage.connector

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._

/** DataSource `Filter` → `Column` translation for the SQL surface
  * (DELETE WHERE predicates, scan pushdown re-application).
  */
object Filters {
  def toColumn(f: Filter): Option[Column] = f match {
    case EqualTo(a, v) => Some(col(a) === lit(v))
    case EqualNullSafe(a, v) => Some(col(a) <=> lit(v))
    case GreaterThan(a, v) => Some(col(a) > lit(v))
    case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case LessThan(a, v) => Some(col(a) < lit(v))
    case LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
    case In(a, vs) => Some(col(a).isin(vs.toIndexedSeq: _*))
    case IsNull(a) => Some(col(a).isNull)
    case IsNotNull(a) => Some(col(a).isNotNull)
    case StringStartsWith(a, v) => Some(col(a).startsWith(v))
    case StringEndsWith(a, v) => Some(col(a).endsWith(v))
    case StringContains(a, v) => Some(col(a).contains(v))
    case And(l, r) => for (lc <- toColumn(l); rc <- toColumn(r)) yield lc && rc
    case Or(l, r) => for (lc <- toColumn(l); rc <- toColumn(r)) yield lc || rc
    case Not(c) => toColumn(c).map(!_)
    case AlwaysTrue() => Some(lit(true))
    case AlwaysFalse() => Some(lit(false))
    case _ => None
  }

  def toColumnAll(fs: Seq[Filter]): Option[Column] =
    fs.foldLeft(Option(lit(true))) { (acc, f) =>
      for (a <- acc; c <- toColumn(f)) yield a && c
    }

  /** Rewrite attribute references through `ren` (logical→physical for
    * handing filters to the parquet reader under column mapping).
    * Filters with shapes we don't model are DROPPED (None) — safe,
    * because the scan keeps every filter residual and Spark re-applies
    * them above; the cost is only lost row-group pruning for that one
    * predicate.
    */
  def renameRefs(f: Filter, ren: String => String): Option[Filter] = f match {
    case EqualTo(a, v) => Some(EqualTo(ren(a), v))
    case EqualNullSafe(a, v) => Some(EqualNullSafe(ren(a), v))
    case GreaterThan(a, v) => Some(GreaterThan(ren(a), v))
    case GreaterThanOrEqual(a, v) => Some(GreaterThanOrEqual(ren(a), v))
    case LessThan(a, v) => Some(LessThan(ren(a), v))
    case LessThanOrEqual(a, v) => Some(LessThanOrEqual(ren(a), v))
    case In(a, vs) => Some(In(ren(a), vs))
    case IsNull(a) => Some(IsNull(ren(a)))
    case IsNotNull(a) => Some(IsNotNull(ren(a)))
    case StringStartsWith(a, v) => Some(StringStartsWith(ren(a), v))
    case StringEndsWith(a, v) => Some(StringEndsWith(ren(a), v))
    case StringContains(a, v) => Some(StringContains(ren(a), v))
    case And(l, r) =>
      for (lc <- renameRefs(l, ren); rc <- renameRefs(r, ren)) yield And(lc, rc)
    case Or(l, r) =>
      for (lc <- renameRefs(l, ren); rc <- renameRefs(r, ren)) yield Or(lc, rc)
    case Not(c) => renameRefs(c, ren).map(Not)
    case AlwaysTrue() | AlwaysFalse() => Some(f)
    case _ => None
  }
}
