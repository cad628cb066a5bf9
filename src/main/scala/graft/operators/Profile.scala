package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass column profiler — the data-quality census a corpus runs
  * before anything else touches it: per column, non-null count, exact
  * distinct count, and canonicalized min/max, in long format
  * `(column, n_nonnull, n_distinct, min_s, max_s)` so downstream
  * monitoring diffs profiles row-wise across snapshots.
  *
  * Shape: ONE aggregate over the input computes all 4·k measures —
  * Catalyst plans the k exact `count(DISTINCT)`s via a single Expand
  * (k-fold row multiplication before the partial agg, the standard
  * multi-distinct plan), then one wide row pivots to long format with
  * a `stack` projection (k metadata-sized rows, no second scan).
  *
  * 100 TB note: exact multi-distinct is an Expand ×k of the scan — the
  * honest price of exactness, chosen here because the profile sits on
  * the cross-engine hash gate. At petabyte scale swap `n_distinct` for
  * the fixed-size sketches next door ([[Hll]] registers or
  * `functions.KMinValues`) and the Expand disappears; min/max/counts
  * are plain map-side-combined aggregates either way. Values are
  * canonicalized to strings BY THE CALLER's expression (`fmt`) —
  * float min/max rendering is engine-defined, so the profile's
  * contract is over explicitly formatted values only.
  */
object Profile {

  /** Profile `cols` of `df`; `fmt(name, aggValue)` renders a native
    * min/max value to its canonical string (default: SQL string
    * cast). Min/max order is the column's NATIVE ordering — the
    * formatting happens after aggregation, so a numeric column's min
    * is its numeric min, not a lexicographic accident.
    */
  def profile(df: DataFrame,
      cols: Seq[String],
      fmt: (String, Column) => Column = (_, v) => v.cast("string"))
      : DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__n_$c"),
        countDistinct(col(c)).as(s"__d_$c"),
        fmt(c, min(col(c))).as(s"__min_$c"),
        fmt(c, max(col(c))).as(s"__max_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map { c =>
      s"'$c', `__n_$c`, `__d_$c`, `__min_$c`, `__max_$c`"
    }.mkString(", ")
    wide.selectExpr(
      s"stack(${cols.size}, $stackArgs) AS " +
        "(column_name, n_nonnull, n_distinct, min_s, max_s)")
  }
}
