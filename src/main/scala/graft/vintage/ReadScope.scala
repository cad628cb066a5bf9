package graft.vintage

import org.apache.spark.sql.catalyst.expressions.Expression

/** What a committing operation read from the table, used by the
  * optimistic-concurrency retry to decide whether files ADDED by a
  * concurrent winner invalidate this transaction (read/write conflict —
  * the analogue of Delta's ConcurrentAppendException).
  */
sealed trait ReadScope

/** Blind append: reads nothing, concurrent adds never conflict. */
case object NoRead extends ReadScope

/** Reads or replaces the whole logical table (overwrite, restore): any
  * concurrently added data file conflicts — retrying past it would
  * leave the added file live after an "overwrite", a state no serial
  * order produces.
  */
case object FullRead extends ReadScope

/** dataChange=false rewrite (compact, cluster): the logical row set is
  * preserved and concurrently added files stay live un-duplicated, so
  * the result is equivalent to running the layout rewrite first —
  * concurrent adds never conflict (removed files still do).
  */
case object LayoutOnly extends ReadScope

/** Row-level op (delete/update/merge) that read rows matching `cond`:
  * conflicts iff a concurrently added file's min/max stats may contain
  * matching rows (missing stats degrade to conflict, staying sound).
  */
case class PredicateRead(cond: Expression) extends ReadScope
