package graft.vintage

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias
import org.apache.spark.sql.graftshim.ColumnExpr
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Fluent MERGE builder mirroring the Delta API exercised at
  * /root/reference/README.md:124-131:
  *
  * {{{
  * VintageTable.forPath(spark, dir).as("master")
  *   .merge(submission.as("submission"), "master.KEY = submission.KEY")
  *   .whenMatched().updateAll()
  *   .whenNotMatched().insertAll()
  *   .execute()
  * }}}
  *
  * Execution is two file-granular phases (SURVEY.md §3.2): a semi join
  * discovers the files containing matched rows; a full-outer join of
  * only those files against the source produces the rewrite. Clause
  * order is first-match-wins, as in Delta/SQL MERGE.
  *
  * Schema evolution (README.md:327-388): when
  * `spark.vintage.schema.autoMerge.enabled` (the reference's
  * `spark.databricks.delta.schema.autoMerge.enabled` is honored as an
  * alias) is true, source-only columns are appended to the table
  * schema as nullable fields; pre-evolution files read them as null.
  */
class VintageMergeBuilder private[vintage] (
    table: VintageTable,
    targetAlias: Option[String],
    source: DataFrame,
    condition: Column) {

  import VintageMergeBuilder._

  private var clauses: Vector[Clause] = Vector.empty

  def whenMatched(): MatchedBuilder = new MatchedBuilder(this, None)
  def whenMatched(cond: String): MatchedBuilder = new MatchedBuilder(this, Some(expr(cond)))
  def whenMatched(cond: Column): MatchedBuilder = new MatchedBuilder(this, Some(cond))
  def whenNotMatched(): NotMatchedBuilder = new NotMatchedBuilder(this, None)
  def whenNotMatched(cond: String): NotMatchedBuilder = new NotMatchedBuilder(this, Some(expr(cond)))
  def whenNotMatched(cond: Column): NotMatchedBuilder = new NotMatchedBuilder(this, Some(cond))

  private[vintage] def add(c: Clause): VintageMergeBuilder = { clauses :+= c; this }

  def execute(): Unit = {
    val spark = table.spark
    val snap = table.snapshot

    val autoMerge =
      spark.conf.getOption("spark.vintage.schema.autoMerge.enabled")
        .orElse(spark.conf.getOption("spark.databricks.delta.schema.autoMerge.enabled"))
        .exists(_.equalsIgnoreCase("true"))

    val targetFields = snap.schema.fields
    val targetCols = targetFields.map(_.name)
    val sourceOnly = source.schema.fields
      .filterNot(f => targetCols.exists(_.equalsIgnoreCase(f.name)))
    if (sourceOnly.nonEmpty && !autoMerge &&
        clauses.exists {
          case Clause(_, _, UpdateAll) | Clause(_, _, InsertAll) => true
          case _ => false
        })
      throw new IllegalArgumentException(
        s"source columns ${sourceOnly.map(_.name).mkString(",")} not in target " +
        "schema; enable spark.vintage.schema.autoMerge.enabled for schema evolution")
    val finalSchema: StructType =
      if (autoMerge && sourceOnly.nonEmpty)
        ColumnMapping.evolve(snap.schema,
          StructType(targetFields ++ sourceOnly.map(_.copy(nullable = true))),
          ColumnMapping.active(snap.properties))
      else snap.schema

    // ---- phase 1: touched-file discovery. Stats pruning first: the
    // source's min/max per equi-join key (one tiny agg job) bounds the
    // target files worth scanning, so a 4-row merge message against a
    // 100 TB table reads only the files whose key range intersects the
    // message — then the semi join confirms actual matches.
    val srcAlias = sourceAliasOf(source)
    val keyPairs = FileSkipping.equiJoinKeys(
      ColumnExpr.expr(condition), targetAlias, srcAlias,
      targetCols.toSeq, source.schema.fieldNames.toSeq)
    val rangeCond: Option[Column] =
      if (keyPairs.isEmpty) None
      else {
        val aggs = keyPairs.flatMap { case (_, s) => Seq(min(col(s)), max(col(s))) }
        val row = source.agg(aggs.head, aggs.tail: _*).head()
        Some(keyPairs.zipWithIndex.map { case ((t, _), i) =>
          val mn = row.get(2 * i); val mx = row.get(2 * i + 1)
          if (mn == null) lit(false) // all-null source keys match nothing
          else col(t) >= lit(mn) && col(t) <= lit(mx)
        }.reduce(_ && _))
      }
    val candidates: Seq[AddFile] = rangeCond match {
      case _ if snap.files.isEmpty => Nil
      case None => snap.files
      case Some(rc) =>
        FileSkipping.candidates(snap.schema, snap.statFiles, ColumnExpr.expr(rc))
    }
    val touched: Set[String] =
      if (candidates.isEmpty) Set.empty
      else {
        val candDf = table.readerFor(snap)
          .parquet(candidates.map(_.absolutePath(table.path)): _*)
        val tRaw = candDf.select(
          col("_metadata.file_path").as(VintageTable.FileCol) +: table.logicalCols(snap): _*)
        aliased(tRaw, targetAlias)
          .join(aliased(source, srcAlias), condition, "left_semi")
          .select(VintageTable.FileCol).distinct()
          .collect().map(r => table.relativize(r.getString(0))).toSet
      }

    // ---- phase 2: rewrite touched files + inserts via one full outer join
    val tBase =
      if (touched.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], snap.schema)
      else table.readFiles(snap, touched)
    val tMarked = aliased(tBase.withColumn(TgtMark, lit(true)), targetAlias)
    val sMarked = aliased(source.withColumn(SrcMark, lit(true)), sourceAliasOf(source))

    val joined = tMarked.join(sMarked, condition, "full_outer")
    val matched = col(TgtMark).isNotNull && col(SrcMark).isNotNull
    val srcOnly = col(TgtMark).isNull && col(SrcMark).isNotNull

    // row action: first matching clause wins; KEEP for untouched target
    // rows; DROP for source rows no insert clause accepts.
    val matchedClauses = clauses.zipWithIndex.filter(_._1.matched)
    val notMatchedClauses = clauses.zipWithIndex.filterNot(_._1.matched)
    var act: Column = lit(Keep)
    // build right-to-left so earlier clauses take precedence
    (matchedClauses.reverse).foreach { case (cl, i) =>
      val code = if (cl.action == DeleteRow) Drop else ClauseBase + i
      act = when(matched && cl.cond.getOrElse(lit(true)), lit(code)).otherwise(act)
    }
    var insertAct: Column = lit(Drop)
    (notMatchedClauses.reverse).foreach { case (cl, i) =>
      insertAct = when(cl.cond.getOrElse(lit(true)), lit(ClauseBase + i)).otherwise(insertAct)
    }
    act = when(srcOnly, insertAct).otherwise(act)

    val withAct = joined.withColumn(ActCol, act).filter(col(ActCol) =!= Drop)

    def tgtRef(c: String): Column =
      if (targetCols.exists(_.equalsIgnoreCase(c)))
        targetAlias.map(a => col(s"$a.$c")).getOrElse(tMarked(c))
      else lit(null)
    def srcRef(c: String): Column =
      if (source.schema.fieldNames.exists(_.equalsIgnoreCase(c)))
        sourceAliasOf(source).map(a => col(s"$a.$c")).getOrElse(sMarked(c))
      else lit(null)

    val outCols = finalSchema.fields.toIndexedSeq.map { f =>
      var e: Column = tgtRef(f.name)
      (matchedClauses ++ notMatchedClauses).foreach { case (cl, i) =>
        val clauseExpr: Option[Column] = cl.action match {
          case UpdateAll | InsertAll =>
            Some(if (source.schema.fieldNames.exists(_.equalsIgnoreCase(f.name)))
              srcRef(f.name) else if (cl.action == InsertAll) lit(null) else tgtRef(f.name))
          case SetCols(m) =>
            m.collectFirst { case (k, v) if k.equalsIgnoreCase(f.name) => v }
              .orElse(Some(if (cl.matched) tgtRef(f.name) else lit(null)))
          case DeleteRow => None
        }
        clauseExpr.foreach { ce =>
          e = when(col(ActCol) === (ClauseBase + i), ce).otherwise(e)
        }
      }
      e.cast(f.dataType).as(f.name)
    }

    val rewritten = withAct.select(outCols: _*)
    // Small-file mitigation (reference README.md:394-397): with the
    // flag on, the rewrite is coalesced to ~the number of touched input
    // files instead of fanning out to shuffle.partitions output files.
    val repartitionBeforeWrite =
      spark.conf.getOption("spark.vintage.merge.repartitionBeforeWrite")
        .orElse(spark.conf.getOption("spark.delta.merge.repartitionBeforeWrite"))
        .exists(_.equalsIgnoreCase("true"))
    val toWrite =
      if (repartitionBeforeWrite) rewritten.repartition(math.max(1, touched.size))
      else rewritten
    val adds =
      if (touched.isEmpty && notMatchedClauses.isEmpty) Nil
      else VintageTable.writeFiles(spark, toWrite, table.path, dataChange = true,
        snap.partitionColumns, tableSchema = finalSchema)
    val meta =
      if (finalSchema != snap.schema)
        Some(Metadata(finalSchema.json, snap.properties, snap.partitionColumns))
      else None
    // read/write conflict scope: the merge read every target row whose
    // key falls in the source's key range; without extractable equi-join
    // keys it read the whole table
    val scope = rangeCond
      .map(rc => PredicateRead(ColumnExpr.expr(rc)): ReadScope)
      .getOrElse(FullRead)
    table.commitOp(snap, "MERGE",
      Map("predicate" -> s"(${condition.toString})"),
      adds, table.removesFor(snap, touched), meta, scope)
  }

  private def aliased(df: DataFrame, a: Option[String]): DataFrame =
    a.fold(df)(df.as(_))
}

object VintageMergeBuilder {
  private[vintage] val TgtMark = "__vintage_tgt"
  private[vintage] val SrcMark = "__vintage_src"
  private[vintage] val ActCol = "__vintage_act"
  private[vintage] val Keep = 0
  private[vintage] val Drop = -1
  private[vintage] val ClauseBase = 10

  private[vintage] sealed trait MergeAction
  private[vintage] case object UpdateAll extends MergeAction
  private[vintage] case object InsertAll extends MergeAction
  private[vintage] case object DeleteRow extends MergeAction
  private[vintage] case class SetCols(set: Map[String, Column]) extends MergeAction

  private[vintage] case class Clause(
      matched: Boolean, cond: Option[Column], action: MergeAction)

  /** Alias name of a DataFrame created via `df.as("name")`, if any. */
  private[vintage] def sourceAliasOf(df: DataFrame): Option[String] =
    df.queryExecution.logical match {
      case SubqueryAlias(id, _) => Some(id.name)
      case _ => None
    }

  class MatchedBuilder private[vintage] (b: VintageMergeBuilder, cond: Option[Column]) {
    /** Update every target column from the same-named source column. */
    def updateAll(): VintageMergeBuilder = b.add(Clause(matched = true, cond, UpdateAll))
    def update(set: Map[String, Column]): VintageMergeBuilder =
      b.add(Clause(matched = true, cond, SetCols(set)))
    def delete(): VintageMergeBuilder = b.add(Clause(matched = true, cond, DeleteRow))
  }

  class NotMatchedBuilder private[vintage] (b: VintageMergeBuilder, cond: Option[Column]) {
    def insertAll(): VintageMergeBuilder = b.add(Clause(matched = false, cond, InsertAll))
    def insert(set: Map[String, Column]): VintageMergeBuilder =
      b.add(Clause(matched = false, cond, SetCols(set)))
  }
}
