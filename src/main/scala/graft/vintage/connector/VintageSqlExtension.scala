package graft.vintage.connector

import org.apache.spark.sql.{Column, Row, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeSet, Expression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.graftshim.{ColumnExpr, DatasetOps}

import graft.vintage.{VintageMergeBuilder, VintageTable}

/** SQL `UPDATE` and `MERGE INTO` for vintage tables, via an injected
  * resolution rule that rewrites the resolved DML plans into commands
  * running the fluent copy-on-write executors — the same architecture
  * Delta Lake uses for its SQL DML. Register with:
  *
  * `spark.sql.extensions=graft.vintage.connector.VintageSqlExtension`
  *
  * The rule fires only for fully-resolved plans whose target resolves
  * through [[VintageCatalog]] to a [[VintageSqlTable]]; everything else
  * is left to Spark (so the extension is safe to install globally).
  */
class VintageSqlExtension extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectResolutionRule(session => VintageDmlRule(session))
    // maintenance statements (OPTIMIZE / VACUUM / RESTORE / DESCRIBE
    // HISTORY) are not Spark grammar — a delegating parser adds them
    ext.injectParser((session, delegate) =>
      new VintageMaintenanceParser(session, delegate))
    VintageFunctions.registrations.foreach(ext.injectFunction)
  }
}

/** SQL registrations for the engine's codegen'd expressions, so the
  * pipeline primitives compose from plain SQL:
  *
  * {{{
  * SELECT cosine_similarity(a.embedding, b.embedding) FROM …
  * SELECT hyperplane_sketch(embedding, 8, 0) AS bucket FROM …
  * SELECT minhash_signature(shingles, 128) FROM …
  * }}}
  */
object VintageFunctions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
  import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, IntegerLiteral}

  private def intArg(e: Expression, what: String): Int = e match {
    case IntegerLiteral(v) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  val registrations: Seq[(FunctionIdentifier, ExpressionInfo, FunctionBuilder)] = Seq(
    (FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[graft.functions.CosineSimilarity].getName,
        "cosine_similarity"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "cosine_similarity(vec, vec)")
        graft.functions.CosineSimilarity(args(0), args(1))
      }),
    (FunctionIdentifier("hyperplane_sketch"),
      new ExpressionInfo(classOf[graft.functions.HyperplaneSketch].getName,
        "hyperplane_sketch"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "hyperplane_sketch(vec, planes, salt)")
        graft.functions.HyperplaneSketch(args(0),
          intArg(args(1), "planes"), intArg(args(2), "salt"))
      }),
    (FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[graft.functions.MinHashSignature].getName,
        "minhash_signature"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "minhash_signature(shingles, numHashes)")
        graft.functions.MinHashSignature(args(0), intArg(args(1), "numHashes"))
      }),
    (FunctionIdentifier("quantize8"),
      new ExpressionInfo(classOf[graft.functions.Quantize8].getName,
        "quantize8"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "quantize8(vec)")
        graft.functions.Quantize8(args(0))
      }))
}

case class VintageDmlRule(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case u @ UpdateTable(target, assignments, condition)
        if u.resolved && vintagePath(target).isDefined =>
      VintageUpdateCommand(vintagePath(target).get,
        assignments.map(a => nameOf(a.key) -> ExprWrap(unresolve(a.value))),
        condition.map(c => ExprWrap(unresolve(c))))

    case m @ MergeIntoTable(target, source, cond, matched, notMatched,
          notMatchedBySource, withSchemaEvolution)
        if m.resolved && vintagePath(target).isDefined =>
      if (notMatchedBySource.nonEmpty)
        throw new UnsupportedOperationException(
          "WHEN NOT MATCHED BY SOURCE is not supported for vintage tables yet")
      val tAttrs = target.outputSet
      val sAttrs = source.outputSet
      def sided(e: Expression): ExprWrap = ExprWrap(qualify(e, tAttrs, sAttrs))
      def convertActions(as: Seq[MergeAction]): Seq[VintageMergeClause] = as.map {
        case UpdateStarAction(c) => VintageMergeClause("updateAll", c.map(sided), Nil)
        case a: UpdateAction if a.fromStar =>
          VintageMergeClause("updateAll", a.condition.map(sided), Nil)
        case a: UpdateAction => VintageMergeClause("update", a.condition.map(sided),
          a.assignments.map(x => nameOf(x.key) -> sided(x.value)))
        case DeleteAction(c) => VintageMergeClause("delete", c.map(sided), Nil)
        case InsertStarAction(c) => VintageMergeClause("insertAll", c.map(sided), Nil)
        case a: InsertAction => VintageMergeClause("insert", a.condition.map(sided),
          a.assignments.map(x => nameOf(x.key) -> sided(x.value)))
        case other => throw new UnsupportedOperationException(
          s"merge action $other not supported for vintage tables")
      }
      VintageMergeCommand(vintagePath(target).get, source, sided(cond),
        convertActions(matched), convertActions(notMatched), withSchemaEvolution)

    case _ => plan
  }

  private def vintagePath(p: LogicalPlan): Option[String] = p.collectFirst {
    case r: DataSourceV2Relation if r.table.isInstanceOf[VintageSqlTable] =>
      r.table.asInstanceOf[VintageSqlTable].tablePath
  }

  private def nameOf(key: Expression): String = key match {
    case a: Attribute => a.name
    case u: UnresolvedAttribute => u.nameParts.last
    case other => throw new UnsupportedOperationException(
      s"unsupported assignment key: $other (nested fields not supported)")
  }

  /** Resolved AttributeReferences carry exprIds from the SQL plan; the
    * fluent executor re-reads the table as a fresh DataFrame, so map
    * them back to name-based unresolved refs (single-table: bare name).
    */
  private def unresolve(e: Expression): Expression = e.transform {
    case a: Attribute => UnresolvedAttribute(Seq(a.name))
  }

  /** Merge expressions reference both sides — qualify by alias so the
    * fluent merge join can tell them apart.
    */
  private def qualify(e: Expression, t: AttributeSet, s: AttributeSet): Expression =
    e.transform {
      case a: Attribute if t.contains(a) => UnresolvedAttribute(Seq("__t", a.name))
      case a: Attribute if s.contains(a) => UnresolvedAttribute(Seq("__s", a.name))
    }
}

/** Opaque expression holder: keeps rewritten (name-based, unresolved)
  * expressions out of the command's TreeNode.expressions so
  * CheckAnalysis does not re-validate them against the command plan.
  */
case class ExprWrap(expr: Expression)

case class VintageMergeClause(
    kind: String, condition: Option[ExprWrap], assigns: Seq[(String, ExprWrap)])

case class VintageUpdateCommand(
    path: String,
    assignments: Seq[(String, ExprWrap)],
    condition: Option[ExprWrap]) extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    val cond = condition.map(w => ColumnExpr.column(w.expr))
      .getOrElse(org.apache.spark.sql.functions.lit(true))
    VintageTable.forPath(spark, path)
      .update(cond, assignments.map { case (k, v) => k -> ColumnExpr.column(v.expr) }.toMap)
    Seq.empty
  }
}

case class VintageMergeCommand(
    path: String,
    sourcePlan: LogicalPlan,
    condition: ExprWrap,
    matched: Seq[VintageMergeClause],
    notMatched: Seq[VintageMergeClause],
    schemaEvolution: Boolean) extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(sourcePlan)

  override def run(spark: SparkSession): Seq[Row] = {
    val source = DatasetOps.ofRows(spark, sourcePlan).as("__s")
    val builder = VintageTable.forPath(spark, path).as("__t")
      .merge(source, ColumnExpr.column(condition.expr))

    def applyClause(b: VintageMergeBuilder, c: VintageMergeClause): VintageMergeBuilder = {
      val condCol = c.condition.map(w => ColumnExpr.column(w.expr))
      val assigns = c.assigns.map { case (k, v) => k -> ColumnExpr.column(v.expr) }.toMap
      c.kind match {
        case "updateAll" => condCol.fold(b.whenMatched())(b.whenMatched(_)).updateAll()
        case "update" => condCol.fold(b.whenMatched())(b.whenMatched(_)).update(assigns)
        case "delete" => condCol.fold(b.whenMatched())(b.whenMatched(_)).delete()
        case "insertAll" => condCol.fold(b.whenNotMatched())(b.whenNotMatched(_)).insertAll()
        case "insert" => condCol.fold(b.whenNotMatched())(b.whenNotMatched(_)).insert(assigns)
      }
    }
    val withClauses = (matched ++ notMatched).foldLeft(builder)(applyClause)

    val evoKey = "spark.vintage.schema.autoMerge.enabled"
    val prev = spark.conf.getOption(evoKey)
    if (schemaEvolution) spark.conf.set(evoKey, "true")
    try withClauses.execute()
    finally if (schemaEvolution) prev.fold(spark.conf.unset(evoKey))(spark.conf.set(evoKey, _))
    Seq.empty
  }
}
