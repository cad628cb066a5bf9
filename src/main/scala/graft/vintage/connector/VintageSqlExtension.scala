package graft.vintage.connector

import org.apache.spark.sql.SparkSessionExtensions

/** Session extension for vintage tables. SQL DML (`DELETE` /
  * `UPDATE` / `MERGE INTO`) needs NO extension rule: [[VintageSqlTable]]
  * implements `SupportsRowLevelOperations`, so Spark's own analyzer
  * rewrites plan them natively ([[VintageRowLevelOperation]]). What
  * remains here:
  *
  *  - maintenance statements (OPTIMIZE / VACUUM / RESTORE / DESCRIBE
  *    HISTORY) are not Spark grammar — a delegating parser adds them;
  *  - SQL registrations of the codegen'd pipeline expressions.
  *
  * Register with
  * `spark.sql.extensions=graft.vintage.connector.VintageSqlExtension`.
  */
class VintageSqlExtension extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectParser((session, delegate) =>
      new VintageMaintenanceParser(session, delegate))
    VintageFunctions.registrations.foreach(ext.injectFunction)
    ext.injectTableFunction(VintageTableFunctions.tableChanges)
  }
}

/** Table-valued functions. `table_changes` is Delta's batch
  * change-data-feed SQL surface:
  *
  * {{{
  * SELECT * FROM table_changes('cat.db.tbl', 2)        -- versions >= 2
  * SELECT * FROM table_changes('cat.db.tbl', 2, 5)     -- 2..5 inclusive
  * SELECT * FROM table_changes('/path/to/table', 0)    -- by path
  * }}}
  *
  * Rows carry every table column plus `_change_type` and
  * `_commit_version` — computed from the log like the DataFrame
  * option surface (`readChangeFeed`), not persisted change files.
  */
object VintageTableFunctions {
  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
  import org.apache.spark.sql.connector.catalog.Identifier

  private def strLit(e: Expression, what: String): String = e match {
    case Literal(v, org.apache.spark.sql.types.StringType) if v != null => v.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got $other")
  }

  private def longLit(e: Expression, what: String): Long = e match {
    case Literal(v: Int, _) => v.toLong
    case Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** Resolve a `table_changes` name argument to a table path: a string
    * containing `/` is a path; otherwise `[catalog.][ns.]table`
    * resolved against registered VintageCatalogs (current catalog when
    * unqualified).
    */
  private def resolvePath(spark: SparkSession, name: String): String = {
    if (name.contains("/")) return name
    val cm = spark.sessionState.catalogManager
    val parts = name.split('.')
    val (cat, rest) =
      if (parts.length > 1 && cm.isCatalogRegistered(parts.head))
        (cm.catalog(parts.head), parts.tail)
      else (cm.currentCatalog, parts)
    cat match {
      case v: VintageCatalog =>
        v.tablePath(Identifier.of(rest.init, rest.last))
      case other => throw new IllegalArgumentException(
        s"table_changes target $name resolves to non-vintage catalog " +
        s"${other.name()} — pass a path or a vintage catalog table")
    }
  }

  val tableChanges: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => LogicalPlan) = (
    FunctionIdentifier("table_changes"),
    new ExpressionInfo(VintageTableFunctions.getClass.getName, "table_changes"),
    (args: Seq[Expression]) => {
      require(args.length == 2 || args.length == 3,
        "table_changes(table, startingVersion[, endingVersion])")
      val spark = SparkSession.active
      val start = longLit(args(1), "startingVersion")
      val end = if (args.length == 3) longLit(args(2), "endingVersion") else -1L
      val path = resolvePath(spark, strLit(args(0), "table"))
      // TVF contract is INCLUSIVE start; changes() is exclusive-start
      graft.vintage.VintageTable.forPath(spark, path)
        .changes(start - 1L, end)
        .queryExecution.logical
    })
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
      }),
    (FunctionIdentifier("whitespace_tokens"),
      new ExpressionInfo(classOf[graft.functions.WhitespaceTokens].getName,
        "whitespace_tokens"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "whitespace_tokens(text)")
        graft.functions.WhitespaceTokens(args(0))
      }),
    (FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[graft.functions.SimHash64].getName,
        "simhash64"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "simhash64(text)")
        graft.functions.SimHash64(args(0))
      }))
}
