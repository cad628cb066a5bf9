package graft.vintage

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{Metadata => FieldMetadata, MetadataBuilder, StructField, StructType}

/** Generated columns, Delta-style: `g GENERATED ALWAYS AS (expr)` in
  * SQL DDL (via `TableCatalogCapability
  * .SUPPORTS_CREATE_TABLE_WITH_GENERATED_COLUMNS`), stored as table
  * properties (`vintage.generated.<col> = <sql expr>`).
  *
  * Enforcement contract (stricter than Delta, never silently wrong):
  *
  *  - INGEST COMPUTES: the fluent create/append/overwrite paths add a
  *    missing generated column from its expression, so pipelines write
  *    the base columns and the derived one appears.
  *  - EVERY WRITE VALIDATES: table creation also installs a CHECK
  *    constraint `<col> <=> (<expr>)` (null-safe equality), and CHECK
  *    constraints are enforced inline on every data-changing write on
  *    both write paths — so an UPDATE/MERGE/INSERT that supplies an
  *    INCONSISTENT value fails with a named constraint error instead
  *    of quietly corrupting the derivation. (Delta recomputes in some
  *    DML paths; here a write that changes a base column must set the
  *    generated column too — the constraint message says which.)
  */
object GeneratedColumns {

  val Prefix = "vintage.generated."

  /** Constraint-name prefix of the consistency checks. */
  val ConstraintTag = "_gen_"

  /** (col -> generation expression SQL) of every generated column. */
  def fromProperties(props: Map[String, String]): Map[String, String] =
    props.collect {
      case (k, v) if k.startsWith(Prefix) => k.stripPrefix(Prefix) -> v
    }

  /** Extract SQL-DDL generation expressions (Spark puts them in field
    * metadata under `GeneratedColumn.GENERATION_EXPRESSION_METADATA_KEY`)
    * and return the schema with that metadata stripped — the log
    * stores the expressions as table properties, not field metadata.
    */
  def fromCreateSchema(schema: StructType): (StructType, Map[String, String]) = {
    val gen = org.apache.spark.sql.catalyst.util.GeneratedColumn
    val exprs = scala.collection.mutable.Map[String, String]()
    val stripped = StructType(schema.fields.map { f =>
      gen.getGenerationExpression(f) match {
        case Some(e) =>
          exprs(f.name) = e
          f.copy(metadata = dropKey(f.metadata, gen.GENERATION_EXPRESSION_METADATA_KEY))
        case None => f
      }
    })
    (stripped, exprs.toMap)
  }

  private def dropKey(m: FieldMetadata, key: String): FieldMetadata = {
    val b = new MetadataBuilder().withMetadata(m)
    b.remove(key)
    b.build()
  }

  /** The table properties recording `gen` plus its consistency CHECK
    * constraints.
    */
  def properties(gen: Map[String, String]): Map[String, String] =
    gen.flatMap { case (c, e) =>
      Seq(s"$Prefix$c" -> e,
        s"${Constraints.Prefix}$ConstraintTag$c" -> s"$c <=> ($e)")
    }

  /** Add each generated column MISSING from `df` by computing its
    * expression (ingest-side completion). Present columns pass through
    * untouched — the consistency constraint validates them.
    */
  def complete(df: DataFrame, props: Map[String, String],
      tableSchema: Option[StructType] = None): DataFrame = {
    val gen = fromProperties(props)
    if (gen.isEmpty) return df
    gen.foldLeft(df) { case (d, (c, e)) =>
      if (d.columns.exists(_.equalsIgnoreCase(c))) d
      else {
        val computed = expr(e)
        val typed = tableSchema.flatMap(_.fields.find(_.name.equalsIgnoreCase(c)))
          .map(f => computed.cast(f.dataType)).getOrElse(computed)
        d.withColumn(c, typed)
      }
    }
  }
}
