package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.sources.BaseRelation

/** Bridge for DSv1 streaming sources: `getBatch` must return a
  * DataFrame whose logical plan is tagged `isStreaming = true` (the
  * same construction Spark's own FileStreamSource uses), which requires
  * the private[sql] `LogicalRelation` factory.
  */
object StreamingOps {
  def ofRowsStreaming(spark: SparkSession, relation: BaseRelation): DataFrame =
    DatasetOps.ofRows(spark, LogicalRelation(relation, isStreaming = true))
}
