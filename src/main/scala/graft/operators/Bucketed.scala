package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (hash-clustered) tables — Spark's mechanism for
  * PRE-SHUFFLED storage: rows are hash-partitioned into a fixed bucket
  * count by a clustering key AT WRITE TIME, so every later equi-join or
  * aggregation on that key reads co-located data and plans with ZERO
  * Exchange on the bucketed side. At 100 TB this converts the nightly
  * fact⋈dim recompute from "shuffle 100 TB, every night" into a local
  * merge per bucket — the single biggest repeatable-shuffle saving the
  * engine offers, provided both sides agree on (key, bucket count).
  *
  * Spark only honours bucket metadata through the catalog
  * (`saveAsTable`), not bare-path parquet — so these helpers speak
  * table names, with a caller-owned database for placement.
  */
object Bucketed {

  /** Write `df` as a bucketed, per-bucket-sorted managed parquet
    * table. One file per bucket per writing task wave; the `sortBy`
    * lets sort-merge joins skip their sort when files-per-bucket is 1.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.format("parquet").mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  /** Equi-join two bucketed tables on their clustering keys. With
    * matching bucket counts Spark plans this with no Exchange on
    * either side (asserted in BucketedSpec).
    */
  def cojoin(spark: SparkSession, leftTable: String, rightTable: String,
      leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
