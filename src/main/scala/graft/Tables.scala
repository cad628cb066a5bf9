package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish parquet tables
  * (TESTDATA.md): region nation customer supplier part orders lineitem
  * events documents embeddings — one parquet per table under the
  * scale-factor dir.
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, d: String): DataFrame  = load(spark, d, "lineitem")
  def orders(spark: SparkSession, d: String): DataFrame    = load(spark, d, "orders")
  def customer(spark: SparkSession, d: String): DataFrame  = load(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame  = load(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame      = load(spark, d, "part")
  def nation(spark: SparkSession, d: String): DataFrame    = load(spark, d, "nation")
  def region(spark: SparkSession, d: String): DataFrame    = load(spark, d, "region")
  /** The events table's `ts` column has shipped under several physical
    * Parquet encodings across testdata generations — INT64
    * TIMESTAMP(NANOS), TIMESTAMP(MICROS, isAdjustedToUTC=false), and a
    * plain UTC timestamp. Adapt to whatever is observed instead of
    * hard-coding one encoding; the result is always a session-zone
    * (UTC) microsecond TIMESTAMP, matching what DuckDB's oracle sees.
    */
  def events(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val raw =
      try load(spark, d, "events")
      catch {
        // Spark refuses INT64 TIMESTAMP(NANOS) outright ("Illegal
        // Parquet type") unless told to surface it as a plain long.
        // Only this branch needs the legacy conf; nothing else mutates
        // session state.
        case e: Exception if msgChain(e).exists(_.contains("NANOS")) =>
          spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          load(spark, d, "events")
      }
    raw.schema("ts").dataType match {
      case LongType => // nanos-as-long: truncate ns → µs like DuckDB does
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => // wall-clock micros; UTC session makes this exact
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => raw
      case other =>
        throw new IllegalStateException(
          s"$d/events.parquet: column `ts` has unsupported type $other; " +
            "expected TIMESTAMP, TIMESTAMP_NTZ, or INT64 (nanos-as-long)")
    }
  }

  private def msgChain(e: Throwable): Iterator[String] =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8)
      .map(t => Option(t.getMessage).getOrElse(""))
  def documents(spark: SparkSession, d: String): DataFrame = load(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = load(spark, d, "embeddings")
}
