package graft.sdmx

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SDMX-shaped statistical-data helpers: the declared submission schema
  * and key construction, per /root/reference/README.md:44-80.
  */
object Sdmx {

  /** Submission schema as declared at README.md:45-59 (six string
    * dimensions, a double measure, five attributes + integer DECIMALS).
    */
  val schema: StructType = StructType(Seq(
    StructField("FREQ", StringType, nullable = false),
    StructField("CURRENCY", StringType, nullable = false),
    StructField("CURRENCY_DENOM", StringType, nullable = false),
    StructField("EXR_TYPE", StringType, nullable = false),
    StructField("EXR_SUFFIX", StringType, nullable = false),
    StructField("TIME_PERIOD", StringType, nullable = false),
    StructField("OBS_VALUE", DoubleType, nullable = false),
    StructField("OBS_STATUS", StringType, nullable = false),
    StructField("COLLECTION", StringType, nullable = false),
    StructField("DECIMALS", IntegerType, nullable = false),
    StructField("TITLE", StringType, nullable = false),
    StructField("UNIT", StringType, nullable = false),
    StructField("UNIT_MULT", StringType, nullable = false)))

  /** Evolved schema with the OBS_COM comment attribute
    * (README.md:336-352; ordered after OBS_STATUS as in schema2).
    */
  val schemaEvolved: StructType = StructType(
    schema.fields.flatMap { f =>
      if (f.name == "OBS_STATUS")
        Seq(f, StructField("OBS_COM", StringType, nullable = false))
      else Seq(f)
    })

  val dimensions: Seq[String] =
    Seq("FREQ", "CURRENCY", "CURRENCY_DENOM", "EXR_TYPE", "EXR_SUFFIX", "TIME_PERIOD")

  /** Series key: `:`-joined dimensions (README.md:73-79), e.g.
    * `M:NOK:EUR:SP00:A:1999-01`.
    */
  def withKey(df: DataFrame): DataFrame =
    df.withColumn("KEY", concat_ws(":", dimensions.map(col): _*))

  /** Read one submission CSV with the declared (not inferred) schema
    * and derive KEY (README.md:67-79).
    */
  def readSubmission(spark: SparkSession, path: String,
                     evolved: Boolean = false): DataFrame =
    withKey(spark.read.format("csv")
      .option("header", "true")
      .schema(if (evolved) schemaEvolved else schema)
      .load(path))
}
