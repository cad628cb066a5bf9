package graft.vintage

import org.apache.spark.sql.types._

/** Safe widening type changes for `ALTER TABLE … ALTER COLUMN … TYPE`
  * (Delta's type-widening feature): metadata-only — files written
  * under the narrow type stay as they are, and Spark's parquet readers
  * promote at scan time (int32→int64, float→double, decimal precision
  * growth; SPARK-40876). Only changes that every reader can promote
  * losslessly are admitted; anything else needs a rewrite and is
  * rejected at DDL time.
  */
object TypeWidening {

  def widens(from: DataType, to: DataType): Boolean = (from, to) match {
    case (a, b) if a == b => false // not a change
    case (ByteType, ShortType | IntegerType | LongType) => true
    case (ShortType, IntegerType | LongType) => true
    case (IntegerType, LongType) => true
    case (FloatType, DoubleType) => true
    case (a: DecimalType, b: DecimalType) =>
      // same scale, more precision: every old value fits exactly
      a.scale == b.scale && b.precision > a.precision
    case _ => false
  }
}
