package graft.vintage

import org.apache.spark.sql.types.StructType

/** Hash-bucketed vintage tables — the shuffle-free-join layout.
  *
  * A table created with
  * `vintage.bucketing.columns = "k"` and `vintage.bucketing.buckets = "8"`
  * has every data file pinned to one of 8 hash buckets of `k`:
  * [[VintageTable.writeFiles]] repartitions each write by Spark's own
  * `HashPartitioning` (so the task partition index IS the bucket id —
  * the identical `pmod(murmur3(k), n)` Spark's planner assumes for
  * bucketed relations) and names the file with the `_NNNNN` suffix
  * `BucketingUtils` parses. The read path then declares a `BucketSpec`
  * on its `HadoopFsRelation`, and Spark plans joins/aggregations on
  * the bucket columns WITHOUT an Exchange on the table's side — at
  * 100 TB this converts every fact⋈fact join on the bucket key from
  * two full shuffles into zero.
  *
  * Invariants:
  *  - Bucketing is fixed at CREATE (see [[VintageTable.setProperties]]):
  *    flipping it on later would claim a layout the existing files
  *    don't have.
  *  - EVERY write path funnels through [[VintageTable.writeFiles]],
  *    which re-buckets unconditionally — appends, overwrites, MERGE /
  *    UPDATE / DELETE copy-on-write rewrites, and compaction all emit
  *    bucket-aligned files (an UPDATE that changes a bucket column
  *    simply re-buckets the row). Z-order clustering degrades to
  *    bucket-partitioned layout (the bucket hash overrides the range
  *    partitioning; correctness unaffected).
  *  - The `bucketing` WRITER feature gates foreign writers that would
  *    break the alignment; readers ignoring the layout stay correct.
  *  - The DSv2 native-SQL paths re-bucket too: INSERT/CTAS and the
  *    row-level WriteDelta (UPDATE/MERGE) request a clustered
  *    distribution on the bucket columns with exactly numBuckets
  *    partitions, so their task partition index is the bucket id.
  *    Only the STREAMING sink refuses (epochs honor no distribution
  *    requirement).
  *  - While a row-level op's deletion vectors are outstanding, reads
  *    go through the DV merge-on-read relation, which does not claim
  *    the BucketSpec — joins shuffle again until OPTIMIZE purges the
  *    DVs (the layout itself stays aligned throughout).
  */
object Bucketing {

  val ColumnsProp = "vintage.bucketing.columns"
  val BucketsProp = "vintage.bucketing.buckets"
  val SortProp = "vintage.bucketing.sortColumns"

  /** (bucket columns, bucket count) when the table is bucketed. */
  def spec(properties: Map[String, String]): Option[(Seq[String], Int)] =
    properties.get(ColumnsProp).map { cs =>
      val cols = cs.split(',').map(_.trim).filter(_.nonEmpty).toSeq
      val n = properties.getOrElse(BucketsProp,
        throw new IllegalArgumentException(
          s"$ColumnsProp is set but $BucketsProp is not")).toInt
      require(cols.nonEmpty, s"$ColumnsProp must name at least one column")
      require(n > 0, s"$BucketsProp must be positive, got $n")
      (cols, n)
    }

  /** In-bucket sort columns (optional): files are written sorted by
    * these within each bucket and the read-side BucketSpec declares
    * them — a merge join on a freshly written (one-file-per-bucket)
    * table then needs neither Exchange NOR Sort. After appends a
    * bucket holds several files and Spark correctly stops claiming
    * the ordering (compaction restores it).
    */
  def sortCols(properties: Map[String, String]): Seq[String] =
    properties.get(SortProp).toSeq
      .flatMap(_.split(',').map(_.trim).filter(_.nonEmpty))

  /** Create-time validation: columns exist and are not partition
    * columns (a hive-partitioned column never reaches the data files,
    * so it cannot carry a file-level bucket hash).
    */
  def validate(properties: Map[String, String], schema: StructType,
      partitionBy: Seq[String]): Unit = {
    spec(properties).foreach { case (cols, _) =>
      cols.foreach { c =>
        require(schema.fieldNames.exists(_.equalsIgnoreCase(c)),
          s"bucketing column '$c' not in schema ${schema.fieldNames.mkString(", ")}")
        require(!partitionBy.exists(_.equalsIgnoreCase(c)),
          s"bucketing column '$c' cannot also be a partition column")
      }
    }
    val sorts = sortCols(properties)
    require(sorts.isEmpty || spec(properties).isDefined,
      s"$SortProp requires $ColumnsProp/$BucketsProp")
    sorts.foreach(c => require(schema.fieldNames.exists(_.equalsIgnoreCase(c)),
      s"bucket sort column '$c' not in schema"))
  }

  private val StagedName = """part-(\d+)-.*""".r

  /** Task partition index out of a staged `part-NNNNN-uuid…` name —
    * under bucket repartitioning this IS the bucket id.
    */
  def stagedTaskId(name: String): Option[Int] = name match {
    case StagedName(id) => Some(id.toInt)
    case _ => None
  }

  private val CommittedName = """.*_(\d+)(?:\..*)?$""".r

  /** Bucket id of a committed file name (the same pattern Spark's
    * `BucketingUtils.getBucketId` applies on the scan side).
    */
  def bucketId(name: String): Option[Int] = name match {
    case CommittedName(id) => Some(id.toInt)
    case _ => None
  }
}
