package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.vintage.{RowTracking, VintageTable}

/** Driver-gate query for the STREAMING surface: a vintage-to-vintage
  * Structured Streaming pipeline whose exactly-once guarantees and
  * downstream CDF classification are hash-pinned against a DuckDB
  * replay of the equivalent batch state.
  *
  * Choreography:
  *  1. source table = nation `(name, rkey)` (v0);
  *  2. stream source → sink (fresh checkpoint), drain, STOP;
  *  3. append region rows (rkey offset +100) to the source, RESTART
  *     the stream from the same checkpoint, drain — only the new
  *     commit may land (a replayed batch would double the nation
  *     rows and break the hash);
  *  4. restart once more with nothing to read — the sink version must
  *     not advance (the per-epoch txn watermark), reported as a
  *     `meta` row the oracle expects to be exactly
  *     `noop_restart_delta=0`;
  *  5. fluent UPDATE on the ROW-TRACKED sink; the change feed of that
  *     one commit must classify as `update_preimage`/`update_postimage`
  *     via the stable row ids that survived the streaming writes.
  *
  * Everything hashed is deterministic: single-partition sorted writes,
  * no ids or versions in the output, names and keys only.
  */
object StreamQueries {

  def q48StreamExactlyOnce(spark: SparkSession, d: String): DataFrame = {
    val base = Files.createTempDirectory("graft-q48").toString
    val src = s"$base/src"
    val dst = s"$base/dst"
    val cp = s"$base/cp"

    val srcT = VintageTable.create(spark, src,
      Tables.nation(spark, d)
        .select(col("n_name").as("name"),
          col("n_regionkey").cast("long").as("rkey"), col("n_nationkey"))
        .repartition(1).sortWithinPartitions("n_nationkey")
        .drop("n_nationkey"))
    // the sink is pre-created EMPTY with row tracking on: ids are
    // assigned to the streamed rows at their epoch commits, which is
    // what lets step 5's update classify
    VintageTable.create(spark, dst, srcT.toDF.limit(0),
      properties = Map(RowTracking.EnabledProp -> "true"))

    def drainOnce(): Unit = {
      val q = spark.readStream.format("vintage").load(src)
        .writeStream.format("vintage")
        .option("path", dst).option("checkpointLocation", cp)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    drainOnce()                                  // nation snapshot epoch
    srcT.append(Tables.region(spark, d)
      .select(concat(lit("R_"), col("r_name")).as("name"),
        (col("r_regionkey").cast("long") + 100L).as("rkey"))
      .repartition(1).sortWithinPartitions("rkey"))
    drainOnce()                                  // region append epoch only
    val dstT = VintageTable.forPath(spark, dst)
    val vDrained = dstT.version
    drainOnce()                                  // nothing new: no commit
    val idleDelta = VintageTable.forPath(spark, dst).version - vDrained

    dstT.update(col("rkey") === 3L,
      Map("name" -> concat(col("name"), lit("_u"))))
    val chg = dstT.changes(vDrained + idleDelta)
      .select(lit("chg").as("part"),
        concat(col("name"), lit(":"), col("_change_type")).as("name"),
        col("rkey"))
    val state = dstT.toDF
      .select(lit("state").as("part"), col("name"), col("rkey"))
    val meta = spark.range(1)
      .select(lit("meta").as("part"),
        concat(lit("noop_restart_delta="), lit(idleDelta)).as("name"),
        lit(0L).as("rkey"))
    state.unionByName(chg).unionByName(meta)
      .orderBy("part", "name", "rkey")
  }

  /** DuckDB replay: the exactly-once stream lands each source row
    * exactly once, so the final state is just nation ∪ region with the
    * update applied; the one update commit's feed is its before and
    * after images of the rkey=3 rows; the idle restart must have
    * committed nothing.
    */
  val q48Sql: String =
    """WITH nat AS (
      |  SELECT n_name AS name, CAST(n_regionkey AS BIGINT) AS rkey FROM nation
      |),
      |reg AS (
      |  SELECT 'R_' || r_name AS name, CAST(r_regionkey AS BIGINT) + 100 AS rkey
      |  FROM region
      |),
      |allr AS (
      |  SELECT * FROM nat UNION ALL SELECT * FROM reg
      |),
      |st AS (
      |  SELECT CASE WHEN rkey = 3 THEN name || '_u' ELSE name END AS name, rkey
      |  FROM allr
      |)
      |SELECT part, name, rkey FROM (
      |  SELECT 'state' AS part, name, rkey FROM st
      |  UNION ALL
      |  SELECT 'chg', name || ':update_preimage', rkey FROM allr WHERE rkey = 3
      |  UNION ALL
      |  SELECT 'chg', name || ':update_postimage', rkey FROM st WHERE rkey = 3
      |  UNION ALL
      |  SELECT 'meta', 'noop_restart_delta=0', CAST(0 AS BIGINT)
      |) ORDER BY part, name, rkey""".stripMargin
}
