package graft.vintage

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Fluent `whenNotMatchedBySource` (Delta's third merge clause
  * family): target rows without a source match can be deleted or
  * updated — the sync idiom. The SQL `MERGE … WHEN NOT MATCHED BY
  * SOURCE` native path is covered in SqlCatalogSpec; this pins the
  * fluent builder's semantics, clause precedence, and file-granular
  * pruning.
  */
class MergeBySourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def newDir(): String =
    Files.createTempDirectory("vintage-mbs").toString + "/t"

  test("full sync: update matched, insert new, delete unmatched") {
    val dir = newDir()
    val t = VintageTable.create(spark, dir,
      Seq(("a", 1), ("b", 2), ("c", 3), ("d", 4)).toDF("k", "v"))
    t.as("t")
      .merge(Seq(("b", 20), ("c", 30), ("f", 6)).toDF("k", "v").as("s"),
        "t.k = s.k")
      .whenMatched().updateAll()
      .whenNotMatched().insertAll()
      .whenNotMatchedBySource().delete()
      .execute()
    val m = t.toDF.as[(String, Int)].collect().toMap
    assert(m == Map("b" -> 20, "c" -> 30, "f" -> 6),
      s"table must mirror the source exactly after a full sync, got $m")
  }

  test("conditional by-source update downgrades only qualifying rows") {
    val dir = newDir()
    val t = VintageTable.create(spark, dir,
      Seq(("a", 1, "live"), ("b", 2, "live"), ("c", 3, "live"))
        .toDF("k", "v", "status"))
    t.as("t")
      .merge(Seq(("b", 20)).toDF("k", "v").as("s"), "t.k = s.k")
      .whenMatched().update(Map("v" -> col("s.v")))
      .whenNotMatchedBySource("t.v >= 3")
      .update(Map("status" -> lit("stale")))
      .execute()
    val rows = t.toDF.as[(String, Int, String)].collect().sortBy(_._1).toSeq
    assert(rows == Seq(("a", 1, "live"), ("b", 20, "live"), ("c", 3, "stale")),
      s"only unmatched rows with v>=3 downgrade, got $rows")
  }

  test("first matching by-source clause wins") {
    val dir = newDir()
    val t = VintageTable.create(spark, dir,
      Seq(("a", 1), ("b", 5)).toDF("k", "v"))
    t.as("t")
      .merge(Seq(("zz", 0)).toDF("k", "v").as("s"), "t.k = s.k")
      .whenNotMatchedBySource("t.v >= 5").update(Map("v" -> lit(100)))
      .whenNotMatchedBySource().update(Map("v" -> lit(-1)))
      .execute()
    val m = t.toDF.as[(String, Int)].collect().toMap
    assert(m == Map("a" -> -1, "b" -> 100),
      s"b hits the first clause, a falls to the catch-all, got $m")
  }

  test("by-source condition referencing the source alias is rejected") {
    val dir = newDir()
    val t = VintageTable.create(spark, dir, Seq(("a", 1)).toDF("k", "v"))
    val e = intercept[IllegalArgumentException] {
      t.as("t")
        .merge(Seq(("a", 2)).toDF("k", "v").as("s"), "t.k = s.k")
        .whenNotMatchedBySource("s.v > 0").delete()
        .execute()
    }
    assert(e.getMessage.contains("source alias"), e.getMessage)
  }

  test("conditional by-source prunes files by stats; unconditional reads all") {
    val dir = newDir()
    // 4 files with disjoint k ranges (range partition + sort)
    val t = VintageTable.create(spark, dir,
      (0L until 80L).map(i => (i, s"v$i")).toDF("k", "v")
        .repartitionByRange(4, col("k")).sortWithinPartitions("k"))
    assert(t.snapshot.files.size == 4)
    // source matches nothing → only by-source file selection applies
    t.as("t")
      .merge(Seq((9999L, "x")).toDF("k", "v").as("s"), "t.k = s.k")
      .whenNotMatchedBySource("t.k >= 70").delete()
      .execute()
    assert(t.toDF.count() == 70)
    val lastCommit = VintageLog.readVersion(dir, t.version)
    val removed = lastCommit.collect { case r: RemoveFile => r.path }
    assert(removed.size < 4,
      s"stats pruning must keep low-range files untouched, rewrote $removed")

    // unconditional delete-all-unmatched empties the table (no matches)
    t.as("t")
      .merge(Seq((9999L, "x")).toDF("k", "v").as("s"), "t.k = s.k")
      .whenNotMatchedBySource().delete()
      .execute()
    assert(t.toDF.count() == 0)
  }

  test("row-tracked table: kept and updated unmatched rows keep their ids") {
    val dir = newDir()
    val t = VintageTable.create(spark, dir,
      Seq(("a", 1), ("b", 2), ("c", 3)).toDF("k", "v"),
      properties = Map(RowTracking.EnabledProp -> "true"))
    val before = t.toDFWithRowIds.select("k", "_row_id")
      .as[(String, Long)].collect().toMap
    t.as("t")
      .merge(Seq(("a", 10)).toDF("k", "v").as("s"), "t.k = s.k")
      .whenMatched().updateAll()
      .whenNotMatchedBySource("t.k = 'b'").update(Map("v" -> lit(200)))
      .execute()
    val after = t.toDFWithRowIds.select("k", "_row_id")
      .as[(String, Long)].collect().toMap
    assert(after == before,
      s"row ids must survive by-source updates: $before -> $after")
    val m = t.toDF.as[(String, Int)].collect().toMap
    assert(m == Map("a" -> 10, "b" -> 200, "c" -> 3))
  }
}
