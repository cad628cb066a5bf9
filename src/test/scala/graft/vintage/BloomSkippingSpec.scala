package graft.vintage

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** LOG-level per-file bloom stats: with `vintage.bloom.columns` set,
  * every written file carries a per-column bloom in its AddFile stats,
  * and candidateFiles prunes point lookups that min/max ranges cannot
  * (interleaved keys make every file's range span the whole domain).
  */
class BloomSkippingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Two files with fully OVERLAPPING id/name ranges but disjoint
    * values: file A holds odd ids, file B even — range stats alone can
    * never tell them apart.
    */
  private def interleavedTable(): VintageTable = {
    val dir = Files.createTempDirectory("vintage-bskip").toString + "/t"
    val odd = (1 to 199 by 2).map(i => (i.toLong, s"name_$i")).toDF("id", "name")
    val even = (2 to 200 by 2).map(i => (i.toLong, s"name_$i")).toDF("id", "name")
    val t = VintageTable.create(spark, dir, odd.coalesce(1),
      properties = Map("vintage.bloom.columns" -> "id,name"))
    t.append(even.coalesce(1))
    t
  }

  test("writes attach self-describing blooms to opted-in columns only") {
    val t = interleavedTable()
    val files = t.snapshot.files
    assert(files.size == 2)
    files.foreach { f =>
      assert(f.stats("id").bloom.exists(_.startsWith("1024:5:")),
        s"id bloom missing: ${f.stats("id")}")
      assert(f.stats("name").bloom.exists(_.startsWith("1024:5:")))
      // min/max still present alongside
      assert(f.stats("id").min.isDefined && f.stats("id").max.isDefined)
    }
  }

  test("point lookups prune files min/max cannot; never a false negative") {
    val t = interleavedTable()
    val snap = t.snapshot
    // ranges fully overlap: min/max alone keeps both files
    val byRangeOnly = snap.files.count { f =>
      val s = f.stats("id")
      BigDecimal(s.min.get) <= 77 && BigDecimal(s.max.get) >= 77
    }
    assert(byRangeOnly == 2)
    // bloom prunes to the single true file (chance of FP collision on
    // a 100-value/1024-bit filter is real but tiny; this fixture was
    // picked green — determinism makes it stable)
    assert(t.candidateFiles(snap, col("id") === 77L).size == 1)
    assert(t.candidateFiles(snap, col("name") === "name_78").size == 1)
    assert(t.candidateFiles(snap, expr("id = 78")).size == 1)
    // NO false negative: every present value must keep its file
    (1 to 200).foreach { i =>
      val c = t.candidateFiles(snap, col("id") === i.toLong)
      assert(c.nonEmpty, s"false negative for id=$i")
    }
    // IN with values from both files keeps both
    assert(t.candidateFiles(snap, col("id").isin(77L, 78L)).size == 2)
  }

  test("non-matching renderings decline soundly; DML sees pruned sets") {
    val t = interleavedTable()
    val snap = t.snapshot
    // a fractional double literal against a long column must not
    // bloom-prune ("77.5" was never the writer's rendering of any
    // value) — renderLiteral declines, both files stay candidates
    assert(t.candidateFiles(snap, col("id") === 77.5).size == 2)
    // conditional delete only rewrites the bloom-pruned file
    t.delete("name = 'name_77'")
    assert(t.toDF.count() == 199)
    assert(t.toDF.filter($"name" === "name_78").count() == 1)
  }

  test("blooms survive the JSON log roundtrip and checkpoint replay") {
    val t = interleavedTable()
    val f = t.snapshot.files.head
    val line = Action.toJsonLine(f)
    Action.fromJsonLine(line) match {
      case a: AddFile =>
        assert(a.stats("id").bloom == f.stats("id").bloom)
        assert(a.stats("name").bloom == f.stats("name").bloom)
      case other => fail(s"roundtrip produced $other")
    }
    // cross the checkpoint interval (10 commits), then prune from a
    // FRESH handle whose snapshot replays checkpoint + tail — blooms
    // must survive the parquet checkpoint encode/decode
    (0 until 9).foreach { j =>
      t.append(Seq((1000L + j, s"extra_$j")).toDF("id", "name"))
    }
    val t2 = VintageTable.forPath(spark, t.path)
    assert(t2.candidateFiles(t2.snapshot, col("id") === 77L).size == 1,
      "bloom pruning must survive checkpoint replay")
    assert(t2.candidateFiles(t2.snapshot, col("name") === "extra_3").size == 1)
  }

  test("compaction rewrites blooms for the merged files") {
    val t = interleavedTable()
    t.compact(1)
    val files = t.snapshot.files.filter(_.numRecords.exists(_ > 0))
    assert(files.size == 1, s"expected one compacted file, got ${files.size}")
    assert(files.head.stats("id").bloom.isDefined,
      "compacted file must carry a fresh bloom")
    // the merged file contains everything: no value may be pruned away
    val snap = t.snapshot
    (1 to 200).foreach { i =>
      assert(t.candidateFiles(snap, col("id") === i.toLong).nonEmpty,
        s"false negative after compaction for id=$i")
    }
  }

  test("native SQL INSERT path writes log blooms too") {
    val s = spark
    s.conf.set("spark.sql.catalog.vbs", "graft.vintage.connector.VintageCatalog")
    s.conf.set("spark.sql.catalog.vbs.warehouse",
      Files.createTempDirectory("vintage-bskip-wh").toString)
    spark.sql("CREATE TABLE vbs.bt (id BIGINT, name STRING) " +
      "TBLPROPERTIES ('vintage.bloom.columns' = 'name')")
    spark.sql("INSERT INTO vbs.bt SELECT id, concat('n', id) FROM range(100)")
    val t = VintageTable.forPath(spark,
      spark.conf.get("spark.sql.catalog.vbs.warehouse") + "/bt")
    val files = t.snapshot.files.filter(_.numRecords.exists(_ > 0))
    assert(files.nonEmpty)
    files.foreach { f =>
      assert(f.stats("name").bloom.isDefined, s"no log bloom: ${f.stats}")
      assert(f.stats("id").bloom.isEmpty, "unconfigured column got a bloom")
    }
  }
}
