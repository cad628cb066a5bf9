package graft.vintage

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Multi-part checkpoints: a checkpoint whose action count exceeds
  * [[VintageLog.multiPartThreshold]] splits into
  * `v.checkpoint.<part>.<of>.parquet` files (Delta's multi-part
  * naming) with `_last_checkpoint` recording the part count. Parts
  * bound the size of any single metadata file and let parallel readers
  * fan out; the reader contract keeps ALL non-add actions in part 1 so
  * a spilled load gets metadata without touching add-row parts.
  */
class MultiPartCheckpointSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def newDir(): String =
    Files.createTempDirectory("vintage-multipart").toString + "/t"

  private def withThresholds[A](spill: Long, multiPart: Long)(body: => A): A = {
    val (ps, pm) = (VintageLog.spillThreshold, VintageLog.multiPartThreshold)
    VintageLog.spillThreshold = spill
    VintageLog.multiPartThreshold = multiPart
    try body
    finally {
      VintageLog.spillThreshold = ps
      VintageLog.multiPartThreshold = pm
      VintageLog.clearSnapshotCache()
    }
  }

  /** v0 create (8 files) + 10 appends (8 files each) = 88 files,
    * checkpoint at v10 — same shape as SnapshotSpillSpec's builder.
    */
  private def buildManyFiles(dir: String,
      props: Map[String, String] = Map.empty): VintageTable = {
    val t = VintageTable.create(spark, dir,
      (0 until 64).map(i => (i.toLong, s"v$i")).toDF("k", "v")
        .repartition(8), props)
    (1 to 10).foreach { c =>
      t.append((0 until 8).map(i => (c * 1000L + i, s"a$c"))
        .toDF("k", "v").repartition(8))
    }
    t
  }

  private def partFiles(dir: String): Seq[String] = {
    val log = new java.io.File(dir, VintageLog.LogDirName)
    log.listFiles().map(_.getName).toSeq
      .filter(_.matches("""\d{20}\.checkpoint\.\d{10}\.\d{10}\.parquet"""))
      .sorted
  }

  test("oversized checkpoint splits into named parts and replays exactly") {
    // In-memory (non-spilled) path: 88 adds + meta > 30 → chunked parts.
    withThresholds(spill = 1000000, multiPart = 30) {
      val dir = newDir()
      val t = buildManyFiles(dir)
      val parts = partFiles(dir)
      assert(parts.size >= 3,
        s"88 adds at threshold 30 must split into >=3 parts, got $parts")
      val of = parts.head.split("\\.")(3).toInt
      assert(parts.size == of && parts.last.split("\\.")(2).toInt == of,
        s"part set must be 1..of with matching `of` field: $parts")
      // _last_checkpoint manifest records the part count
      val lastCp = java.nio.file.Files.readString(
        java.nio.file.Paths.get(dir, VintageLog.LogDirName, "_last_checkpoint"))
      assert(lastCp.contains(s""""parts":$of"""), s"manifest: $lastCp")

      // replay-from-parts equals a from-scratch commit replay
      VintageLog.clearSnapshotCache()
      val snap = t.snapshot
      assert(snap.version == 10L)
      assert(spark.read.format("vintage").load(dir).count() == 64 + 80)
      assert(spark.read.format("vintage").load(dir)
        .filter(col("k") === 3000L).count() == 1)
      // time travel to before the checkpoint still replays commits
      assert(spark.read.format("vintage").option("versionAsOf", 0)
        .load(dir).count() == 64)
    }
  }

  test("spilled snapshot over multi-part checkpoint prunes and streams") {
    // Both tiers at once: the v10 checkpoint splits into parts AND the
    // snapshot serves a spilled index over those parts.
    withThresholds(spill = 60, multiPart = 40) {
      val dir = newDir()
      val t = buildManyFiles(dir)
      assert(partFiles(dir).size >= 2, "checkpoint must be multi-part")
      VintageLog.clearSnapshotCache()
      val before = SnapshotSpill.materializations.get()
      SnapshotSpill.traceMaterializations = true
      try {
        val snap = t.snapshot
        assert(snap.spilled.isDefined,
          "88-file multi-part checkpoint must spill at threshold 60")
        assert(snap.spilled.get.checkpointPaths.size >= 2,
          "spilled index must track every checkpoint part")

        // distributed stats pruning fans out over ALL parts — a file
        // from the middle of the add range must still be findable
        val cands = t.candidateFiles(snap, col("k") === 7003L)
        assert(cands.nonEmpty && cands.size < 88,
          s"pruning across parts must narrow the candidates, got ${cands.size}")
        assert(spark.read.format("vintage").load(dir)
          .filter(col("k") === 7003L).count() == 1)

        // the NEXT checkpoint streams from all previous parts: 10 more
        // commits cross v20; content must survive the part-to-part copy
        (11 to 20).foreach { c =>
          t.append(Seq((c * 1000L, s"b$c")).toDF("k", "v").coalesce(1))
        }
        assert(SnapshotSpill.materializations.get() == before,
          "multi-part streamed checkpoint must not materialize the list")
      } finally SnapshotSpill.traceMaterializations = false
      // full reads are the compatibility tier — ALLOWED to materialize
      VintageLog.clearSnapshotCache()
      val snap2 = t.snapshot
      assert(snap2.version == 20L && snap2.spilled.isDefined)
      assert(spark.read.format("vintage").load(dir).count() == 64 + 80 + 10)
      assert(spark.read.format("vintage").load(dir)
        .filter(col("k") === 15000L).count() == 1)
    }
  }

  test("multi-part replay equals single-part replay row-for-row") {
    val dirSingle = newDir()
    val dirMulti = newDir()
    def rows(dir: String): Seq[String] =
      spark.read.format("vintage").load(dir)
        .orderBy("k", "v").collect().map(_.toString).toSeq
    val single = { buildManyFiles(dirSingle); rows(dirSingle) }
    val multi = withThresholds(spill = 1000000, multiPart = 25) {
      buildManyFiles(dirMulti)
      VintageLog.clearSnapshotCache()
      rows(dirMulti)
    }
    assert(partFiles(dirSingle).isEmpty && partFiles(dirMulti).nonEmpty)
    assert(multi == single,
      "part split is a physical layout choice; logical content must be identical")
  }
}
