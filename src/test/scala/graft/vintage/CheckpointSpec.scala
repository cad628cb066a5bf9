package graft.vintage

import java.nio.file.Files

import org.apache.hadoop.fs.{Path => HPath}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The log must checkpoint every N commits so replay reads
  * checkpoint + tail, not O(versions) commit files.
  */
class CheckpointSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("replay after 25 commits reads checkpoint + tail only") {
    val dir = Files.createTempDirectory("vintage-cp").toString + "/t"
    val t = VintageTable.create(spark, dir, Seq((0, "v0")).toDF("id", "s").coalesce(1))
    (1 to 25).foreach { i =>
      t.append(Seq((i, s"v$i")).toDF("id", "s").coalesce(1))
    }
    assert(t.version == 25)
    val logDir = VintageLog.logDir(t.path)
    val store = LogStore.default
    assert(store.exists(new HPath(logDir, f"${10L}%020d.checkpoint.parquet")))
    assert(store.exists(new HPath(logDir, f"${20L}%020d.checkpoint.parquet")))
    assert(store.exists(new HPath(logDir, "_last_checkpoint")))
    // the checkpoint really is parquet, not renamed JSON
    val cpActions = VintageLog.readCheckpointActions(t.path, 20L)
    assert(cpActions.exists(_.isInstanceOf[Metadata]))
    assert(cpActions.count(_.isInstanceOf[AddFile]) == 21)

    // Hard proof that replay does not need the pre-checkpoint commits:
    // delete version files 0..19 — snapshot, history and time travel to
    // v>=20 must still work from checkpoint 20 + tail.
    (0L to 19L).foreach { v =>
      store.delete(new HPath(logDir, f"$v%020d.json"))
    }
    assert(t.toDF.count() == 26)
    assert(t.snapshot.commits.size == 26, "checkpoint must carry commit history")
    assert(t.toDFAsOf(22).count() == 23)
    assert(t.history().count() == 26)
    // time travel to a version before the surviving checkpoint uses the
    // older checkpoint (v10 <= 19 were deleted, but checkpoint 10 exists)
    assert(t.toDFAsOf(10).count() == 11)
  }

  test("legacy line-JSON checkpoints stay readable") {
    val dir = Files.createTempDirectory("vintage-cp").toString + "/legacy"
    val t = VintageTable.create(spark, dir, Seq((0, "v0")).toDF("id", "s").coalesce(1))
    (1 to 5).foreach(i => t.append(Seq((i, s"v$i")).toDF("id", "s").coalesce(1)))
    // hand-write a v5 checkpoint in the pre-parquet format
    val snap = t.snapshot
    val actions: Seq[Action] =
      Seq(Metadata(snap.schema.json, snap.properties, snap.partitionColumns)) ++
        snap.commits.sortBy(_.version) ++ snap.files
    val store = LogStore.default
    val logDir = VintageLog.logDir(t.path)
    store.writeReplace(new HPath(logDir, f"${5L}%020d.checkpoint.json"),
      actions.map(Action.toJsonLine))
    store.writeReplace(new HPath(logDir, "_last_checkpoint"),
      Seq("""{"version":5}"""))
    VintageLog.clearSnapshotCache()
    // replay must come from the JSON checkpoint: kill the old commits
    (0L to 4L).foreach(v => store.delete(new HPath(logDir, f"$v%020d.json")))
    assert(t.toDF.count() == 6)
    assert(t.history().count() == 6)
  }

  test("vacuum replays only commits after the retention-horizon checkpoint") {
    val dir = Files.createTempDirectory("vintage-cp").toString + "/vac"
    val t = VintageTable.create(spark, dir,
      Seq((0, "v0")).toDF("id", "s").coalesce(1))
    // 24 overwrites -> removals at nearly every version; checkpoints at 10 and 20
    (1 to 24).foreach(i => t.overwrite(Seq((i, s"v$i")).toDF("id", "s").coalesce(1)))
    assert(t.version == 24)

    class CountingStore(inner: LogStore) extends LogStore {
      val reads = scala.collection.mutable.Map[String, Int]().withDefaultValue(0)
      override def readLines(p: HPath): Seq[String] = {
        reads.synchronized { reads(p.getName) += 1 }
        inner.readLines(p)
      }
      override def writeExclusive(p: HPath, l: Seq[String]): Unit = inner.writeExclusive(p, l)
      override def writeReplace(p: HPath, l: Seq[String]): Unit = inner.writeReplace(p, l)
      override def list(d: HPath) = inner.list(d)
      override def exists(p: HPath) = inner.exists(p)
      override def isDirectory(p: HPath) = inner.isDirectory(p)
      override def mkdirs(d: HPath): Unit = inner.mkdirs(d)
      override def delete(p: HPath): Unit = inner.delete(p)
    }
    val spy = new CountingStore(LogStore.default)
    val orig = VintageLog.store
    VintageLog.store = spy
    try {
      spark.conf.set("spark.vintage.retentionDurationCheck.enabled", "false")
      val deleted =
        try t.vacuum(retentionHours = 0.0)
        finally spark.conf.unset("spark.vintage.retentionDurationCheck.enabled")
      assert(deleted >= 20, s"old overwritten files must go, got $deleted")
      // horizon checkpoint is 20 -> versions 0..20 must NOT be re-read
      val badReads = (0L to 20L).map(v => f"$v%020d.json")
        .filter(n => spy.reads(n) > 0)
      assert(badReads.isEmpty,
        s"vacuum read pre-horizon commits: ${badReads.take(3)}...")
    } finally VintageLog.store = orig
    assert(t.toDF.count() == 1) // current snapshot untouched
  }

  test("cleanupLog truncates pre-base segments; history and replay survive") {
    val dir = Files.createTempDirectory("vintage-cp").toString + "/clean"
    val t = VintageTable.create(spark, dir, Seq((0, "v0")).toDF("id", "s").coalesce(1))
    (1 to 25).foreach { i =>
      t.append(Seq((i, s"v$i")).toDF("id", "s").coalesce(1))
    }
    // short retention needs the same opt-out as vacuum
    intercept[IllegalArgumentException] { t.cleanupLog(0.0) }
    spark.conf.set("spark.vintage.retentionDurationCheck.enabled", "false")
    val removed =
      try t.cleanupLog(0.0) // cutoff = now → base = checkpoint 20
      finally spark.conf.unset("spark.vintage.retentionDurationCheck.enabled")
    assert(removed > 0)
    val store = LogStore.default
    val logDir = VintageLog.logDir(t.path)
    assert(!store.exists(new HPath(logDir, f"${0L}%020d.json")))
    assert(!store.exists(new HPath(logDir, f"${19L}%020d.json")))
    assert(!store.exists(new HPath(logDir, f"${10L}%020d.checkpoint.parquet")))
    assert(store.exists(new HPath(logDir, f"${20L}%020d.checkpoint.parquet")))
    assert(store.exists(new HPath(logDir, f"${25L}%020d.json")))

    // current state, history, and post-base time travel all intact
    VintageLog.invalidate(t.path)
    assert(t.toDF.count() == 26)
    assert(t.snapshot.commits.size == 26, "checkpointed history must survive")
    assert(t.toDFAsOf(22).count() == 23)
    // pre-base versions are gone — the vacuum-style contract
    intercept[Exception](t.toDFAsOf(5).count())
    // the table keeps working
    t.append(Seq((99, "new")).toDF("id", "s").coalesce(1))
    assert(t.toDF.count() == 27)

    // vacuum still works on the truncated log (its tail replay must
    // start at the oldest surviving commit JSON, not version 0) and
    // reclaims the files the appends rewrote away
    t.compact(1)
    spark.conf.set("spark.vintage.retentionDurationCheck.enabled", "false")
    val vacuumed =
      try t.vacuum(0.0)
      finally spark.conf.unset("spark.vintage.retentionDurationCheck.enabled")
    assert(vacuumed > 0, "vacuum after cleanupLog must reclaim files")
    assert(t.toDF.count() == 27)
  }

  test("re-create after raw-FS delete serves the new table, not cached snapshots") {
    val dir = Files.createTempDirectory("vintage-cp").toString + "/recreate"
    val t1 = VintageTable.create(spark, dir,
      Seq((1, "old")).toDF("id", "s").coalesce(1))
    // populate the (dir, version) snapshot cache
    assert(t1.toDF.select("s").as[String].collect().toSeq == Seq("old"))
    // remove the table with raw FS calls — no DROP TABLE, so only
    // create()'s own invalidation protects the next reader
    val hp = new HPath(t1.path)
    hp.getFileSystem(spark.sessionState.newHadoopConf()).delete(hp, true)
    val t2 = VintageTable.create(spark, dir,
      Seq((2, "new")).toDF("id", "s").coalesce(1))
    assert(t2.toDF.select("s").as[String].collect().toSeq == Seq("new"),
      "cached snapshot of the deleted table must not be served")
  }

  test("repartitionBeforeWrite bounds merge output files by touched inputs") {
    val dir = Files.createTempDirectory("vintage-cp").toString + "/rp"
    val t = VintageTable.create(spark, dir,
      (1 to 100).map(i => (i.toLong, s"n$i")).toDF("id", "s").coalesce(1))
    spark.conf.set("spark.vintage.merge.repartitionBeforeWrite", "true")
    try {
      t.as("tgt").merge(
          Seq((50L, "upd")).toDF("id", "s").as("src"), "tgt.id = src.id")
        .whenMatched().updateAll()
        .whenNotMatched().insertAll()
        .execute()
    } finally spark.conf.unset("spark.vintage.merge.repartitionBeforeWrite")
    val adds = VintageLog.readVersion(t.path, t.version)
      .collect { case a: AddFile => a }
    assert(adds.size <= 2, s"1 touched file must not fan out: got ${adds.size}")
    assert(t.toDF.count() == 100)
  }

  test("timestamp time travel works from checkpointed history") {
    val dir = Files.createTempDirectory("vintage-cp").toString + "/ts"
    val t = VintageTable.create(spark, dir, Seq((0, "a")).toDF("id", "s").coalesce(1))
    (1 to 12).foreach { i => t.append(Seq((i, "b")).toDF("id", "s").coalesce(1)) }
    val commits = t.snapshot.commits.sortBy(_.version)
    val v5ts = commits.find(_.version == 5).get.timestamp
    assert(t.toDFAsOfTimestamp(v5ts).count() == 6)
  }
}
