package graft.vintage

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The object-store commit path: exclusivity from an external
  * coordinator's put-if-absent, publication by overwrite copy, and
  * reader-side recovery of crashed publishes. The whole engine runs
  * against it unchanged — the LogStore seam is the only thing swapped.
  */
class ConditionalPutLogStoreSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def withStore[A](body: (ConditionalPutLogStore, InMemoryCommitCoordinator) => A): A = {
    val prev = VintageLog.store
    val coord = new InMemoryCommitCoordinator
    val store = new ConditionalPutLogStore(new Configuration(), coord)
    VintageLog.store = store
    VintageLog.clearSnapshotCache()
    try body(store, coord)
    finally {
      VintageLog.store = prev
      VintageLog.clearSnapshotCache()
    }
  }

  private def newDir(): String =
    Files.createTempDirectory("vintage-cput").toString + "/t"

  test("the engine runs end to end on the conditional-put store") {
    withStore { (_, _) =>
      val dir = newDir()
      val t = VintageTable.create(spark, dir,
        Seq((1L, "a"), (2L, "b")).toDF("id", "v"),
        properties = Map(DeletionVectors.EnabledProp -> "true"))
      t.append(Seq((3L, "c")).toDF("id", "v"))
      t.delete(org.apache.spark.sql.functions.col("id") === 1L)
      assert(t.toDF.count() == 2)
      assert(t.toDFAsOf(1).count() == 3, "time travel works on the store")
      // checkpoints (parquet side-files) ride the same conf
      (1 to 10).foreach(i => t.append(Seq((10L + i, s"x$i")).toDF("id", "v")))
      VintageLog.clearSnapshotCache()
      assert(t.toDF.count() == 12)
    }
  }

  test("losers of the coordinator race get the standard conflict error") {
    withStore { (_, _) =>
      val dir = newDir()
      VintageTable.create(spark, dir, Seq((1L, "a")).toDF("id", "v"))
      // racing appends: the version race is arbitrated by putIfAbsent,
      // and the commit loop's retry resolves it exactly as on HDFS
      val threads = (1 to 4).map { i =>
        new Thread(() => {
          VintageTable.forPath(spark, dir)
            .append(Seq((i.toLong * 100, s"w$i")).toDF("id", "v"))
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      VintageLog.clearSnapshotCache()
      assert(VintageTable.forPath(spark, dir).toDF.count() == 5,
        "every racing append must land exactly once")
    }
  }

  test("transient publish failure is absorbed by the synchronous retry") {
    withStore { (_, coord) =>
      // a store whose copy-to-final-name fails the first N times:
      // the bounded in-writeExclusive retry must land the publish
      // without ever deferring to reader-side recovery
      val flaky = new ConditionalPutLogStore(new Configuration(), coord) {
        @volatile var failuresLeft = 2
        override protected def publishCopy(path: Path, lines: Seq[String]): Unit = {
          if (failuresLeft > 0) {
            failuresLeft -= 1
            throw new java.io.IOException(s"injected publish failure: $path")
          }
          super.publishCopy(path, lines)
        }
      }
      val dir = newDir()
      val logDir = VintageLog.logDir(dir)
      new Path(logDir, "x").getFileSystem(new Configuration()).mkdirs(logDir)
      val v0 = new Path(logDir, f"${0L}%020d.json")
      flaky.writeExclusive(v0, Seq("""{"x":1}"""))
      assert(flaky.failuresLeft == 0, "retry must have consumed the failures")
      // the final object exists WITHOUT any reader-side recovery
      val raw = new HadoopLogStore(new Configuration())
      assert(raw.exists(v0), "publish must have landed synchronously")
    }
  }

  test("persistent publish failure defers to reader-side recovery") {
    withStore { (_, coord) =>
      val broken = new ConditionalPutLogStore(new Configuration(), coord) {
        @volatile var broken = true
        override protected def publishCopy(path: Path, lines: Seq[String]): Unit = {
          if (broken)
            throw new java.io.IOException(s"injected publish failure: $path")
          super.publishCopy(path, lines)
        }
      }
      val dir = newDir()
      val logDir = VintageLog.logDir(dir)
      new Path(logDir, "x").getFileSystem(new Configuration()).mkdirs(logDir)
      val v0 = new Path(logDir, f"${0L}%020d.json")
      // the write SUCCEEDS (the reservation is the commit) …
      broken.writeExclusive(v0, Seq("""{"x":1}"""))
      val raw = new HadoopLogStore(new Configuration())
      assert(!raw.exists(v0), "publish must still be pending")
      // … and the first read through the store completes it
      broken.broken = false
      assert(broken.readLines(v0).filter(_.nonEmpty) == Seq("""{"x":1}"""))
      assert(raw.exists(v0), "reader-side recovery must have published")
    }
  }

  test("concurrent recoverers of one reservation: loser defers, nobody crashes, version never vanishes") {
    // the r12 3-JVM failure shape, pinned in-process: N deferred
    // reservations, two threads calling list() concurrently — both
    // recoverUnder the SAME pending commits and race publish. The old
    // overwrite publish (exists→delete→rename) crashed the rename
    // loser and transiently DELETED already-published versions; the
    // exclusive publish must absorb the race with both destinations
    // continuously visible.
    withStore { (store, coord) =>
      val dir = newDir()
      VintageTable.create(spark, dir, Seq((1L, "a")).toDF("id", "v"))
      val logDir = VintageLog.logDir(dir)
      val raw = new HadoopLogStore(new Configuration())
      (1 to 20).foreach { v =>
        val dest = new Path(logDir, f"${v.toLong}%020d.json")
        val staged = new Path(logDir, s".${dest.getName}.r$v.staged")
        val actions = Seq(
          CommitInfo(v.toLong, System.currentTimeMillis(), "WRITE",
            Map("mode" -> "Append")),
          AddFile(s"r$v.parquet", 1L, 1L, dataChange = true, Some(0L)))
        store.writeReplace(staged, actions.map(Action.toJsonLine))
        assert(coord.putIfAbsent(
          VintageTable.canonicalKey(dest.toString), staged.toString))
      }
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val gate = new java.util.concurrent.CountDownLatch(1)
      val threads = (1 to 2).map { _ =>
        new Thread(() => {
          gate.await()
          try store.list(logDir)
          catch { case e: Throwable => errs.add(e) }
        })
      }
      threads.foreach(_.start()); gate.countDown(); threads.foreach(_.join())
      assert(errs.isEmpty, s"recovery race must not throw: ${errs}")
      (1 to 20).foreach { v =>
        val dest = new Path(logDir, f"${v.toLong}%020d.json")
        assert(raw.exists(dest), s"version $v must be published")
        assert(coord.pending(VintageTable.canonicalKey(dest.toString)).isEmpty,
          s"version $v must be marked complete")
      }
      VintageLog.clearSnapshotCache()
      assert(VintageLog.latestVersion(dir) == 20L)
    }
  }

  test("a crash between reservation and publish is recovered by readers") {
    withStore { (store, coord) =>
      val dir = newDir()
      val t = VintageTable.create(spark, dir, Seq((1L, "a")).toDF("id", "v"))
      // simulate the crash: stage + reserve version 1 by hand, no copy
      val logDir = VintageLog.logDir(dir)
      val v1 = new Path(logDir, f"${1L}%020d.json")
      val staged = new Path(logDir, s".${v1.getName}.deadbeef.staged")
      val actions = Seq(
        CommitInfo(1L, System.currentTimeMillis(), "WRITE",
          Map("mode" -> "Append")),
        AddFile("ghost.parquet", 1L, 1L, dataChange = true, Some(0L)))
      store.writeReplace(staged, actions.map(Action.toJsonLine))
      assert(coord.putIfAbsent(
        VintageTable.canonicalKey(v1.toString), staged.toString))
      // a plain reader recovers the pending commit and sees version 1
      VintageLog.clearSnapshotCache()
      assert(VintageLog.latestVersion(dir) == 1L,
        "listing must surface the reserved-but-unpublished commit")
      assert(VintageLog.replay(dir).files.exists(_.path == "ghost.parquet"))
      // and the version is occupied: a new writer commits at 2, not 1
      t.append(Seq((2L, "b")).toDF("id", "v"))
      VintageLog.clearSnapshotCache()
      assert(VintageLog.latestVersion(dir) == 2L)
    }
  }
}
