package graft.vintage

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

/** The conditional-put commit protocol raced across REAL JVM
  * boundaries: three separate processes append through
  * [[ConditionalPutLogStore]] + [[FileCommitCoordinator]] to one log
  * directory. The single-JVM spec (ConditionalPutLogStoreSpec) can
  * only race threads, which share the in-memory coordinator's
  * ConcurrentHashMap and the JVM's file-handle cache — the class of
  * bug the round-9 hard-link fix caught (check-then-act between
  * processes) only reproduces with genuinely separate processes.
  *
  * Asserted: exactly 3×N commits land, versions are contiguous from 0
  * (no loss), every (worker, seq) payload appears exactly once (no
  * double-publish, no overwrite), and each version file holds exactly
  * one payload line. Run twice, because races are only green "under
  * repetition".
  */
class MultiProcessCommitSpec extends AnyFunSuite {

  private val PerWorker = 10
  private val Workers = 3

  private def javaBin: String =
    java.nio.file.Paths.get(sys.props("java.home"), "bin", "java").toString

  private def raceOnce(round: Int): Unit = {
    val base = Files.createTempDirectory(s"graft-mpc-$round")
    val coordDir = base.resolve("coord").toString
    val logDir = base.resolve("log").toString
    Files.createDirectories(java.nio.file.Paths.get(logDir))
    val cp = sys.props("java.class.path")
    val procs = (0 until Workers).map { w =>
      new ProcessBuilder(javaBin, "-cp", cp, "graft.tools.CommitWorker",
          coordDir, logDir, s"w$w", PerWorker.toString)
        .redirectErrorStream(true)
        .redirectOutput(base.resolve(s"worker$w.log").toFile)
        .start()
    }
    procs.zipWithIndex.foreach { case (p, w) =>
      assert(p.waitFor(120, java.util.concurrent.TimeUnit.SECONDS),
        s"worker $w timed out")
      assert(p.exitValue() == 0, s"worker $w failed: " +
        Files.readString(base.resolve(s"worker$w.log")))
    }

    // read back through a FRESH store over the same coordinator state
    // (recovers any deferred publish exactly like a later reader would)
    val store = new ConditionalPutLogStore(new Configuration(),
      new FileCommitCoordinator(coordDir))
    val versionRe = """(\d{20})\.json""".r
    val files = store.list(new Path(logDir)).map(_.getPath).collect {
      case p if versionRe.pattern.matcher(p.getName).matches() => p
    }.sortBy(_.getName)
    assert(files.size == Workers * PerWorker,
      s"round $round: expected ${Workers * PerWorker} commits, got ${files.size}")
    val versions = files.map(f => versionRe.findFirstMatchIn(f.getName).get
      .group(1).toLong)
    assert(versions == (0L until (Workers * PerWorker)),
      s"round $round: versions not contiguous: $versions")
    val payloads = files.flatMap { f =>
      val lines = store.readLines(f).filter(_.nonEmpty)
      assert(lines.size == 1, s"round $round: ${f.getName} holds $lines")
      lines
    }
    val expected = (0 until Workers).flatMap(w => (0 until PerWorker)
      .map(s => s"""{"worker":"w$w","seq":$s}""")).toSet
    assert(payloads.toSet == expected,
      s"round $round: payload set mismatch (lost or duplicated commit)")
    assert(payloads.size == payloads.distinct.size,
      s"round $round: a payload appears in two versions (double-publish)")
  }

  test("3 JVMs × 10 commits: no loss, no double-publish, contiguous log") {
    raceOnce(1)
    raceOnce(2)
  }
}
