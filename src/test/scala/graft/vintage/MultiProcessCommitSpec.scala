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

  private def raceOnce(round: Int, kind: String = "condput"): Unit = {
    val base = Files.createTempDirectory(s"graft-mpc-$kind-$round")
    val coordDir = base.resolve("coord").toString
    val logDir = base.resolve("log").toString
    Files.createDirectories(java.nio.file.Paths.get(logDir))
    val cp = sys.props("java.class.path")
    val procs = (0 until Workers).map { w =>
      new ProcessBuilder(javaBin, "-cp", cp, "graft.tools.CommitWorker",
          coordDir, logDir, s"w$w", PerWorker.toString, kind)
        .redirectErrorStream(true)
        .redirectOutput(base.resolve(s"worker$w.log").toFile)
        .start()
    }
    procs.zipWithIndex.foreach { case (p, w) =>
      // generous: the commits take ~2 s, but a loaded host (a parallel
      // suite run) can starve 3 fresh JVM starts past 120 s — observed
      assert(p.waitFor(300, java.util.concurrent.TimeUnit.SECONDS),
        s"worker $w timed out")
      assert(p.exitValue() == 0, s"worker $w failed: " +
        Files.readString(base.resolve(s"worker$w.log")))
    }

    // read back through a FRESH store over the same coordinator state
    // (recovers any deferred publish exactly like a later reader would)
    val store: LogStore =
      if (kind == "hadooplink") new HadoopLogStore(new Configuration())
      else new ConditionalPutLogStore(new Configuration(),
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

  test("3 JVMs through the production hard-link HadoopLogStore path") {
    // the path every local-FS table commit actually takes
    // (writeExclusive's Files.createLink) — the round-9 lost-write fix,
    // now raced across REAL process boundaries rather than threads
    raceOnce(1, kind = "hadooplink")
    raceOnce(2, kind = "hadooplink")
  }

  test("kill -9 mid-race: reserved commits recover, log stays consistent") {
    val base = Files.createTempDirectory("graft-mpc-kill")
    val coordDir = base.resolve("coord").toString
    val logDir = base.resolve("log").toString
    Files.createDirectories(java.nio.file.Paths.get(logDir))
    val cp = sys.props("java.class.path")
    val perWorker = 40 // wide enough that the kill lands mid-stream
    def start(w: String, n: Int) =
      new ProcessBuilder(javaBin, "-cp", cp, "graft.tools.CommitWorker",
          coordDir, logDir, w, n.toString)
        .redirectErrorStream(true)
        .redirectOutput(base.resolve(s"worker-$w.log").toFile)
        .start()
    val victim = start("w0", perWorker)
    val survivors = Seq(start("w1", perWorker), start("w2", perWorker))
    Thread.sleep(400) // mid-race for a ~2-4 s workload
    victim.destroyForcibly()
    victim.waitFor(30, java.util.concurrent.TimeUnit.SECONDS)
    survivors.zipWithIndex.foreach { case (p, i) =>
      assert(p.waitFor(300, java.util.concurrent.TimeUnit.SECONDS),
        s"survivor w${i + 1} timed out — a dead process's reservation " +
          "must not wedge the log")
      assert(p.exitValue() == 0, s"survivor w${i + 1} failed: " +
        Files.readString(base.resolve(s"worker-w${i + 1}.log")))
    }
    // a LATE worker joins after the crash (fresh JVM, shared
    // coordinator): reader-side recovery must publish anything the
    // victim reserved but never copied to its final name
    val late = start("w3", 5)
    assert(late.waitFor(300, java.util.concurrent.TimeUnit.SECONDS))
    assert(late.exitValue() == 0,
      "late worker failed: " + Files.readString(base.resolve("worker-w3.log")))

    val store = new ConditionalPutLogStore(new Configuration(),
      new FileCommitCoordinator(coordDir))
    val versionRe = """(\d{20})\.json""".r
    val files = store.list(new Path(logDir)).map(_.getPath).collect {
      case p if versionRe.pattern.matcher(p.getName).matches() => p
    }.sortBy(_.getName)
    val versions = files.map(f => versionRe.findFirstMatchIn(f.getName).get
      .group(1).toLong)
    assert(versions == (0L until versions.size),
      s"versions not contiguous after crash: $versions")
    val payloads = files.flatMap { f =>
      val lines = store.readLines(f).filter(_.nonEmpty)
      assert(lines.size == 1, s"${f.getName} holds $lines")
      lines
    }
    assert(payloads.size == payloads.distinct.size,
      "a payload appears in two versions (double-publish after crash)")
    def seqsOf(w: String): Seq[Int] =
      payloads.filter(_.contains(s""""worker":"$w"""))
        .map(p => """"seq":(\d+)""".r.findFirstMatchIn(p).get.group(1).toInt)
        .sorted
    // every surviving worker's commits land completely...
    assert(seqsOf("w1") == (0 until perWorker), s"w1 lost commits: ${seqsOf("w1")}")
    assert(seqsOf("w2") == (0 until perWorker), s"w2 lost commits: ${seqsOf("w2")}")
    assert(seqsOf("w3") == (0 until 5), s"w3 lost commits: ${seqsOf("w3")}")
    // ...and the victim's are a clean prefix of its sequence (it
    // commits serially, so a crash can only truncate, never gap)
    val v = seqsOf("w0")
    assert(v == (0 until v.size), s"victim's commits have a gap: $v")
  }
}
