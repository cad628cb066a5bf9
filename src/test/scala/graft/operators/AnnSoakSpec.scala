package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Scale validation of the ANN/PQ tier ([[graft.tools.AnnSoak]] forked
  * as a REAL JVM under a 2 GB heap, the ScaleSoak discipline): train /
  * build / query at 2M and 20M synthesized 64-dim vectors, asserting
  *
  *  (a) no OOM under the cap at 20M (a corpus-sized collect or persist
  *      in the index path would blow it),
  *  (b) recall@1 ≥ 0.9 of the 100 PLANTED nearest neighbors at BOTH
  *      scales (exact ground truth at any n — a broken encode, probe,
  *      or scoring stage collapses this toward 0),
  *  (c) the BUILD pass (the corpus-sized stage) grows ≤ 30× for 10×
  *      the rows (the ScaleSoak linearity bound), and TRAIN grows
  *      ≤ 10× — its fit COMPUTE is sample-bounded, but the
  *      fitFraction=0 auto mode runs a count() plus a corpus-wide
  *      sample() scan first, so the honest bound is "at worst linear
  *      in the scan", not O(1) (ADVICE r13).
  *
  * Runs under the same GRAFT_SOAK=1 switch as ScaleSoakSpec (minutes,
  * not hours: the 20M build is one compiled pass).
  */
class AnnSoakSpec extends AnyFunSuite {

  private val enabled = sys.env.get("GRAFT_SOAK").contains("1")

  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  private def runSoak(n: Long, timeoutMin: Long): Map[String, Double] = {
    val dir = Files.createTempDirectory(s"graft-annsoak-$n")
    val log = dir.resolve("soak.log").toFile
    val javaBin =
      java.nio.file.Paths.get(sys.props("java.home"), "bin", "java").toString
    val cmd = Seq(javaBin, "-Xmx2g",
      "-XX:+HeapDumpOnOutOfMemoryError", s"-XX:HeapDumpPath=$dir",
      // same GC posture as ScaleSoakSpec (see its comment)
      "-XX:+UseParallelGC", "-XX:+UnlockDiagnosticVMOptions",
      "-XX:GCLockerRetryAllocationCount=100",
    ) ++ addOpens ++ Seq(
      "-Dspark.ui.enabled=false",
      "-cp", sys.props("java.class.path"),
      "graft.tools.AnnSoak", n.toString)
    val p = new ProcessBuilder(cmd: _*)
      .redirectErrorStream(true).redirectOutput(log).start()
    if (!p.waitFor(timeoutMin, java.util.concurrent.TimeUnit.MINUTES)) {
      p.destroyForcibly()
      fail(s"ann soak at $n rows timed out — log: ${log.getAbsolutePath}")
    }
    val out = Files.readString(log.toPath)
    if (p.exitValue() != 0)
      fail(s"ann soak at $n rows failed — log: ${log.getAbsolutePath} " +
        s"— tail:\n${out.takeRight(3000)}")
    val line = out.linesIterator.find(_.startsWith("ANNSOAK "))
      .getOrElse(fail(s"no ANNSOAK line:\n${out.takeRight(2000)}"))
    line.stripPrefix("ANNSOAK ").stripPrefix("{").stripSuffix("}")
      .split(",").map { kv =>
        val Array(k, v) = kv.split(":", 2)
        k.trim.stripPrefix("\"").stripSuffix("\"") -> v.trim.toDouble
      }.toMap
  }

  test("ANN index train/build/query at 2M and 20M vectors under a 2 GB heap") {
    assume(enabled, "slow scale soak — set GRAFT_SOAK=1 to run")
    val small = runSoak(2000000L, timeoutMin = 20)
    val big = runSoak(20000000L, timeoutMin = 60)
    for ((r, n) <- Seq((small, 2000000L), (big, 20000000L))) {
      assert(r("rows") == n.toDouble)
      assert(r("planted_hits") >= 90.0,
        s"planted recall@1 below 0.9 at $n rows: ${r("planted_hits")}/100")
      assert(r("heap_max_bytes") <= 2.3e9)
      info(s"n=$n train=${r("sec_train")}s build=${r("sec_build")}s " +
        s"query=${r("sec_query")}s planted=${r("planted_hits")}/100")
    }
    assert(big("sec_build") / math.max(small("sec_build"), 0.1) <= 30.0,
      "index build grew super-linearly")
    // fit compute is sample-bounded but the auto-mode count()/sample()
    // scans are O(n), so the bound is the scan-linearity one (<= 10x
    // for 10x rows), not a constant (ADVICE r13)
    assert(big("sec_train") / math.max(small("sec_train"), 0.1) <= 10.0,
      "train fit must be sample-bounded (only its O(n) scans may scale)")
  }
}
