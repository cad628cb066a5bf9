package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Forked-JVM scale validation of the STORED-LSH-INDEX refresh tier
  * ([[graft.tools.IndexSoak]]): build the persisted signature index of
  * a synthetic corpus under the ScaleSoak JVM discipline (2 GB heap,
  * ParallelGC, raised GCLocker retries) and refresh batches against
  * the STORED table — the pruned small-batch path AND the full-scan
  * fallback — with every count asserted exact inside the tool.
  *
  * The spec run uses 1M docs (16M-row index) to stay in CI budget;
  * the 50M/1M-batch evidence runs are forked directly via `java`
  * per round (soak/ artifacts), as with the main ScaleSoak.
  *
  * SLOW (minutes): skipped unless GRAFT_INDEX_SOAK=1.
  */
class IndexSoakSpec extends AnyFunSuite {

  private val enabled = sys.env.get("GRAFT_INDEX_SOAK").contains("1")

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
    val dir = Files.createTempDirectory(s"graft-idxsoak-$n")
    val log = dir.resolve("soak.log").toFile
    val javaBin =
      java.nio.file.Paths.get(sys.props("java.home"), "bin", "java").toString
    val cmd = Seq(javaBin, "-Xmx2g",
      "-XX:+HeapDumpOnOutOfMemoryError", s"-XX:HeapDumpPath=$dir",
      "-XX:+UseParallelGC",
      "-XX:+UnlockDiagnosticVMOptions",
      "-XX:GCLockerRetryAllocationCount=100",
    ) ++ addOpens ++ Seq(
      "-Dspark.ui.enabled=false",
      "-cp", sys.props("java.class.path"),
      "graft.tools.IndexSoak", n.toString)
    val p = new ProcessBuilder(cmd: _*)
      .redirectErrorStream(true).redirectOutput(log).start()
    if (!p.waitFor(timeoutMin, java.util.concurrent.TimeUnit.MINUTES)) {
      p.destroyForcibly()
      fail(s"index soak at $n docs timed out — log: $log")
    }
    val out = Files.readString(log.toPath)
    if (p.exitValue() != 0)
      fail(s"index soak at $n docs failed — tail:\n${out.takeRight(4000)}")
    val line = out.linesIterator.find(_.startsWith("INDEXSOAK "))
      .getOrElse(fail(s"no INDEXSOAK line:\n${out.takeRight(2000)}"))
    line.stripPrefix("INDEXSOAK ").stripPrefix("{").stripSuffix("}")
      .split(",").map { kv =>
        val Array(k, v) = kv.split(":", 2)
        k.trim.stripPrefix("\"").stripSuffix("\"") -> v.trim.toDouble
      }.toMap
  }

  test("1M-doc stored index: build + pruned refresh + full-scan fallback under 2 GB") {
    assume(enabled, "slow index soak — set GRAFT_INDEX_SOAK=1 to run")
    val r = runSoak(1000000L, timeoutMin = 30)
    assert(r("rows") == 1000000.0)
    assert(r("index_rows") == 16000000.0)
    assert(r("small_hits") == 30.0)
    // disjoint range files: a key lives in exactly one file, so the
    // probe's candidate set is bounded by its key count
    assert(r("small_files_touched") <= r("small_keys"))
    assert(r("big_hits") == r("big_batch") * 0.9)
    assert(r("heap_max_bytes") <= 2.2e9)
  }
}
