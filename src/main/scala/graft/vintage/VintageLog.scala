package graft.vintage

import java.io.IOException
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.ConcurrentModificationException

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.types.StructType

/** Reconstructed table state as of a version: live files + schema.
  * Produced by log replay; the read path scans exactly `files`.
  */
case class Snapshot(
    version: Long,
    schema: StructType,
    files: Seq[AddFile],
    properties: Map[String, String],
    commits: Seq[CommitInfo]) {
  def filePaths(tableDir: String): Seq[String] =
    files.map(f => s"$tableDir/${f.path}")
}

/** The transaction log: ordered JSON commit files under
  * `<table>/_vintage_log/`. Commit N is `%020d.json`.
  *
  * Atomicity: each commit is staged to a temp file and published with
  * a hard link (create-exclusive on the final name). A concurrent
  * writer that targets the same version loses with
  * [[ConcurrentModificationException]] — the optimistic-concurrency
  * core of a Delta-style protocol. On a real multi-writer object store
  * this link step would be a pluggable LogStore (put-if-absent).
  */
object VintageLog {
  val LogDirName = "_vintage_log"

  def logDir(tableDir: String): Path = Paths.get(tableDir, LogDirName)

  private def versionFile(tableDir: String, v: Long): Path =
    logDir(tableDir).resolve(f"$v%020d.json")

  def exists(tableDir: String): Boolean = Files.isDirectory(logDir(tableDir))

  /** Latest committed version, or -1 for an empty/absent log. */
  def latestVersion(tableDir: String): Long = {
    val dir = logDir(tableDir)
    if (!Files.isDirectory(dir)) return -1L
    Files.list(dir).iterator().asScala
      .map(_.getFileName.toString)
      .filter(_.endsWith(".json"))
      .map(_.stripSuffix(".json").toLong)
      .foldLeft(-1L)(math.max)
  }

  /** Atomically publish version `v`; fails if `v` already exists. */
  def commit(tableDir: String, v: Long, actions: Seq[Action]): Unit = {
    val dir = logDir(tableDir)
    Files.createDirectories(dir)
    val target = versionFile(tableDir, v)
    val tmp = Files.createTempFile(dir, s".commit-$v-", ".tmp")
    try {
      val body = actions.map(Action.toJsonLine).mkString("", "\n", "\n")
      Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
      try Files.createLink(target, tmp)
      catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          throw new ConcurrentModificationException(
            s"version $v already committed at $target")
      }
    } finally Files.deleteIfExists(tmp)
  }

  def readVersion(tableDir: String, v: Long): Seq[Action] = {
    val f = versionFile(tableDir, v)
    if (!Files.exists(f))
      throw new IOException(s"version $v not found for table $tableDir")
    Files.readAllLines(f, StandardCharsets.UTF_8).asScala.toSeq
      .filter(_.nonEmpty).map(Action.fromJsonLine)
  }

  /** Replay the log up to (and including) `untilVersion`
    * (None = latest). At 100 TB scale this becomes checkpoint +
    * incremental replay; commit counts here are small enough for a
    * full linear replay.
    */
  def replay(tableDir: String, untilVersion: Option[Long] = None): Snapshot = {
    val latest = latestVersion(tableDir)
    require(latest >= 0, s"not a vintage table (no $LogDirName): $tableDir")
    val until = untilVersion.getOrElse(latest)
    require(until >= 0 && until <= latest,
      s"version $until out of range [0, $latest] for $tableDir")
    var files = scala.collection.mutable.LinkedHashMap[String, AddFile]()
    var meta: Option[Metadata] = None
    val commits = scala.collection.mutable.ArrayBuffer[CommitInfo]()
    (0L to until).foreach { v =>
      readVersion(tableDir, v).foreach {
        case a: AddFile    => files(a.path) = a
        case r: RemoveFile => files.remove(r.path)
        case m: Metadata   => meta = Some(m)
        case c: CommitInfo => commits += c
      }
    }
    val m = meta.getOrElse(
      throw new IOException(s"no metaData action in log of $tableDir"))
    Snapshot(until, m.schema, files.values.toSeq, m.properties, commits.toSeq)
  }

  /** Version whose commit timestamp is the latest <= `ts` (time travel
    * by timestamp, README.md:166,321).
    */
  def versionAtTimestamp(tableDir: String, ts: Long): Long = {
    val latest = latestVersion(tableDir)
    require(latest >= 0, s"not a vintage table: $tableDir")
    val versions = (0L to latest).flatMap { v =>
      readVersion(tableDir, v).collectFirst { case c: CommitInfo => (v, c.timestamp) }
    }
    versions.filter(_._2 <= ts).map(_._1).lastOption.getOrElse(
      throw new IllegalArgumentException(
        s"no version at or before timestamp $ts for $tableDir"))
  }
}
