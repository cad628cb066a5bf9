package graft.vintage

import java.util.ConcurrentModificationException
import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}

/** External arbitration of commit exclusivity — the contract a raw
  * object store (no atomic no-overwrite rename) needs to host the log.
  * In production this is a conditional-PUT capable store or a
  * DynamoDB-style table; in tests, [[InMemoryCommitCoordinator]] —
  * what matters is that `putIfAbsent` is the ONE linearization point.
  *
  * SHARED-COORDINATOR REQUIREMENT: a reservation is durable the
  * moment `putIfAbsent` succeeds, even if the staged object never
  * reaches its final name — recovery happens on the READ side, which
  * means correctness requires that EVERY process that lists or reads
  * the log routes through a [[ConditionalPutLogStore]] backed by the
  * SAME coordinator. An out-of-band reader (another engine, a raw
  * bucket listing, ops tooling) does not see reserved-but-unpublished
  * versions and can observe a log with version N+1 visible but N
  * missing. The store bounds that window with a synchronous publish
  * retry at write time, but only the coordinator closes it.
  */
trait CommitCoordinator {
  /** Reserve `key` for the caller; `false` when already reserved —
    * the loser of a commit race. Records the staged object so ANY
    * process can complete a crashed winner's publish.
    */
  def putIfAbsent(key: String, stagedPath: String): Boolean

  /** Staged-object path of a reserved-but-unpublished commit, if any. */
  def pending(key: String): Option[String]

  /** Reserved keys under a directory prefix that are still pending. */
  def pendingUnder(prefix: String): Seq[String]

  /** Mark `key` published (the staged copy reached its final name). */
  def markComplete(key: String): Unit
}

/** Single-JVM coordinator standing in for the external service. */
class InMemoryCommitCoordinator extends CommitCoordinator {
  // key -> staged path, or null once complete
  private val entries = new ConcurrentHashMap[String, String]()
  override def putIfAbsent(key: String, stagedPath: String): Boolean =
    entries.putIfAbsent(key, stagedPath) == null
  override def pending(key: String): Option[String] =
    Option(entries.get(key)).filter(_.nonEmpty)
  override def pendingUnder(prefix: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    entries.forEach { (k, v) => if (k.startsWith(prefix) && v.nonEmpty) out += k }
    out.result()
  }
  override def markComplete(key: String): Unit = entries.put(key, "")
}

/** CROSS-PROCESS coordinator backed by a shared directory — the local
  * stand-in for the DynamoDB-style service, used to stress the
  * conditional-put protocol across real JVM boundaries (the in-memory
  * coordinator can only arbitrate threads).
  *
  * One entry file per key (md5 of the key): line 1 = key, line 2 =
  * staged path while pending, absent once complete. `putIfAbsent`'s
  * atomicity is the kernel's create-exclusive hard link of a fully
  * written temp file — two processes racing the same key see exactly
  * one winner, and a reader never observes a half-written entry.
  * `markComplete` replaces the entry via ATOMIC_MOVE.
  */
class FileCommitCoordinator(dirStr: String) extends CommitCoordinator {
  private val dir = java.nio.file.Paths.get(dirStr)
  java.nio.file.Files.createDirectories(dir)

  private def entry(key: String): java.nio.file.Path = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
    dir.resolve(h + ".res")
  }

  private def readEntry(p: java.nio.file.Path): Option[(String, String)] =
    try {
      val ls = java.nio.file.Files.readAllLines(p)
      if (ls.isEmpty) None
      else Some((ls.get(0), if (ls.size() >= 2) ls.get(1) else ""))
    } catch { case _: java.io.IOException => None }

  private def writeEntry(target: java.nio.file.Path, lines: String,
      exclusive: Boolean): Boolean = {
    val tmp = java.nio.file.Files.createTempFile(dir, ".coord", ".tmp")
    try {
      java.nio.file.Files.writeString(tmp, lines)
      if (exclusive) {
        try { java.nio.file.Files.createLink(target, tmp); true }
        catch { case _: java.nio.file.FileAlreadyExistsException => false }
      } else {
        java.nio.file.Files.move(tmp, target,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        true
      }
    } finally java.nio.file.Files.deleteIfExists(tmp)
  }

  override def putIfAbsent(key: String, stagedPath: String): Boolean =
    writeEntry(entry(key), s"$key\n$stagedPath\n", exclusive = true)

  override def pending(key: String): Option[String] =
    readEntry(entry(key)).map(_._2).filter(_.nonEmpty)

  override def pendingUnder(prefix: String): Seq[String] = {
    val s = java.nio.file.Files.list(dir)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".res"))
        .flatMap(readEntry)
        .collect { case (k, staged) if k.startsWith(prefix) && staged.nonEmpty => k }
        .toSeq
    } finally s.close()
  }

  override def markComplete(key: String): Unit =
    writeEntry(entry(key), s"$key\n", exclusive = false)
}

/** Log store for object stores WITHOUT atomic no-overwrite rename
  * (raw S3 before conditional PUT): the put-if-absent the commit
  * protocol needs comes from an external [[CommitCoordinator]], not
  * the filesystem — the design of Delta's S3 + DynamoDB LogStore,
  * re-expressed:
  *
  *  1. stage the commit as a UNIQUE object (single-object PUT is
  *     atomic on every object store — readers never see a partial
  *     object);
  *  2. `coordinator.putIfAbsent(finalPath, stagedPath)` — the ONLY
  *     arbitration point; the loser deletes its staging and raises
  *     the standard concurrent-commit error;
  *  3. copy staged → final name (an overwrite-allowed PUT: safe, only
  *     the reservation winner ever executes it), then mark complete.
  *
  * A crash between 2 and 3 leaves a commit that EXISTS logically but
  * not as its final object — so every read-side operation first
  * RECOVERS: any pending reservation under the directory is completed
  * from its recorded staged object before listing/reading. That makes
  * the winner's commit durable from the moment the reservation lands,
  * exactly like the DynamoDB design.
  */
class ConditionalPutLogStore(conf: Configuration,
    val coordinator: CommitCoordinator) extends HadoopLogStore(conf)
    with org.apache.spark.internal.Logging {

  private def key(path: Path): String = VintageTable.canonicalKey(path.toString)

  override def writeExclusive(path: Path, lines: Seq[String]): Unit = {
    val staged = new Path(path.getParent,
      s".${path.getName}.${java.util.UUID.randomUUID().toString.take(8)}.staged")
    writeReplace(staged, lines)
    if (!coordinator.putIfAbsent(key(path), staged.toString)) {
      delete(staged)
      throw new ConcurrentModificationException(s"already committed: $path")
    }
    // THE RESERVATION IS THE COMMIT: from here the entry is durable —
    // any reader recovers it from the staged object — so a publish
    // failure must NOT surface as a failed write (the caller would
    // retry and double-apply). Retry the publish synchronously a few
    // times first, though: every attempt that lands here shrinks the
    // window in which an out-of-band reader (one NOT routed through
    // the shared coordinator — see [[CommitCoordinator]]) could miss
    // the version; only then defer to reader-side recovery.
    var attempt = 0
    var published = false
    while (!published && attempt < publishAttempts) {
      attempt += 1
      try { publish(key(path), staged.toString, path); published = true }
      catch {
        case scala.util.control.NonFatal(e) =>
          if (attempt < publishAttempts) Thread.sleep(50L * attempt)
          else logWarning(s"commit $path reserved but publish deferred " +
            s"after $attempt attempts (readers will recover it): " +
            s"${e.getMessage}")
      }
    }
  }

  /** Synchronous publish attempts before deferring to reader-side
    * recovery; tests lower it to exercise the deferred tier.
    */
  protected def publishAttempts: Int = 3

  private def publish(k: String, stagedPath: String, dest: Path): Unit = {
    val staged = new Path(stagedPath)
    // CREATE-EXCLUSIVE copy, never overwrite: the coordinator admits
    // exactly one reservation per key, so every publisher of `k`
    // carries the SAME bytes and "destination exists" always means
    // "commit complete". Publishers DO race — the winner's deferred
    // retry against a reader-side recoverer, or two recoverers under
    // concurrent list()s (observed: a 3-JVM run where the loser of a
    // writeReplace rename race crashed its worker) — and the old
    // overwrite path (exists→delete→rename) additionally opened a
    // window where the loser DELETED the just-published destination
    // before re-renaming identical bytes, so an out-of-band reader
    // listing at that instant would miss the version. The exclusive
    // write loses at the kernel (hard-link/rename-NONE), keeping the
    // destination continuously present from first publish on.
    def completed(): Boolean =
      if (!superExists(dest)) false
      else { coordinator.markComplete(k); true }
    if (superExists(staged)) {
      try {
        publishCopy(dest, readLines(staged).filter(_.nonEmpty))
        coordinator.markComplete(k)
        delete(staged)
      } catch {
        case _: ConcurrentModificationException =>
          // a racing publisher of the same reservation won — same
          // bytes are at dest; finish the bookkeeping on its behalf
          coordinator.markComplete(k)
          delete(staged)
        case e: java.io.FileNotFoundException =>
          // the racing publisher also deleted `staged` under our read
          if (!completed()) throw e
      }
    } else if (!completed()) {
      throw new java.io.IOException(
        s"unrecoverable commit $k: staged object $stagedPath lost " +
        s"before publish")
    }
  }

  /** The staged→final copy: create-exclusive, never overwriting (see
    * [[publish]]). A seam for fault-injection tests; throws
    * [[ConcurrentModificationException]] when the destination exists.
    */
  protected def publishCopy(dest: Path, lines: Seq[String]): Unit =
    super.writeExclusive(dest, lines)

  /** Raw existence check (no recovery recursion). */
  private def superExists(p: Path): Boolean = super.exists(p)

  /** Complete any crashed publishes under `dir` so listings and reads
    * observe every reserved commit.
    */
  private def recoverUnder(dir: Path): Unit =
    coordinator.pendingUnder(key(dir) + "/").foreach { k =>
      coordinator.pending(k).foreach { staged =>
        publish(k, staged, new Path(k))
      }
    }

  private def recoverOne(path: Path): Unit =
    coordinator.pending(key(path)).foreach(s => publish(key(path), s, path))

  override def readLines(path: Path): Seq[String] = {
    recoverOne(path)
    super.readLines(path)
  }

  override def exists(path: Path): Boolean = {
    recoverOne(path)
    super.exists(path)
  }

  override def list(dir: Path): Seq[FileStatus] = {
    recoverUnder(dir)
    // staging litter is invisible to the protocol
    super.list(dir).filterNot(_.getPath.getName.endsWith(".staged"))
  }
}
