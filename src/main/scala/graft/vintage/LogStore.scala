package graft.vintage

import java.nio.charset.StandardCharsets
import java.util.ConcurrentModificationException

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileAlreadyExistsException, FileContext, FileStatus, FileSystem, Path}

/** Storage abstraction for the transaction log — the one place that
  * needs put-if-absent semantics (the optimistic-concurrency core of a
  * Delta-style protocol). Everything goes through the Hadoop
  * `FileSystem`/`FileContext` API so a table can live on `file://`,
  * `hdfs://` or any mounted Hadoop-compatible store; an object store
  * without atomic rename (raw S3) would plug in a conditional-put
  * implementation of this trait.
  */
trait LogStore {
  /** All lines of `path` (UTF-8). */
  def readLines(path: Path): Seq[String]

  /** Atomically publish `lines` at `path`; throws
    * [[ConcurrentModificationException]] if `path` already exists.
    */
  def writeExclusive(path: Path, lines: Seq[String]): Unit

  /** Overwrite-allowed write (checkpoints, `_last_checkpoint`). */
  def writeReplace(path: Path, lines: Seq[String]): Unit

  def list(dir: Path): Seq[FileStatus]
  def exists(path: Path): Boolean
  def isDirectory(path: Path): Boolean
  def mkdirs(dir: Path): Unit
  def delete(path: Path): Unit

  /** Hadoop configuration for binary side-files written NEXT TO the
    * log (parquet checkpoints go through parquet-java's own IO, not
    * the line-oriented methods above, but must resolve the same
    * filesystems/credentials this store uses). Stores on backends
    * without a Hadoop FS view should override and route checkpoints
    * to a Hadoop-visible location.
    */
  def hadoopConf: Configuration = new Configuration()
}

/** Hadoop-FS log store: stage to a temp file in the same directory,
  * publish with a no-overwrite rename (`Options.Rename.NONE` via
  * `FileContext`, which fails when the destination exists — atomic on
  * HDFS and POSIX local FS).
  */
class HadoopLogStore(conf: Configuration) extends LogStore {
  private def fs(p: Path): FileSystem = p.getFileSystem(conf)

  override def hadoopConf: Configuration = conf

  override def readLines(path: Path): Seq[String] = {
    def readOnce(): Seq[String] = {
      val in = fs(path).open(path)
      try {
        val bytes = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](64 * 1024)
        var n = in.read(buf)
        while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
        new String(bytes.toByteArray, StandardCharsets.UTF_8)
          .split("\n", -1).toSeq
      } finally in.close()
    }
    // ChecksumFileSystem (local FS in tests) races its .crc sidecar
    // against concurrent committers: the DATA file is published by one
    // atomic rename, but the sidecar moves separately, and a losing
    // racer can leave the pair mismatched for good. Retry briefly for
    // the transient window, then fall back to a checksum-DISABLED read
    // on a private FS instance (never flip the shared cached one):
    // the data rename's atomicity is what the log's correctness rests
    // on; the local-FS sidecar is advisory. Object stores have no
    // sidecar — none of this fires there.
    var attempt = 0
    while (true) {
      try return readOnce()
      catch {
        case _: org.apache.hadoop.fs.ChecksumException if attempt < 3 =>
          attempt += 1
          Thread.sleep(50L * attempt)
        case _: org.apache.hadoop.fs.ChecksumException =>
          val raw = FileSystem.newInstance(path.toUri, conf)
          try {
            raw.setVerifyChecksum(false)
            val in = raw.open(path)
            try {
              val bytes = new java.io.ByteArrayOutputStream()
              val buf = new Array[Byte](64 * 1024)
              var n = in.read(buf)
              while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
              return new String(bytes.toByteArray, StandardCharsets.UTF_8)
                .split("\n", -1).toSeq
            } finally in.close()
          } finally raw.close()
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def writeTemp(path: Path, lines: Seq[String]): Path = {
    val tmp = new Path(path.getParent,
      s".${path.getName}.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    val out = fs(path).create(tmp, true)
    try out.write(lines.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
    finally out.close()
    tmp
  }

  override def writeExclusive(path: Path, lines: Seq[String]): Unit = {
    val tmp = writeTemp(path, lines)
    try {
      val scheme = Option(path.toUri.getScheme).getOrElse("file")
      if (scheme == "file") {
        // local FS: Hadoop's rename(Rename.NONE) is CHECK-then-rename —
        // two racers can both pass the exists check and the second
        // File.renameTo silently REPLACES the first's commit (a lost
        // write, observed under racing-committer stress). A hard link
        // is the kernel's atomic create-exclusive: exactly one racer
        // links the destination name, every other gets
        // FileAlreadyExistsException. The destination carries no .crc
        // sidecar, which also removes the checksum-pair race entirely.
        try java.nio.file.Files.createLink(
          java.nio.file.Paths.get(path.toUri.getPath),
          java.nio.file.Paths.get(tmp.toUri.getPath))
        catch {
          case _: java.nio.file.FileAlreadyExistsException =>
            throw new ConcurrentModificationException(s"already committed: $path")
          // file:// mounts without hard-link support (NFS/FUSE/exFAT):
          // fall back to the check-then-rename path rather than failing
          // every commit — but ONLY for genuine no-link-support. A blanket
          // FileSystemException catch (the r10 shape) silently rerouted
          // AccessDenied/NoSuchFile/etc. onto the non-atomic path on
          // exactly the mounts where the lost-write window matters
          // (ADVICE r11). UnsupportedOperationException is the JDK's
          // documented no-link signal; any other FileSystemException is
          // disambiguated by a cached per-directory link probe: probe
          // works => the original error was real, rethrow; probe fails
          // => the mount can't link, degrade loudly once.
          // FileAlreadyExistsException extends FileSystemException, so
          // it must be caught above.
          case _: UnsupportedOperationException =>
            HadoopLogStore.warnDegraded(path.getParent.toString, "UnsupportedOperationException")
            renameExclusive(tmp, path)
          case e: java.nio.file.FileSystemException =>
            if (HadoopLogStore.linkSupported(path.getParent.toUri.getPath)) throw e
            HadoopLogStore.warnDegraded(path.getParent.toString, e.toString)
            renameExclusive(tmp, path)
        }
      } else renameExclusive(tmp, path)
    } finally if (exists(tmp)) delete(tmp)
  }

  private def renameExclusive(tmp: Path, path: Path): Unit = {
    // HDFS & friends: rename NONE is atomic server-side
    val fc = FileContext.getFileContext(path.toUri, conf)
    try fc.rename(tmp, path) // Options.Rename.NONE: fails if path exists
    catch {
      case _: FileAlreadyExistsException | _: org.apache.hadoop.fs.PathExistsException =>
        throw new ConcurrentModificationException(s"already committed: $path")
      case e: java.io.IOException if exists(path) =>
        throw new ConcurrentModificationException(s"already committed: $path ($e)")
    }
  }

  override def writeReplace(path: Path, lines: Seq[String]): Unit = {
    val tmp = writeTemp(path, lines)
    val f = fs(path)
    if (f.exists(path)) f.delete(path, false)
    if (!f.rename(tmp, path))
      throw new java.io.IOException(s"rename $tmp -> $path failed")
  }

  override def list(dir: Path): Seq[FileStatus] =
    if (!exists(dir)) Nil else fs(dir).listStatus(dir).toSeq

  override def exists(path: Path): Boolean = fs(path).exists(path)
  override def isDirectory(path: Path): Boolean = {
    val f = fs(path)
    f.exists(path) && f.getFileStatus(path).isDirectory
  }
  override def mkdirs(dir: Path): Unit = fs(dir).mkdirs(dir)
  override def delete(path: Path): Unit = fs(path).delete(path, false)
}

object HadoopLogStore extends org.apache.spark.internal.Logging {
  // one hard-link probe result and at most one degradation warning per
  // log directory for the life of the JVM
  private val linkProbe =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()
  private val warned =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Whether `dir` supports hard links, probed with throwaway files —
    * distinguishes "this mount cannot link" (degrade to the rename
    * path) from a real per-file error like AccessDenied or a vanished
    * temp file (rethrow to the committer).
    *
    * Only a LINK-SPECIFIC failure caches a negative: createLink after
    * a successful probe-file write throwing UnsupportedOperationException
    * (the JDK's documented no-link signal) or an EPERM-class
    * FileSystemException. If the probe itself can't run (transient
    * ENOSPC/EIO writing the throwaway file, or a non-FileSystemException
    * IOException from createLink), NOTHING is cached and the result is
    * "inconclusive = treat as link-capable", so the caller rethrows the
    * ORIGINAL commit error and a later commit re-probes — a blanket
    * negative cache would permanently route a link-capable directory
    * onto the non-atomic rename path for the JVM lifetime (ADVICE r12).
    */
  private[vintage] def linkSupported(dir: String): Boolean = {
    val probed = linkProbe.computeIfAbsent(dir, d => {
      val tag = java.util.UUID.randomUUID().toString.take(8)
      val src = java.nio.file.Paths.get(d, s".graft-linkprobe-$tag.src")
      val dst = java.nio.file.Paths.get(d, s".graft-linkprobe-$tag.dst")
      try {
        val wrote =
          try { java.nio.file.Files.write(src, Array.emptyByteArray); true }
          catch { case _: java.io.IOException => false }
        if (!wrote) null // probe inconclusive — computeIfAbsent caches nothing
        else
          try {
            java.nio.file.Files.createLink(dst, src)
            java.lang.Boolean.TRUE
          } catch {
            case _: UnsupportedOperationException => java.lang.Boolean.FALSE
            // EPERM-class = a FileSystemException that is NOT one of
            // the per-file-state subclasses (NoSuchFile/AlreadyExists/
            // AccessDenied on the throwaway files — those must not
            // route the dir onto the rename path for the JVM
            // lifetime). Classification is by SUBCLASS, deliberately
            // not by getReason text: the reason is a localized
            // strerror ("Opération non permise"), so a string match
            // would leave non-English hosts permanently inconclusive —
            // rethrowing every commit error instead of degrading.
            case e: java.nio.file.FileSystemException
                if !e.isInstanceOf[java.nio.file.NoSuchFileException] &&
                   !e.isInstanceOf[java.nio.file.FileAlreadyExistsException] &&
                   !e.isInstanceOf[java.nio.file.AccessDeniedException] =>
              java.lang.Boolean.FALSE
            case _: java.io.IOException => null // inconclusive
          }
      } finally {
        try java.nio.file.Files.deleteIfExists(dst)
        catch { case _: java.io.IOException => () }
        try java.nio.file.Files.deleteIfExists(src)
        catch { case _: java.io.IOException => () }
      }
    })
    probed == null || probed.booleanValue()
  }

  private[vintage] def warnDegraded(dir: String, cause: String): Unit =
    if (warned.add(dir))
      logWarning(s"hard links unavailable in $dir ($cause): log commits " +
        "degrade to check-then-rename, which can LOSE a commit under " +
        "RACING committers on NFS/FUSE mounts — prefer a filesystem " +
        "with hard-link support or a conditional-put LogStore")
}

object LogStore {
  /** Default store: whatever FS the table path resolves to under the
    * default Hadoop configuration (local `file://` in tests).
    */
  lazy val default: LogStore = new HadoopLogStore(new Configuration())
}
