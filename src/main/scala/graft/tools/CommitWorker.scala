package graft.tools

import java.util.ConcurrentModificationException

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import graft.vintage.{ConditionalPutLogStore, FileCommitCoordinator, HadoopLogStore, LogStore}

/** One competing committer process for the multi-process commit
  * stress (MultiProcessCommitSpec spawns three of these as REAL JVMs):
  * appends `n` commits to a shared log directory, retrying the
  * standard concurrent-commit error exactly like the table commit
  * loop does. No Spark — this stresses the log protocol layer itself,
  * which is where a lost write or double-publish would originate.
  *
  * Two store kinds (5th arg, default `condput`):
  *  - `condput`: [[ConditionalPutLogStore]] backed by the shared
  *    [[FileCommitCoordinator]] — the object-store protocol;
  *  - `hadooplink`: plain [[HadoopLogStore]] — the hard-link
  *    put-if-absent path every production local-FS commit uses
  *    (coordinatorDir is ignored).
  *
  * Args: coordinatorDir logDir workerId nCommits [storeKind]
  */
object CommitWorker {
  private val VersionFileRe = """(\d{20})\.json""".r

  def main(args: Array[String]): Unit = {
    val (coordDir, logDirStr, workerId, nStr, kind) = args match {
      case Array(c, l, w, n)    => (c, l, w, n, "condput")
      case Array(c, l, w, n, k) => (c, l, w, n, k)
      case _ => sys.error(s"bad args: ${args.mkString(" ")}")
    }
    val n = nStr.toInt
    val store: LogStore = kind match {
      case "condput" => new ConditionalPutLogStore(new Configuration(),
        new FileCommitCoordinator(coordDir))
      case "hadooplink" => new HadoopLogStore(new Configuration())
      case other => sys.error(s"unknown store kind: $other")
    }
    val dir = new Path(logDirStr)
    var done = 0
    var attempts = 0
    while (done < n) {
      attempts += 1
      require(attempts < n * 1000, s"worker $workerId livelocked")
      val latest = store.list(dir).map(_.getPath.getName).collect {
        case VersionFileRe(v) => v.toLong
      }.foldLeft(-1L)(math.max)
      val target = new Path(dir, f"${latest + 1}%020d.json")
      try {
        store.writeExclusive(target,
          Seq(s"""{"worker":"$workerId","seq":$done}"""))
        done += 1
      } catch { case _: ConcurrentModificationException => () }
    }
    println(s"worker $workerId committed $n in $attempts attempts")
  }
}
