package graft.tools

import java.util.ConcurrentModificationException

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import graft.vintage.{ConditionalPutLogStore, FileCommitCoordinator}

/** One competing committer process for the multi-process conditional-put
  * stress (MultiProcessCommitSpec spawns three of these as REAL JVMs):
  * appends `n` commits to a shared log directory through a
  * [[ConditionalPutLogStore]] backed by the shared
  * [[FileCommitCoordinator]], retrying the standard concurrent-commit
  * error exactly like the table commit loop does. No Spark — this
  * stresses the log protocol layer itself, which is where a lost write
  * or double-publish would originate.
  *
  * Args: coordinatorDir logDir workerId nCommits
  */
object CommitWorker {
  private val VersionFileRe = """(\d{20})\.json""".r

  def main(args: Array[String]): Unit = {
    val Array(coordDir, logDirStr, workerId, nStr) = args
    val n = nStr.toInt
    val store = new ConditionalPutLogStore(new Configuration(),
      new FileCommitCoordinator(coordDir))
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
