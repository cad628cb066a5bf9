package graft.tools

import java.nio.file.{Files, Paths}

import graft.SparkEntry

/** Dev CLI: dump SparkEntry.oracleSql as JSON without starting Spark —
  * lets scripts/check_oracle.py compare a RunOne dump against its
  * oracle. Usage: runMain graft.tools.DumpOracle <outFile> [names...]
  */
object DumpOracle {
  def main(args: Array[String]): Unit = {
    val out = args(0)
    val names = args.drop(1).toSet
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val picked = SparkEntry.oracleSql
      .filter { case (k, _) => names.isEmpty || names(k) }
    Files.writeString(Paths.get(out),
      picked.map { case (k, v) => s"${q(k)}: ${q(v)}" }
        .mkString("{", ",", "}"))
    println(s"wrote ${picked.size} oracle entries to $out")
  }
}
