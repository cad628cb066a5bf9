package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Regenerate `graft/lang_profiles.dat` from `graft/lang_samples.dat`
  * through the engine's own gram/bucket pipeline
  * ([[graft.operators.LangProfiles.renderProfiles]]). Run after
  * editing the samples; commit both files. LangProfilesSpec fails the
  * build if they drift.
  *
  * Usage: `runMain graft.tools.GenLangProfiles [outPath]`
  * (default `src/main/resources/graft/lang_profiles.dat`).
  */
object GenLangProfiles {
  def main(args: Array[String]): Unit = {
    val out = Paths.get(args.headOption
      .getOrElse("src/main/resources/graft/lang_profiles.dat"))
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("GRAFT_GEN_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .appName("graft-gen-lang-profiles")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val content = graft.operators.LangProfiles.renderProfiles(spark)
      Files.createDirectories(out.getParent)
      Files.write(out, content.getBytes(StandardCharsets.UTF_8))
      println(s"wrote ${out.toAbsolutePath} (${content.linesIterator.size} lines)")
    } finally spark.stop()
  }
}
