package graft.vintage

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.{ParquetFileWriter, ParquetReader}
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupReadSupport}
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.schema.MessageTypeParser

/** Parquet serialization of checkpoint snapshots.
  *
  * A checkpoint at 100k commits carries the whole live file list — at
  * that scale a line-per-action JSON file costs O(list) uncompressed
  * driver text; Parquet gives column compression (paths and stats
  * share long prefixes) and a splittable container other engines and
  * distributed readers can scan (Delta's checkpoint format choice, for
  * the same reason). Schema: one row per action, with the exact
  * action JSON (the log's canonical, tested codec) plus typed columns
  * for the hot AddFile fields so a columnar consumer can read the
  * file list without touching JSON.
  *
  * Checkpoints are rewritable metadata, not commits, so writes go
  * temp-file + rename (readers never observe a partial file) rather
  * than through the LogStore's exclusive-publish protocol.
  */
private[vintage] object CheckpointCodec {

  private val schema = MessageTypeParser.parseMessageType(
    """message vintage_checkpoint {
      |  required binary action_type (UTF8);
      |  required binary json (UTF8);
      |  optional binary path (UTF8);
      |  optional int64 size;
      |  optional boolean data_change;
      |}""".stripMargin)

  private def actionType(a: Action): String = a match {
    case _: AddFile => "add"
    case _: RemoveFile => "remove"
    case _: Metadata => "metadata"
    case _: CommitInfo => "commit"
    case _: Txn => "txn"
    case _: IngestedFile => "ingest"
    case _: Protocol => "protocol"
    case _: RowIdHighWaterMark => "rowIdHwm"
  }

  def write(dest: Path, actions: Seq[Action], conf: Configuration): Unit = {
    val fs = dest.getFileSystem(conf)
    val tmp = new Path(dest.getParent,
      s".${dest.getName}.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    val writer = ExampleParquetWriter.builder(tmp)
      .withConf(conf)
      .withType(schema)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .withWriteMode(ParquetFileWriter.Mode.OVERWRITE)
      .build()
    val factory = new SimpleGroupFactory(schema)
    try actions.foreach { a =>
      val g = factory.newGroup()
        .append("action_type", actionType(a))
        .append("json", Action.toJsonLine(a))
      a match {
        case f: AddFile =>
          g.append("path", f.path)
            .append("size", f.size)
            .append("data_change", f.dataChange)
        case _ => ()
      }
      writer.write(g)
    } finally writer.close()
    if (fs.exists(dest)) fs.delete(dest, false)
    if (!fs.rename(tmp, dest))
      throw new java.io.IOException(s"rename $tmp -> $dest failed")
  }

  def read(src: Path, conf: Configuration): Seq[Action] = {
    val reader = ParquetReader
      .builder(new GroupReadSupport(), src)
      .withConf(conf)
      .build()
    val out = scala.collection.mutable.ArrayBuffer[Action]()
    try {
      var g = reader.read()
      while (g != null) {
        // lenient like the commit reader: the protocol gate in replay
        // makes skipping unknown future actions safe
        out ++= Action.fromJsonLineLenient(g.getString("json", 0))
        g = reader.read()
      }
    } finally reader.close()
    out.toSeq
  }
}
