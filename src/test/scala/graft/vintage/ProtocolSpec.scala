package graft.vintage

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Table-features protocol: feature activation rides the activating
  * commit, lesser readers/writers stop at the gate, unknown actions
  * skip safely under a satisfied protocol.
  */
class ProtocolSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def newDir(): String =
    Files.createTempDirectory("vintage-proto").toString + "/t"

  test("feature activation: DV property and column mapping grow the protocol") {
    val dir = newDir()
    val t = VintageTable.create(spark, dir, Seq((1L, "a")).toDF("id", "v"))
    assert(t.snapshot.protocol.readerFeatures.isEmpty,
      "plain table needs no reader features")
    t.setProperties(Map(DeletionVectors.EnabledProp -> "true"))
    assert(t.snapshot.protocol.readerFeatures.contains("deletionVectors"))
    t.enableColumnMapping()
    assert(t.snapshot.protocol.readerFeatures.contains("columnMapping"))
    // features never retract, even when the property is flipped off
    t.setProperties(Map(DeletionVectors.EnabledProp -> "false"))
    assert(t.snapshot.protocol.readerFeatures.contains("deletionVectors"))
  }

  test("identity and generated columns activate writer features at create") {
    val dir = newDir()
    VintageTable.create(spark, dir, Seq((1L, "x")).toDF("id", "v"),
      properties = Map("vintage.identity.id" -> "1,1,false"))
    val p = VintageLog.replay(dir).protocol
    assert(p.writerFeatures.contains("identityColumns"))
    assert(!p.readerFeatures.contains("identityColumns"),
      "identity is writer-only: any reader can scan the BIGINTs")
  }

  test("activating an unknown feature name is rejected, not bricked-in") {
    val dir = newDir()
    val t = VintageTable.create(spark, dir, Seq((1L, "a")).toDF("id", "v"))
    // a typo'd feature property must fail THIS commit — accepted, it
    // would land in writerFeatures forever and block every later write
    val e = intercept[IllegalArgumentException] {
      t.setProperties(Map("vintage.feature.typewidening" -> "supported"))
    }
    assert(e.getMessage.contains("unknown table feature"), e.getMessage)
    // the table stays writable
    t.append(Seq((2L, "b")).toDF("id", "v"))
    assert(t.toDF.count() == 2)
  }

  test("unknown READER feature fails the read loudly") {
    val dir = newDir()
    VintageTable.create(spark, dir, Seq((1L, "a")).toDF("id", "v"))
    VintageLog.commit(dir, 1L, Seq(
      CommitInfo(1L, System.currentTimeMillis(), "UPGRADE"),
      Protocol(readerFeatures = Seq("futureDvFormatV9"),
        writerFeatures = Seq("futureDvFormatV9"))))
    VintageLog.clearSnapshotCache()
    val e = intercept[java.io.IOException] { VintageLog.replay(dir) }
    assert(e.getMessage.contains("futureDvFormatV9"), e.getMessage)
    // time travel BEFORE the upgrade still reads fine
    assert(VintageLog.replay(dir, Some(0L)).files.nonEmpty)
  }

  test("unknown WRITER feature blocks commits but not reads") {
    val dir = newDir()
    val t = VintageTable.create(spark, dir, Seq((1L, "a")).toDF("id", "v"))
    VintageLog.commit(dir, 1L, Seq(
      CommitInfo(1L, System.currentTimeMillis(), "UPGRADE"),
      Protocol(readerFeatures = Nil, writerFeatures = Seq("futureWriterOnly"))))
    VintageLog.clearSnapshotCache()
    assert(t.toDF.count() == 1, "writer-only features never block reads")
    val e = intercept[UnsupportedOperationException] {
      t.append(Seq((2L, "b")).toDF("id", "v"))
    }
    assert(e.getMessage.contains("futureWriterOnly"), e.getMessage)
  }

  test("unknown actions skip under a satisfied protocol; checkpoint keeps it") {
    val dir = newDir()
    val t = VintageTable.create(spark, dir, Seq((1L, "a")).toDF("id", "v"))
    // a future writer appended an action type this generation has
    // never seen, with no protocol bump (= read semantics unchanged)
    VintageLog.commit(dir, 1L, Seq(
      CommitInfo(1L, System.currentTimeMillis(), "FUTURE"),
      Metadata(t.snapshot.schema.json, t.snapshot.properties, Nil)))
    val raw = new java.io.File(s"$dir/_vintage_log/${"%020d".format(2)}.json")
    Files.writeString(raw.toPath,
      """{"commitInfo":{"version":2,"timestamp":1,"operation":"FUTURE2"}}""" +
        "\n" + """{"futureAction":{"mystery":true}}""" + "\n")
    VintageLog.clearSnapshotCache()
    assert(VintageLog.replay(dir).version == 2L)
    assert(t.toDF.count() == 1)
    // checkpoints carry the protocol through log truncation
    (1 to 10).foreach(i => t.append(Seq((i + 1L, s"r$i")).toDF("id", "v")))
    t.setProperties(Map(DeletionVectors.EnabledProp -> "true"))
    (1 to 10).foreach(i => t.append(Seq((100 + i.toLong, s"s$i")).toDF("id", "v")))
    VintageLog.clearSnapshotCache()
    assert(t.snapshot.protocol.readerFeatures.contains("deletionVectors"),
      "protocol must survive checkpoint-based replay")
  }
}
