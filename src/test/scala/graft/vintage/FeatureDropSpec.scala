package graft.vintage

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Protocol downgrade (`dropFeature`): the sanctioned shrink. A table
  * that enabled a feature, stopped using it, and purged every physical
  * dependency can hand plain readers/writers a plain protocol again —
  * while refusing the drop whenever anything live would break.
  */
class FeatureDropSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def newDir(): String =
    Files.createTempDirectory("vintage-featuredrop").toString + "/t"

  test("deletionVectors drops only after a purge; history keeps the old gate") {
    val dir = newDir()
    val t = VintageTable.create(spark, dir,
      (1L to 40L).map(i => (i, s"v$i")).toDF("id", "v").repartition(4),
      properties = Map(DeletionVectors.EnabledProp -> "true"))
    t.delete(col("id") <= 5L) // lands as DVs, files stay
    assert(t.snapshot.files.exists(_.hasDv), "fixture must have live DVs")

    // refused while DVs are live — and the message says what to run
    val e = intercept[IllegalArgumentException] { t.dropFeature("deletionVectors") }
    assert(e.getMessage.contains("optimize"), e.getMessage)
    assert(t.snapshot.protocol.readerFeatures.contains("deletionVectors"))

    t.optimize() // rewrites every DV-carrying file
    assert(!t.snapshot.files.exists(_.hasDv))
    val vBeforeDrop = t.version
    t.dropFeature("deletionVectors")

    val snap = t.snapshot
    assert(!snap.protocol.readerFeatures.contains("deletionVectors") &&
      !snap.protocol.writerFeatures.contains("deletionVectors"),
      s"protocol still advertises DV: ${snap.protocol}")
    assert(!snap.properties.contains(DeletionVectors.EnabledProp),
      "activating property must leave in the same commit")
    assert(t.toDF.count() == 35)

    // a post-drop DELETE must take the copy-on-write path, not mint DVs
    t.delete(col("id") === 6L)
    assert(t.toDF.count() == 34)
    assert(!t.snapshot.files.exists(_.hasDv),
      "post-drop delete may not create deletion vectors")

    // time travel BEFORE the drop still sees (and is gated by) DV
    val old = VintageLog.replay(dir, Some(vBeforeDrop)).protocol
    assert(old.readerFeatures.contains("deletionVectors"),
      "history keeps the protocol it was committed under")
  }

  test("rowTracking drops cleanly; stamped ids become inert") {
    val dir = newDir()
    val t = VintageTable.create(spark, dir,
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"),
      properties = Map(RowTracking.EnabledProp -> "true"))
    t.append(Seq((3L, "c")).toDF("id", "v"))
    assert(t.snapshot.protocol.writerFeatures.contains("rowTracking"))

    t.dropFeature("rowTracking")
    val snap = t.snapshot
    assert(!snap.protocol.writerFeatures.contains("rowTracking"))
    assert(!snap.properties.contains(RowTracking.EnabledProp))
    // the table stays fully readable and writable
    t.append(Seq((4L, "d")).toDF("id", "v"))
    assert(t.toDF.count() == 4)
  }

  test("drops that would corrupt reads are refused outright") {
    val dir = newDir()
    val t = VintageTable.create(spark, dir, Seq((1L, "a")).toDF("id", "v"))
    t.enableColumnMapping()
    val e1 = intercept[IllegalArgumentException] { t.dropFeature("columnMapping") }
    assert(e1.getMessage.contains("physical"), e1.getMessage)

    // not-active feature: loud, names the protocol
    val e2 = intercept[IllegalArgumentException] { t.dropFeature("deletionVectors") }
    assert(e2.getMessage.contains("not active"), e2.getMessage)
  }

  test("a feature still required by metadata cannot be dropped") {
    val dir = newDir()
    val t = VintageTable.create(spark, dir, Seq((1L, "x")).toDF("id", "v"),
      properties = Map("vintage.identity.id" -> "1,1,false"))
    assert(t.snapshot.protocol.writerFeatures.contains("identityColumns"))
    // the identity column definition still derives the feature
    val e = intercept[IllegalArgumentException] { t.dropFeature("identityColumns") }
    assert(e.getMessage.contains("still required"), e.getMessage)
    assert(t.snapshot.protocol.writerFeatures.contains("identityColumns"))
  }

  test("explicitly-activated feature props are cleaned by the drop") {
    val dir = newDir()
    val t = VintageTable.create(spark, dir, Seq((1L, "a")).toDF("id", "v"))
    t.setProperties(Map(s"${Protocol.FeaturePropPrefix}rowTracking" -> "supported"))
    assert(t.snapshot.protocol.writerFeatures.contains("rowTracking"))
    t.dropFeature("rowTracking")
    assert(!t.snapshot.protocol.writerFeatures.contains("rowTracking"))
    assert(!t.snapshot.properties.keys.exists(_.startsWith(Protocol.FeaturePropPrefix)))
  }
}
