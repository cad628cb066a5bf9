package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._
  import Multimodal._

  test("decodeMeta parses the header with pure expressions") {
    val media = synthesize(spark, 30)
    val meta = decodeMeta(media)
    assert(meta.filter(col("meta.magic") === "GRFT").count() == 30)
    val r = meta.filter(col("media_id") === 0)
      .select("meta.width", "meta.height", "meta.n_frames", "kind").head()
    assert(r.getInt(0) == 64 && r.getInt(1) == 64 && r.getInt(2) == 1)
    assert(meta.filter(col("kind") === "video")
      .filter(col("meta.n_frames") > 1).count() ==
      meta.filter(col("kind") === "video").count())
    // metadata-only projection prunes the blob from the scan
    val proj = meta.select("media_id", "meta.width")
    assert(!proj.schema.fieldNames.contains("bytes"))
  }

  test("extractFeatures: batch-shaped, deterministic, fixed dim") {
    val media = synthesize(spark, 30).repartition(4).as[MediaRecord]
    val f1 = extractFeatures(media, dim = 16).collect().sortBy(_.media_id)
    val f2 = extractFeatures(media, dim = 16).collect().sortBy(_.media_id)
    assert(f1.length == 30)
    assert(f1.forall(_.embedding.length == 16))
    assert(f1.map(_.embedding.toSeq).toSeq == f2.map(_.embedding.toSeq).toSeq,
      "features must be deterministic across runs")
    assert(f1.map(_.embedding.toSeq).distinct.length > 1)
  }

  test("resize rewrites header dims, payload length preserved") {
    val media = synthesize(spark, 9).as[MediaRecord]
    val sizes = media.collect().map(m => m.media_id -> m.bytes.length).toMap
    val out = decodeMeta(resize(media, 224, 224).toDF())
    assert(out.filter(col("meta.width") === 224 && col("meta.height") === 224)
      .count() == 9)
    out.select("media_id", "bytes").as[(Long, Array[Byte])].collect()
      .foreach { case (id, b) => assert(b.length == sizes(id)) }
  }

  test("sampleFrames yields every stride-th chunk") {
    val media = synthesize(spark, 6).filter(col("kind") === "video")
    val out = sampleFrames(media, stride = 2, frameBytes = 64)
    val r = out.select(col("media_id"), size(col("frames")).as("n"),
        length(col("bytes")).as("len")).collect()
    r.foreach { row =>
      val expected = math.floor((row.getInt(2) - 16) / 128.0).toInt + 1
      assert(row.getInt(1) == expected)
    }
    // frames are fixed-size slices (except possibly the tail)
    val first = out.select(expr("frames[0]")).as[Array[Byte]].head()
    assert(first.length == 64)
  }
}
