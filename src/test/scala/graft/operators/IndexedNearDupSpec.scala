package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The persisted-LSH-index tier ([[Dedup.signatureBuckets]] +
  * [[Dedup.nearDupAgainstIndex]], q126): the index a corpus stores
  * today must produce exactly the candidates the in-memory banding
  * would, and the incremental join must find new-batch near-dups
  * without re-shingling the stored corpus.
  */
class IndexedNearDupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val stored = Seq(
    (10L, "the quick brown fox jumps over the lazy dog again and again today"),
    (20L, "completely different content about spark query engines and columnar io"),
    (30L, "a third document that talks about minhash signatures and lsh banding"))
    .toDF("id", "text")

  test("signatureBuckets rows are bit-identical to bandedBuckets' keys") {
    // the persistence contract: an index written today joins candidates
    // tomorrow — so the stored (band, bucket) pairs must equal what the
    // in-memory pipeline computes, uncapped
    val fromIndex = Dedup.signatureBuckets(stored, "id", "text",
        shingleSize = 5, numHashes = 128, bands = 16)
      .select(col("id"), col("band"), col("bucket"))
      .as[(Long, Int, Long)].collect().toSet
    val fromPipeline = Dedup.bandedBuckets(
        Dedup.signatures(stored, "id", "text", 5, 128),
        bands = 16, rowsPerBand = 8, minSize = 1, maxBucketSize = 1000000)
      .select(col("__id"), col("__band"), col("__bucket"))
      .as[(Long, Int, Long)].collect().toSet
    assert(fromIndex == fromPipeline)
    assert(fromIndex.size == 3 * 16, "bands rows per stored doc")
  }

  test("nearDupAgainstIndex finds the planted near-dup through the stored index only") {
    val index = Dedup.signatureBuckets(stored, "id", "text")
    val batch = Seq(
      // near-dup of stored 10 (one trailing token perturbed)
      (101L, "the quick brown fox jumps over the lazy dog again and again todaX"),
      // unrelated new page
      (102L, "entirely novel text about watermark semantics in stream processing"))
      .toDF("id", "text")
    val hits = Dedup.nearDupAgainstIndex(
        batch, "id", "text", index, "id", stored, "text", threshold = 0.8)
      .select("new_id", "stored_id").as[(Long, Long)].collect().toSet
    assert(hits == Set((101L, 10L)), s"expected exactly the planted hit, got $hits")
  }

  test("degenerate index buckets are dropped by the cap before any pair forms") {
    // 50 stored docs with IDENTICAL text: every band bucket holds 50
    // rows; cap 10 must drop them all, so even an exact copy in the
    // batch yields no candidates (and the unrelated doc never pairs)
    val degen = spark.range(0, 50)
      .select(col("id"),
        lit("the same degenerate boilerplate text repeated across the corpus here").as("text"))
    val index = Dedup.signatureBuckets(degen.toDF(), "id", "text")
    val batch = Seq(
      (900L, "the same degenerate boilerplate text repeated across the corpus here"))
      .toDF("id", "text")
    val hits = Dedup.nearDupAgainstIndex(
      batch, "id", "text", index, "id", degen.toDF(), "text",
      threshold = 0.8, maxBucketSize = 10)
    assert(hits.count() == 0L)
  }
}
