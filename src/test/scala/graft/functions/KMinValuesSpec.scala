package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class KMinValuesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def kmv(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy("g")
      .agg(KMinValues.kmvMinK(col("v"), k).as("s"))
      .select(col("g"), col("s.n_min"), col("s.kth"))
      .collect()
      .map(r => r.getString(0) -> (r.getInt(1), if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .toMap

  test("kth smallest distinct value, exact against the brute-force model") {
    // duplicated, unordered values across several groups
    val rows = for {
      g <- Seq("a", "b"); i <- 0 until 500
    } yield (g, ((i * 2654435761L) % 10007L) % 300L) // ~300 distinct, many dups
    val got = kmv(rows.toDF("g", "v"), k = 16)
    for (g <- Seq("a", "b")) {
      val distinct = rows.filter(_._1 == g).map(_._2).distinct.sorted
      assert(got(g) == ((16, Some(distinct(15)))), g)
    }
  }

  test("fewer than k distinct values: n_min is the exact count, kth is NULL") {
    val rows = Seq.fill(100)("a").zipWithIndex.map { case (g, i) => (g, (i % 7).toLong) }
    val got = kmv(rows.toDF("g", "v"), k = 64)
    assert(got("a") == ((7, None)))
  }

  test("partition-invariant: partial merge across many shuffles equals one pass") {
    val rows = (0 until 2000).map(i => ("g", (i * 7919L) % 555L))
    val one = kmv(rows.toDF("g", "v").coalesce(1), k = 32)
    val many = kmv(rows.toDF("g", "v").repartition(17), k = 32)
    assert(one == many)
    val distinct = rows.map(_._2).distinct.sorted
    assert(one("g") == ((32, Some(distinct(31)))))
  }

  test("registered as a SQL aggregate: kmv_mink(hash, k) from spark.sql") {
    (0 until 400).map(i => ("g", (i * 7919L) % 97L)).toDF("g", "v")
      .createOrReplaceTempView("kmv_in")
    val r = spark.sql(
      "SELECT g, kmv_mink(v, 8).n_min AS n, kmv_mink(v, 8).kth AS kth " +
      "FROM kmv_in GROUP BY g").head()
    val distinct = (0 until 400).map(i => (i * 7919L) % 97L).distinct.sorted
    assert(r.getInt(1) == 8 && r.getLong(2) == distinct(7))
  }

  test("estimator recovers cardinality within KMV error bounds") {
    // 10k distinct uniform-ish 48-bit hashes via the md5 path q56 uses
    val df = (0 until 10000).map(i => ("g", s"tok$i")).toDF("g", "t")
      .select(col("g"), conv(substring(md5(col("t")), 1, 12), 16, 10).cast("long").as("v"))
    val r = df.groupBy("g").agg(KMinValues.kmvMinK(col("v"), 256).as("s"))
      .select(col("s.kth")).head().getLong(0)
    val est = 255.0 * 281474976710656.0 / r
    // stderr ≈ 1/sqrt(k-2) ≈ 6.3%; allow 4 sigma
    assert(math.abs(est - 10000.0) / 10000.0 < 0.25, est)
  }

  test("kmv_minarray emits the sorted k smallest distinct; merging arrays = sketch of the union") {
    val a = (1 to 50).map(i => ("a", i * 7L)) // distinct multiples of 7
    val b = (1 to 50).map(i => ("b", i * 11L))
    val df = (a ++ b ++ a).toDF("g", "v") // duplicates must not matter
    val arrs = df.groupBy("g")
      .agg(KMinValues.kmvMinArray(col("v"), 16).as("arr"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(arrs("a") == (1 to 16).map(_ * 7L))
    assert(arrs("b") == (1 to 16).map(_ * 11L))
    // array-algebra merge equals the sketch computed over the union
    val mergedViaArrays = (arrs("a") ++ arrs("b")).distinct.sorted.take(16)
    val direct = df.select(lit("u").as("g"), col("v"))
      .groupBy("g").agg(KMinValues.kmvMinArray(col("v"), 16).as("arr"))
      .head().getSeq[Long](1)
    assert(mergedViaArrays == direct,
      s"merge of k-min lists must be the union's k-min list: $mergedViaArrays vs $direct")
    // under-k groups carry their complete (exact) distinct set
    val tiny = Seq(("t", 5L), ("t", 3L), ("t", 5L)).toDF("g", "v")
      .groupBy("g").agg(KMinValues.kmvMinArray(col("v"), 16).as("arr"))
      .head().getSeq[Long](1)
    assert(tiny == Seq(3L, 5L))
  }
}
