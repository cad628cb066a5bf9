package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class DsirSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("bigramsOf emits adjacent pairs and empty below two tokens") {
    val out = Seq("a b c d", "solo", "x y", "")
      .toDF("text")
      .select(Dsir.bigramsOf(TextAnalysis.tokens(col("text"))).as("bg"))
      .as[Seq[String]].collect()
    assert(out(0) == Seq("a b", "b c", "c d"))
    assert(out(1) == Seq.empty)
    assert(out(2) == Seq("x y"))
    assert(out(3) == Seq.empty)
  }

  // Scalar model of the whole pipeline, computed independently.
  private def scalarWeights(raw: Seq[(Long, String)], target: Seq[String],
      m: Int): Map[Long, (Long, Long)] = {
    def toks(s: String) = s.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
    def bgs(s: String) = { val t = toks(s); t.zip(t.drop(1)).map { case (a, b) => s"$a $b" } }
    def bucket(bg: String): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(bg.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(md.take(6), 16) % m).toInt
    }
    val tc = target.flatMap(bgs).map(bucket).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rAll = raw.map { case (id, s) => id -> bgs(s).map(bucket) }
    val rc = rAll.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tt = tc.values.sum; val rt = rc.values.sum
    val lr = rc.map { case (b, cr) =>
      b -> BigDecimal((math.log(tc.getOrElse(b, 0L) + 1.0) - math.log(tt + m.toDouble)
        - math.log(cr + 1.0) + math.log(rt + m.toDouble)) * 10000)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    rAll.map { case (id, bs) =>
      id -> (bs.length.toLong, bs.map(lr).sum)
    }.toMap
  }

  private val target = Seq("spark table scan", "spark table merge scan",
    "query table spark")
  private val raw = Seq(
    1L -> "spark table scan table",
    2L -> "video frame audio frame",
    3L -> "spark query table scan merge",
    4L -> "audio codec video stream frame")

  test("weights match the independent scalar model exactly") {
    val out = Dsir.importanceWeights(
        raw.toDF("doc_id", "text"), target.map(Tuple1(_)).toDF("text")
          .withColumn("doc_id", lit(0L)),
        "doc_id", "text", m = 64, keep = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == scalarWeights(raw, target, 64))
  }

  test("selected flags exactly the top-keep by (weight desc, id)") {
    val out = Dsir.importanceWeights(
        raw.toDF("doc_id", "text"), target.map(Tuple1(_)).toDF("text")
          .withColumn("doc_id", lit(0L)),
        "doc_id", "text", m = 64, keep = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getInt(3)))
    val expect = out.sortBy { case (id, w, _) => (-w, id) }
      .zipWithIndex.map { case ((id, _, _), i) => id -> (if (i < 2) 1 else 0) }.toMap
    assert(out.map(t => t._1 -> t._3).toMap == expect)
    // target-like docs must outrank the off-domain ones
    val sel = out.filter(_._3 == 1).map(_._1).toSet
    assert(sel == Set(1L, 3L))
  }

  test("the fitted model rides a broadcast to the scoring join") {
    val plan = Dsir.importanceWeights(
        raw.toDF("doc_id", "text"), target.map(Tuple1(_)).toDF("text")
          .withColumn("doc_id", lit(0L)),
        "doc_id", "text", m = 64, keep = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected broadcast scoring join:\n$plan")
  }
}
