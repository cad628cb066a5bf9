package graft.vintage

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Property-style test (SURVEY §5 item 3): random sequences of
  * merge/delete/update/overwrite/append against an in-memory
  * Map[key, value] model. Invariant: after every operation the table
  * equals the model, and `toDFAsOf(v)` equals the model's recorded
  * state after operation v — i.e. the transaction log is a faithful,
  * time-travelable history under arbitrary op interleavings.
  */
class VintagePropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def tableState(t: VintageTable): Map[Long, Double] =
    t.toDF.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("parallel appenders all land through the optimistic retry loop") {
    import spark.implicits._
    val dir = Files.createTempDirectory("vintage-prop").toString + "/conc"
    val t = VintageTable.create(spark, dir,
      Seq((0L, -1L)).toDF("k", "writer").coalesce(1))
    val threads = 4; val perThread = 5
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val pool = (0 until threads).map { w =>
      new Thread(() =>
        try {
          (0 until perThread).foreach { i =>
            VintageTable.forPath(spark, dir)
              .append(Seq((w * 100L + i, w.toLong)).toDF("k", "writer").coalesce(1))
          }
        } catch { case e: Throwable => errors.add(e) })
    }
    // generous join bound: under a fully-loaded suite JVM (GC + many
    // sequential Spark jobs) the 4x5 append schedule has been observed
    // to outlast 120 s while still completing correctly
    pool.foreach(_.start()); pool.foreach(_.join(300000))
    assert(pool.forall(!_.isAlive), "a writer thread is still running after join timeout")
    assert(errors.isEmpty, s"concurrent appends failed: ${errors.peek()}")
    // every append became exactly one commit; no writes lost
    assert(t.version == threads * perThread)
    assert(t.toDF.count() == 1 + threads * perThread)
    val byWriter = t.toDF.groupBy("writer").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0 until threads).foreach(w => assert(byWriter(w.toLong) == perThread))
  }

  test("commit timestamps are strictly monotonic under rapid commits") {
    import spark.implicits._
    val dir = Files.createTempDirectory("vintage-prop").toString + "/ict"
    val t = VintageTable.create(spark, dir,
      Seq((0L, 0L)).toDF("k", "v").coalesce(1))
    // many commits inside a few clock milliseconds: without the
    // in-commit-timestamp clamp, same-ms ties make TIMESTAMP AS OF
    // resolution ambiguous
    (1 to 12).foreach(i =>
      t.append(Seq((i.toLong, i.toLong)).toDF("k", "v").coalesce(1)))
    val ts = t.snapshot.commits.sortBy(_.version).map(_.timestamp)
    assert(ts == ts.sorted && ts.distinct.size == ts.size,
      s"commit timestamps must strictly increase, got $ts")
    // timestamp time travel lands on exactly one version per instant
    ts.zipWithIndex.foreach { case (x, v) =>
      assert(VintageLog.versionAtTimestamp(dir, x) == v.toLong)
    }
  }

  test("random op sequences match an in-memory model, incl. time travel") {
    randomOpsMatchModel(Map.empty)
  }

  test("random op sequences on a DELETION-VECTOR table match the model") {
    // same seed and sequence; delete/update take the merge-on-read
    // path, so the model equivalence (incl. time travel and the change
    // feed) now exercises DV write, DV read, and DV change-diffing
    // under arbitrary interleavings
    randomOpsMatchModel(Map(DeletionVectors.EnabledProp -> "true"))
  }

  test("random op sequences under a TINY inline-DV budget match the model") {
    // per-file cap high, commit-wide budget tiny: every multi-file
    // delete/update demotes most vectors to RLE sidecars and the
    // sticky-sidecar rule keeps them there — model equivalence, time
    // travel, and the change feed all pin the demotion machinery
    // under arbitrary interleavings
    randomOpsMatchModel(Map(
      DeletionVectors.EnabledProp -> "true",
      DeletionVectors.MaxInlineProp -> "1000000",
      DeletionVectors.MaxInlineTotalProp -> "2"))
  }

  test("random op sequences on a ROW-TRACKED table keep ids unique and stable") {
    // same seed and sequence with row tracking + DVs on: after every
    // op, all row ids are unique; after merge-on-read delete/update,
    // surviving keys KEEP their ids; layout rewrites preserve them all
    randomOpsMatchModel(Map(
      RowTracking.EnabledProp -> "true",
      DeletionVectors.EnabledProp -> "true"), trackRowIds = true)
  }

  test("random op sequences through native SQL row-level DML match the model") {
    // same seed and sequence, but merge/delete/update run as SQL
    // MERGE INTO / DELETE / UPDATE through the catalog — the
    // SupportsDelta WriteDelta path (the DELETE carries an
    // untranslatable conjunct so the metadata path cannot take it) —
    // so model equivalence, time travel, and the change feed all pin
    // the native row-level machinery under arbitrary interleavings
    randomOpsMatchModel(Map.empty, viaSql = true)
  }

  private def randomOpsMatchModel(properties: Map[String, String],
      viaSql: Boolean = false, trackRowIds: Boolean = false): Unit = {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val wh = Files.createTempDirectory("vintage-prop").toString
    val dir = wh + "/t"
    if (viaSql) {
      spark.conf.set("spark.sql.catalog.propsql",
        "graft.vintage.connector.VintageCatalog")
      spark.conf.set("spark.sql.catalog.propsql.warehouse", wh)
    }

    def df(m: Map[Long, Double]) = m.toSeq.toDF("k", "v").coalesce(2)

    var model = (1L to 20L).map(k => k -> rnd.nextDouble()).toMap
    val t = VintageTable.create(spark, dir, df(model), properties = properties)
    val history = scala.collection.mutable.ArrayBuffer[Map[Long, Double]](model)
    def rowIds(t: VintageTable): Map[Long, Long] =
      t.toDFWithRowIds.select(col("k"), col(RowTracking.RowIdCol))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    var prevIds: Map[Long, Long] =
      if (trackRowIds) rowIds(t) else Map.empty

    val ops = scala.collection.mutable.ArrayBuffer[Int]()
    (1 to 15).foreach { step =>
      val op = rnd.nextInt(5)
      ops += op
      op match {
        case 0 => // merge: update some existing + insert some new keys
          val upd = model.keys.toSeq.sorted.take(rnd.nextInt(5) + 1)
            .map(k => k -> rnd.nextDouble()).toMap
          val ins = (1 to rnd.nextInt(3) + 1)
            .map(_ => (model.keys.max + rnd.nextInt(100) + 1) -> rnd.nextDouble()).toMap
          val src = (upd ++ ins).toSeq.toDF("k", "v")
          if (viaSql) {
            src.createOrReplaceTempView("__prop_src")
            spark.sql(
              """MERGE INTO propsql.t t USING __prop_src s ON t.k = s.k
                |WHEN MATCHED THEN UPDATE SET *
                |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
          } else
            t.as("t").merge(src.as("s"), "t.k = s.k")
              .whenMatched().updateAll().whenNotMatched().insertAll().execute()
          model = model ++ upd ++ ins
        case 1 => // conditional delete
          val cut = model.keys.toSeq.sorted.drop(model.size / 2).headOption.getOrElse(0L)
          if (viaSql) // pmod() is filter-untranslatable: forces WriteDelta
            spark.sql(s"DELETE FROM propsql.t WHERE k >= $cut AND pmod(k, 1) = 0")
          else t.delete(col("k") >= cut)
          model = model.filter(_._1 < cut)
        case 2 => // conditional update
          val cut = model.keys.toSeq.sorted.take(model.size / 2).lastOption.getOrElse(0L)
          if (viaSql) spark.sql(s"UPDATE propsql.t SET v = -1.0 WHERE k <= $cut")
          else t.update(col("k") <= cut, Map("v" -> lit(-1.0)))
          model = model.map { case (k, v) => k -> (if (k <= cut) -1.0 else v) }
        case 3 => // full replacement
          model = (1L to (rnd.nextInt(20) + 5).toLong)
            .map(k => k -> rnd.nextDouble()).toMap
          t.overwrite(df(model))
        case 4 => // append fresh keys
          val ins = (1 to rnd.nextInt(4) + 1)
            .map(i => (model.keys.max + 10 * i + rnd.nextInt(9) + 1) -> rnd.nextDouble()).toMap
          t.append(df(ins))
          model = model ++ ins
      }
      assert(tableState(t) == model, s"state mismatch after step $step")
      assert(t.version == step.toLong, s"one commit per op expected")
      if (trackRowIds) {
        val now = rowIds(t)
        assert(now.values.toSeq.distinct.size == now.size,
          s"duplicate row ids after step $step ($op): $now")
        // STABILITY: delete/update (merge-on-read or rewrite) and
        // merge all materialize ids through their rewrites, so every
        // surviving key keeps its id; only overwrite (op 3) replaces
        // the row set wholesale and re-allocates
        if (op != 3)
          now.foreach { case (k, id) =>
            assert(prevIds.get(k).forall(_ == id),
              s"row id of surviving key $k moved under op $op at step $step")
          }
        prevIds = now
      }
      history += model
    }

    // time travel: every recorded version equals its model state
    history.zipWithIndex.foreach { case (m, v) =>
      val got = t.toDFAsOf(v).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(got == m, s"time travel to v$v diverged from model")
    }

    // change feed: for every commit, changes(v-1, v) must equal the
    // model's row-set diff — nothing from the copy-on-write rewrite
    // noise. On a ROW-TRACKED table a key surviving with a changed
    // value is the SAME row id through the rewrite, so it must
    // classify as update_preimage/update_postimage — except under a
    // full overwrite (op 3), which replaces the row set wholesale and
    // re-allocates ids, degrading every changed row to delete+insert
    history.toSeq.sliding(2).zipWithIndex.foreach { case (Seq(prev, cur), i) =>
      val v = (i + 1).toLong
      val ch = t.changes(v - 1, v).collect().map { r =>
        (r.getLong(r.fieldIndex("k")), r.getDouble(r.fieldIndex("v")),
          r.getString(r.fieldIndex("_change_type")))
      }.toSet
      val expIns = (cur.keySet -- prev.keySet).map(k => (k, cur(k), "insert"))
      val expDel = (prev.keySet -- cur.keySet).map(k => (k, prev(k), "delete"))
      val changed = (prev.keySet & cur.keySet).filter(k => prev(k) != cur(k))
      val expChg: Set[(Long, Double, String)] =
        if (trackRowIds && ops(i) != 3)
          changed.flatMap(k => Seq((k, prev(k), "update_preimage"),
            (k, cur(k), "update_postimage")))
        else
          changed.flatMap(k => Seq((k, prev(k), "delete"),
            (k, cur(k), "insert")))
      assert(ch == expIns ++ expDel ++ expChg,
        s"change feed diverged from model diff at v$v (op ${ops(i)})")
    }

    // compaction + vacuum never change the logical state
    val idsBeforeCompact = if (trackRowIds) rowIds(t) else Map.empty[Long, Long]
    t.compact(2)
    assert(tableState(t) == model)
    assert(t.toDFAsOf(3).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      == history(3))
    if (trackRowIds)
      assert(rowIds(t) == idsBeforeCompact,
        "layout rewrite must materialize and preserve every row id")
  }
}
