package graft.streaming

import scala.collection.mutable.ArrayBuffer

import graft.{GraftSparkSpec, Tables}
import graft.lake.GraftTable
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}

/** GraftLake as a streaming *source* (SURVEY §2.7 ST6): initial batch
  * is the table snapshot, later batches emit exactly the new commits'
  * files; OPTIMIZE commits (dataChange=false) are invisible; CoW
  * rewrites fail the stream unless ignoreChanges=true.
  */
class GraftSourceSpec extends GraftSparkSpec {

  /** One AvailableNow run against `path`: (emitted rows, #batches). */
  private def runCounting(path: String, ckpt: String,
                          opts: Map[String, String] = Map.empty): (Seq[Row], Int) = {
    val got = ArrayBuffer.empty[Row]
    var batches = 0
    val q = spark.readStream.format("graftlake").options(opts).load(path)
      .writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        got.synchronized { got ++= batch.collect(); batches += 1 }
        ()
      }.start()
    q.awaitTermination(120000)
    (got.toSeq, batches)
  }

  private def runOnce(path: String, ckpt: String,
                      opts: Map[String, String] = Map.empty): Seq[Row] =
    runCounting(path, ckpt, opts)._1

  test("sink refuses to start without a per-query dedup identity") {
    // falling back to the table path would let two queries writing the
    // same table share (appId, epoch) and silently drop batches
    val e = intercept[IllegalArgumentException] {
      new GraftSink(spark, tmpDir("sink-noid"), Map.empty)
    }
    assert(e.getMessage.contains("checkpointLocation"))
    // either identity option satisfies it
    new GraftSink(spark, tmpDir("sink-qid"), Map("queryId" -> "q1"))
    new GraftSink(spark, tmpDir("sink-ckpt"),
      Map("checkpointLocation" -> tmpDir("sink-ckpt-loc")))
  }

  test("initial snapshot, then incremental batches; OPTIMIZE invisible") {
    val orders = Tables(spark, sfDir, "orders")
    val first = orders.filter(col("o_orderkey") % 3 === 0)
    val second = orders.filter(col("o_orderkey") % 3 === 1)
    val path = tmpDir("gsrc-table")
    val ckpt = tmpDir("gsrc-ckpt")
    val t = GraftTable.create(spark, path, first)

    val b1 = runOnce(path, ckpt)
    assert(b1.size == first.count())

    t.append(second)
    t.optimize() // dataChange=false adds must not re-emit snapshot rows
    val b2 = runOnce(path, ckpt)
    assert(b2.size == second.count())

    // no new commits: zero new rows
    assert(runOnce(path, ckpt).isEmpty)

    // full content check across the two data batches
    val streamed = spark.createDataFrame(
      spark.sparkContext.parallelize(b1 ++ b2), first.schema)
    val expected = first.unionAll(second)
    assert(streamed.exceptAll(expected).isEmpty && expected.exceptAll(streamed).isEmpty)
  }

  test("maxVersionsPerTrigger bounds each catch-up batch") {
    val region = Tables(spark, sfDir, "region")
    val path = tmpDir("gsrc-rate-table")
    val ckpt = tmpDir("gsrc-rate-ckpt")
    val t = GraftTable.create(spark, path, region) // v0
    t.append(region)                               // v1
    t.append(region)                               // v2
    t.append(region)                               // v3
    val n = region.count()
    val opts = Map("maxVersionsPerTrigger" -> "1")
    // SupportsTriggerAvailableNow: one run drains all pending versions
    // in successive one-version batches (v0 snapshot, then v1..v3)
    val (rows, batches) = runCounting(path, ckpt, opts)
    assert(rows.size == 4 * n, s"expected ${4 * n} rows, got ${rows.size}")
    assert(batches >= 4, s"expected ≥4 capped batches, got $batches")
    assert(runOnce(path, ckpt, opts).isEmpty) // caught up
  }

  test("graftlake sink writes exactly-once; table-to-table pipe works end-to-end") {
    val nation = Tables(spark, sfDir, "nation")
    val srcPath = tmpDir("gsink-src")
    val dstPath = tmpDir("gsink-dst")
    val ckpt = tmpDir("gsink-ckpt")
    val src = GraftTable.create(spark, srcPath, nation)

    def pipeOnce(): Unit = {
      val q = spark.readStream.format("graftlake").load(srcPath)
        .writeStream.format("graftlake")
        .option("path", dstPath)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }

    pipeOnce()
    val dst = GraftTable.forPath(spark, dstPath)
    assert(dst.toDF.count() == nation.count())

    src.append(nation.limit(5))
    pipeOnce()
    assert(dst.toDF.count() == nation.count() + 5)

    // re-running with nothing new must not duplicate (exactly-once)
    pipeOnce()
    assert(dst.toDF.count() == nation.count() + 5)
    val content = dst.toDF
    val expected = nation.unionAll(nation.limit(5))
    assert(content.exceptAll(expected).isEmpty && expected.exceptAll(content).isEmpty)
  }

  test("startingVersion tails new commits without the initial snapshot") {
    val region = Tables(spark, sfDir, "region")
    val path = tmpDir("gsrc-sv-table")
    val t = GraftTable.create(spark, path, region) // v0
    t.append(region.limit(2))                      // v1
    t.append(region.limit(3))                      // v2
    val got = runOnce(path, tmpDir("gsrc-sv-ckpt"),
      Map("startingVersion" -> "1"))
    assert(got.size == 5, s"expected v1+v2 rows only, got ${got.size}")
    // startingTimestamp = v1's exact commit time includes v1 (at-or-after)
    val ts1 = t.history.filter(col("version") === 1).collect()(0).getLong(1)
    val got2 = runOnce(path, tmpDir("gsrc-sts-ckpt"),
      Map("startingTimestamp" -> new java.sql.Timestamp(ts1).toString))
    assert(got2.size == 5, s"timestamp tail must equal version tail, got ${got2.size}")
    // a timestamp strictly AFTER v1's commit must NOT replay v1 — Delta's
    // streaming contract is earliest-at-or-after, not latest-at-or-before
    val ts2 = t.history.filter(col("version") === 2).collect()(0).getLong(1)
    if (ts2 > ts1 + 1) {
      val gotBetween = runOnce(path, tmpDir("gsrc-stsb-ckpt"),
        Map("startingTimestamp" -> new java.sql.Timestamp(ts1 + 1).toString))
      assert(gotBetween.size == 3,
        s"ts between v1 and v2 must start at v2 (3 rows), got ${gotBetween.size}")
    }
    // a timestamp past the log head tails from now: empty first drain
    val gotFuture = runOnce(path, tmpDir("gsrc-stsf-ckpt"),
      Map("startingTimestamp" -> new java.sql.Timestamp(ts2 + 60000).toString))
    assert(gotFuture.isEmpty,
      s"future timestamp must admit nothing, got ${gotFuture.size}")
    intercept[Exception] {
      runOnce(path, tmpDir("gsrc-both-ckpt"),
        Map("startingVersion" -> "1", "startingTimestamp" -> "2026-01-01"))
    }
  }

  test("maxBytesPerTrigger admits at least one version per batch") {
    val region = Tables(spark, sfDir, "region")
    val path = tmpDir("gsrc-bytes-table")
    val ckpt = tmpDir("gsrc-bytes-ckpt")
    val t = GraftTable.create(spark, path, region) // v0
    t.append(region)                               // v1
    t.append(region)                               // v2
    val n = region.count()
    // 1-byte cap: every batch still admits exactly one version
    val (rows, batches) = runCounting(path, ckpt, Map("maxBytesPerTrigger" -> "1"))
    assert(rows.size == 3 * n)
    assert(batches >= 3, s"expected ≥3 byte-capped batches, got $batches")
    assert(runOnce(path, ckpt, Map("maxBytesPerTrigger" -> "1")).isEmpty)
  }

  test("readChangeFeed streams row-level inserts and deletes") {
    val nation = Tables(spark, sfDir, "nation")
    val path = tmpDir("gsrc-cdf-table")
    val ckpt = tmpDir("gsrc-cdf-ckpt")
    val t = GraftTable.create(spark, path, nation)
    val opts = Map("readChangeFeed" -> "true")

    val b1 = runOnce(path, ckpt, opts)
    assert(b1.size == nation.count())
    assert(b1.forall(_.getAs[String]("_change_type") == "insert"))

    t.append(nation.limit(3))
    t.delete(col("n_nationkey") === 1) // CoW delete: no failure in CDF mode
    val b2 = runOnce(path, ckpt, opts)
    val byType = b2.groupBy(_.getAs[String]("_change_type")).view.mapValues(_.size).toMap
    // per-version feed (Delta table_changes semantics): the append's 3
    // rows are inserts, and the delete removes every nationkey=1 row
    // visible at its start — including the one appended just before,
    // which therefore appears as BOTH an insert and a delete
    val deletedAtV2 = nation.filter(col("n_nationkey") === 1).count() +
      nation.limit(3).filter(col("n_nationkey") === 1).count()
    assert(byType.getOrElse("insert", 0) == 3, s"got $byType")
    assert(byType.getOrElse("delete", 0) == deletedAtV2, s"got $byType")

    assert(runOnce(path, ckpt, opts).isEmpty) // caught up
  }

  test("merge-on-read delete fails the stream like a CoW rewrite") {
    val nation = Tables(spark, sfDir, "nation")
    val path = tmpDir("gsrc-mor-table")
    val ckpt = tmpDir("gsrc-mor-ckpt")
    val t = GraftTable.create(spark, path, nation)
    assert(runOnce(path, ckpt).size == nation.count())
    t.deleteMergeOnRead(col("n_nationkey") === 0) // AddDV only, no removes
    val ex = intercept[StreamingQueryException] { runOnce(path, ckpt) }
    def causes(e: Throwable): Seq[Throwable] =
      if (e == null) Nil else e +: causes(e.getCause)
    assert(causes(ex).exists(_.isInstanceOf[UnsupportedOperationException]))
  }

  test("shallow clones stream: initial snapshot honors DVs and absolute paths") {
    val orders = Tables(spark, sfDir, "orders")
    val srcPath = tmpDir("gsrc-clone-src")
    val src = GraftTable.create(spark, srcPath, orders.limit(500),
      Seq("o_orderstatus"))
    src.deleteMergeOnRead(col("o_orderkey") % 7 === 0)
    val clonePath = tmpDir("gsrc-clone-dst")
    GraftTable.shallowClone(spark, srcPath, clonePath)
    val got = runOnce(clonePath, tmpDir("gsrc-clone-ckpt"))
    assert(got.size == src.toDF.count())
  }

  test("CoW rewrite fails the stream; ignoreChanges streams through") {
    val nation = Tables(spark, sfDir, "nation")
    val path = tmpDir("gsrc-cow-table")
    val ckpt = tmpDir("gsrc-cow-ckpt")
    val t = GraftTable.create(spark, path, nation)
    assert(runOnce(path, ckpt).size == nation.count())

    t.delete(col("n_nationkey") === 0) // CoW: remove+add with dataChange=true
    val ex = intercept[StreamingQueryException] { runOnce(path, ckpt) }
    def causes(e: Throwable): Seq[Throwable] =
      if (e == null) Nil else e +: causes(e.getCause)
    assert(causes(ex).exists(_.isInstanceOf[UnsupportedOperationException]))

    // rewritten file re-emitted: rows = post-delete survivors of the file
    val b3 = runOnce(path, ckpt, Map("ignoreChanges" -> "true"))
    assert(b3.nonEmpty)
  }

  test("ST x L118: a stream TAILS an attached Iceberg mirror — the " +
      "sync commit of an append-only source emits exactly the new rows") {
    import spark.implicits._
    val src = GraftTable.create(spark, tmpDir("gsrc-mirror-src"),
      (0L until 25L).map(i => (i, i * 2L)).toDF("k", "v"))
    graft.lake.IcebergExport.export(GraftTable.forPath(spark, src.path))
    val attPath = tmpDir("gsrc-mirror-att")
    val att = GraftTable.attachIceberg(spark, src.path, attPath)
    val ckpt = tmpDir("gsrc-mirror-ckpt")
    val b1 = runOnce(attPath, ckpt)
    assert(b1.size == 25, "initial snapshot = the attached state")
    // the FOREIGN engine keeps appending; resync pulls adds only —
    // a pure-append sync commit streams without ignoreChanges
    src.append((25L until 35L).map(i => (i, i * 2L)).toDF("k", "v"))
    graft.lake.IcebergExport.export(GraftTable.forPath(spark, src.path))
    att.resyncAttached()
    val b2 = runOnce(attPath, ckpt)
    assert(b2.size == 10, s"the sync commit must emit EXACTLY the " +
      s"source's new rows, got ${b2.size}")
    assert(b2.map(_.getLong(0)).toSet == (25L until 35L).toSet)
  }
}
