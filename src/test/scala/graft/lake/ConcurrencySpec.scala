package graft.lake

import java.util.concurrent.Executors
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

import graft.{GraftSparkSpec, Tables}

/** Optimistic-concurrency behavior: concurrent appends race on the
  * same version number; losers must retry onto fresh versions and no
  * commit may be lost (the create-new-file atomicity contract).
  */
class ConcurrencySpec extends GraftSparkSpec {

  test("8 concurrent appends all commit on distinct versions, none lost") {
    val li = Tables(spark, sfDir, "lineitem")
    val t = GraftTable.create(spark, tmpDir("conc"), li.limit(10))
    val pool = Executors.newFixedThreadPool(8)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val futures = (1 to 8).map { i =>
        Future {
          val handle = GraftTable.forPath(spark, t.path)
          handle.append(li.limit(i))
        }
      }
      val versions = Await.result(Future.sequence(futures), 300.seconds)
      assert(versions.distinct.size == 8, s"version collision: $versions")
      assert(versions.toSet == (1L to 8L).toSet)
      assert(t.toDF.count() == 10 + (1 to 8).sum)
      // log replay sees all 8 appends
      val ops = t.history.select("operation").collect().map(_.getString(0))
      assert(ops.count(_ == "APPEND") == 8)
    } finally pool.shutdown()
  }

  test("racing DELETE and OPTIMIZE never resurrect deleted rows") {
    import org.apache.spark.sql.functions.col
    import java.util.ConcurrentModificationException
    (1 to 3).foreach { round =>
      val t = GraftTable.create(spark, tmpDir(s"race-$round"),
        Tables(spark, sfDir, "lineitem").limit(2000).repartition(6))
      val nonR = t.toDF.filter(col("l_returnflag") =!= "R").count()
      val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
      try {
        def submit(op: () => Unit) = pool.submit(new java.util.concurrent.Callable[Boolean] {
          def call(): Boolean =
            try { op(); true } catch { case _: ConcurrentModificationException => false }
        })
        val fDel = submit(() => { t.delete(col("l_returnflag") === "R"); () })
        val fOpt = submit(() => { t.optimize(); () })
        val delOk = fDel.get()
        fOpt.get()
        // the losing writer retries from the fresh snapshot
        if (!delOk) t.delete(col("l_returnflag") === "R")
        assert(t.toDF.filter(col("l_returnflag") === "R").count() == 0,
          s"round $round: deleted rows resurrected (delete first try ok=$delOk)")
        assert(t.toDF.count() == nonR, s"round $round: non-R rows corrupted")
      } finally pool.shutdown()
    }
  }

  test("racing MoR update and MoR delete converge to a serializable outcome") {
    import org.apache.spark.sql.functions.col
    import java.util.ConcurrentModificationException
    (1 to 2).foreach { round =>
      val li = Tables(spark, sfDir, "lineitem").limit(2000).repartition(4)
      val t = GraftTable.create(spark, tmpDir(s"mor-race-$round"), li)
      // expected counts come from the TABLE, not a re-executed limit()
      // plan (limit without ordering is not deterministic across runs)
      val nonR = t.toDF.filter(col("l_returnflag") =!= "R").count()
      val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
      try {
        def retrying(op: () => Unit) = pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = {
            var done = false
            var attempts = 0
            while (!done) {
              attempts += 1
              assert(attempts <= 10, "MoR conflict never resolved after 10 retries")
              try { op(); done = true }
              catch { case _: ConcurrentModificationException => () }
            }
          }
        })
        val fUpd = retrying(() => { t.updateMergeOnRead(
          col("l_returnflag") === "R",
          Map("l_tax" -> org.apache.spark.sql.functions.lit(0.0))); () })
        val fDel = retrying(() => { t.deleteMergeOnRead(
          col("l_returnflag") === "R"); () })
        fUpd.get(300, java.util.concurrent.TimeUnit.SECONDS)
        fDel.get(300, java.util.concurrent.TimeUnit.SECONDS)
        // both serializations end with every R row masked: update-then-
        // delete masks originals AND post-images; delete-then-update
        // matches nothing (already masked). Either way no resurrection.
        assert(t.toDF.filter(col("l_returnflag") === "R").count() == 0,
          s"round $round: R rows resurrected by the MoR race")
        assert(t.toDF.count() == nonR, s"round $round: non-R rows corrupted")
      } finally pool.shutdown()
    }
  }

  test("schema-changing commits fail on an intervening metadata commit") {
    val li = Tables(spark, sfDir, "lineitem")
    val t = GraftTable.create(spark, tmpDir("metaconflict"), li.limit(20))
    val stale = t.snapshot                                   // v0
    t.setTableProperties(Map("owner" -> "team-a"))           // v1 intervenes
    // a rename-style commit planned against v0 would clobber v1's
    // properties — it must fail, not silently revert them
    intercept[java.util.ConcurrentModificationException] {
      t.commitAndCheckpoint(Seq(
        CommitInfo(System.currentTimeMillis(), "TEST", Map.empty, Map.empty),
        stale.metadata.get),
        readVersion = stale.version, metadataConflict = true)
    }
    assert(t.snapshot.metadata.get.properties.get("owner").contains("team-a"))
  }

  test("property-merge commits retry onto metadata committed mid-flight") {
    val li = Tables(spark, sfDir, "lineitem")
    val t = GraftTable.create(spark, tmpDir("metamerge"), li.limit(20))
    val other = GraftTable.forPath(spark, t.path)
    // land a rename BETWEEN the merge's metadata read and its commit
    // attempt: the first tryCommitAt loses the version race and the
    // retry must re-apply the merge onto the renamed schema
    var interleaved = false
    t.commitMetadataMerge(
      CommitInfo(System.currentTimeMillis(), "TEST MERGE", Map.empty, Map.empty)) { m =>
      if (!interleaved) { interleaved = true; other.renameColumn("l_tax", "tax") }
      m.copy(properties = m.properties + ("graft.test.k" -> "v"))
    }
    val s = t.snapshot
    assert(s.metadata.get.properties.get("graft.test.k").contains("v"))
    assert(s.schema.fieldNames.contains("tax") && !s.schema.fieldNames.contains("l_tax"),
      "the concurrent rename must survive the property merge")
  }

  test("extensions installer registers functions on a fresh session") {
    val s2 = spark.newSession()
    new graft.GraftExtensions() // construct ok; registry path exercised via GraftFunctions
    graft.functions.GraftFunctions.register(s2)
    import org.apache.spark.sql.functions._
    val r = Tables(s2, sfDir, "documents").limit(3)
      .select(expr("graft_minhash32(text)").as("sig"))
      .collect()
    assert(r.forall(_.getSeq[Long](0).size == 32))
  }
}
