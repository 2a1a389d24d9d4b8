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
