package graft.lake

import graft.GraftSparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** L120 — CLUSTER BY AUTO (predictive clustering): reads record which
  * columns their predicates could prune by, OPTIMIZE drains that
  * history into the log and picks the clustering keys itself, the
  * same pass applies them, and an explicit CLUSTER BY always wins.
  */
class ClusterAutoSpec extends GraftSparkSpec {

  private def df(n: Int): DataFrame = {
    import spark.implicits._
    (1 to n).map(i => (i.toLong, s"c${i % 4}", (i * 7 % n).toLong))
      .toDF("id", "cat", "other")
  }

  test("auto picks observed top-k, applies clustering, persists history") {
    val t = GraftTable.create(spark, tmpDir("cauto_pick"),
      df(4000).repartition(4))
    t.setTableProperties(Map("graft.clusterAuto" -> "true"))
    t.readWhere(col("cat") === "c1").count()
    t.readWhere(col("cat") === "c2").count()
    t.readWhere(col("cat") === "c3" && col("id") > 10L).count()
    t.readWhere(col("id") < 5L).count()
    t.optimize(targetBytes = 8192) // small target → several files
    val props = t.snapshot.metadata.get.properties
    assert(props.get("graft.clusterBy").contains("cat,id"), props)
    assert(props.get("graft.clusterBy.auto").contains("true"))
    assert(PredicateStats.parse(props.get("graft.clusterAuto.stats")) ==
      Map("cat" -> 3L, "id" -> 2L))
    val ops = t.history.collect().map(_.getAs[String]("operation"))
    assert(ops.contains("CLUSTER BY AUTO"))
    // the picked layout actually skips: a narrow range on the id
    // dimension touches a strict subset of the z-ordered files (the
    // 4-value cat dimension interleaves, so equality there can span
    // every file — range locality is what the curve guarantees)
    val (kept, total) = t.pruneFiles(col("id") <= 100L)
    assert(total > 1, s"need a multi-file layout, got $total")
    assert(kept < total, s"no skipping after auto-clustering: $kept/$total")
    assert(t.readWhere(col("cat") === "c1").count() == 1000L)
  }

  test("drain is exactly-once: a second OPTIMIZE without new reads " +
      "neither double-counts nor re-commits") {
    val t = GraftTable.create(spark, tmpDir("cauto_drain"),
      df(400).repartition(2))
    t.setTableProperties(Map("graft.clusterAuto" -> "true"))
    t.readWhere(col("cat") === "c1").count()
    t.optimize()
    val stats1 = t.snapshot.metadata.get.properties("graft.clusterAuto.stats")
    assert(PredicateStats.parse(Some(stats1)) == Map("cat" -> 1L))
    val autoCommits1 = t.history.collect()
      .count(_.getAs[String]("operation") == "CLUSTER BY AUTO")
    t.optimize()
    val props2 = t.snapshot.metadata.get.properties
    assert(props2("graft.clusterAuto.stats") == stats1)
    assert(t.history.collect()
      .count(_.getAs[String]("operation") == "CLUSTER BY AUTO") ==
      autoCommits1)
    // new reads accumulate ON TOP of the persisted history
    t.readWhere(col("cat") === "c2").count()
    t.readWhere(col("id") > 100L).count()
    t.optimize()
    assert(PredicateStats.parse(t.snapshot.metadata.get.properties
      .get("graft.clusterAuto.stats")) == Map("cat" -> 2L, "id" -> 1L))
  }

  test("explicit CLUSTER BY wins: the stamp clears and auto defers") {
    val t = GraftTable.create(spark, tmpDir("cauto_explicit"),
      df(400).repartition(2))
    t.setTableProperties(Map("graft.clusterAuto" -> "true"))
    t.readWhere(col("cat") === "c1").count()
    t.optimize()
    assert(t.snapshot.metadata.get.properties
      .get("graft.clusterBy.auto").contains("true"))
    // explicit choice through the generic property path
    t.setTableProperties(Map("graft.clusterBy" -> "other"))
    val props = t.snapshot.metadata.get.properties
    assert(props.get("graft.clusterBy").contains("other"))
    assert(!props.contains("graft.clusterBy.auto"))
    // heavy cat history cannot override the explicit spec
    (1 to 5).foreach(_ => t.readWhere(col("cat") === "c2").count())
    t.optimize()
    assert(t.snapshot.metadata.get.properties
      .get("graft.clusterBy").contains("other"))
  }

  test("CLUSTER BY NONE is explicit too: auto never re-picks over it") {
    val t = GraftTable.create(spark, tmpDir("cauto_none"),
      df(400).repartition(2))
    t.setTableProperties(Map("graft.clusterAuto" -> "true"))
    t.readWhere(col("cat") === "c1").count()
    t.optimize()
    assert(t.snapshot.metadata.get.properties
      .get("graft.clusterBy.auto").contains("true"))
    val gsql = new GraftSql(spark)
    gsql.register("cauto_none_t", t.path)
    gsql.sql("ALTER TABLE cauto_none_t CLUSTER BY NONE")
    val cleared = t.snapshot.metadata.get.properties
    assert(!cleared.contains("graft.clusterBy"), cleared)
    assert(!cleared.contains("graft.clusterBy.auto"), cleared)
    // fresh heavy history + OPTIMIZE must NOT re-install clustering
    (1 to 5).foreach(_ => t.readWhere(col("cat") === "c2").count())
    t.optimize()
    val after = t.snapshot.metadata.get.properties
    assert(!after.contains("graft.clusterBy"),
      s"auto re-picked over an explicit NONE: $after")
    // ...until a LATER explicit CLUSTER BY re-opts in and clears NONE
    t.setTableProperties(Map("graft.clusterBy" -> "other"))
    assert(!t.snapshot.metadata.get.properties
      .contains(GraftTable.ClusterNoneProp))
  }

  test("partition columns are excluded from the pick; no history → " +
      "plain compaction") {
    val t = GraftTable.create(spark, tmpDir("cauto_part"),
      df(400), partitionBy = Seq("cat"))
    t.setTableProperties(Map("graft.clusterAuto" -> "true"))
    t.optimize() // nothing observed yet — must not throw or commit
    assert(!t.snapshot.metadata.get.properties.contains("graft.clusterBy"))
    t.readWhere(col("cat") === "c1").count() // partition col: excluded
    t.readWhere(col("id") > 10L).count()
    t.optimize()
    assert(t.snapshot.metadata.get.properties
      .get("graft.clusterBy").contains("id"))
  }
}
