package graft.lake

import graft.{GraftSparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Change data feed (Delta CDF parity): DML ops under `graft.cdf=true`
  * write CDC sidecars; changeFeed emits operation-level change types
  * (insert / delete / update_preimage / update_postimage) per commit
  * version, with synthesized inserts for pure appends and per-version
  * diffs for ops without CDC.
  */
class CdfSpec extends GraftSparkSpec {

  private def li = Tables(spark, sfDir, "lineitem")

  private def typeCounts(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
    df.groupBy("_change_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("update and delete emit pre/post images and deletes with exact rows") {
    val t = GraftTable.create(spark, tmpDir("cdf"), li.limit(1000),
      properties = Map("graft.cdf" -> "true"))
    val matched = li.limit(1000).filter(col("l_returnflag") === "R").count()
    t.update(col("l_returnflag") === "R", Map("l_discount" -> lit(0.0)))   // v1
    t.delete(col("l_linenumber") === 1)                                    // v2

    val v1 = t.changeFeed(0, 1)
    val c1 = typeCounts(v1)
    assert(c1.get("update_preimage").contains(matched))
    assert(c1.get("update_postimage").contains(matched))
    assert(v1.filter(col("_change_type") === "update_postimage" &&
      col("l_discount") =!= 0.0).count() == 0)
    assert(v1.filter(col("_change_type") === "update_preimage")
      .agg(sum("l_discount")).head.getDouble(0) ==
      li.limit(1000).filter(col("l_returnflag") === "R")
        .agg(sum("l_discount")).head.getDouble(0))

    val v2 = t.changeFeed(1, 2)
    val deletedExpected = t.toDFAt(1).filter(col("l_linenumber") === 1).count()
    assert(typeCounts(v2).get("delete").contains(deletedExpected))
    assert(v2.filter(col("l_linenumber") =!= 1).count() == 0)

    // the full range carries _commit_version per change
    val all = t.changeFeed(0, 2)
    assert(all.select("_commit_version").distinct().collect()
      .map(_.getLong(0)).toSet == Set(1L, 2L))
  }

  test("merge-on-read ops emit the same change types as copy-on-write") {
    val t = GraftTable.create(spark, tmpDir("cdf-mor"),
      li.limit(1000).repartition(4), properties = Map("graft.cdf" -> "true"))
    val matched = li.limit(1000).filter(col("l_returnflag") === "R").count()
    t.updateMergeOnRead(col("l_returnflag") === "R", Map("l_discount" -> lit(0.0)))
    val c1 = typeCounts(t.changeFeed(0, 1))
    assert(c1.get("update_preimage").contains(matched))
    assert(c1.get("update_postimage").contains(matched))

    t.deleteMergeOnRead(col("l_linenumber") === 1)
    val visibleDeleted = t.toDFAt(1).filter(col("l_linenumber") === 1).count()
    assert(typeCounts(t.changeFeed(1, 2)).get("delete").contains(visibleDeleted))

    // a second MoR delete overlapping the first must not re-emit
    // already-masked rows as phantom deletes
    t.deleteMergeOnRead(col("l_linenumber") <= 2)
    val newlyDeleted = t.toDFAt(2).filter(col("l_linenumber") <= 2).count()
    assert(typeCounts(t.changeFeed(2, 3)).get("delete").contains(newlyDeleted))
  }

  test("merge tags inserts, updates, deletes; appends synthesize inserts") {
    val o = Tables(spark, sfDir, "orders").limit(500)
    val t = GraftTable.create(spark, tmpDir("cdf-merge"), o,
      properties = Map("graft.cdf" -> "true"))
    // v1: plain append — no CDC sidecar, inserts derived from add
    // files (shifted keys so the later merge sees unique target keys)
    t.append(o.limit(20).withColumn("o_orderkey", col("o_orderkey") + 20000000L))
    val a = typeCounts(t.changeFeed(0, 1))
    assert(a == Map("insert" -> 20L))

    // v2: merge with updates (keys < 100 doubled) and inserts (shifted ids)
    val updates = o.filter(col("o_orderkey") < 100)
      .withColumn("o_totalprice", round(col("o_totalprice") * 2, 2))
    val inserts = o.filter(col("o_orderkey") < 50)
      .withColumn("o_orderkey", col("o_orderkey") + 10000000L)
    t.merge(updates.unionByName(inserts), "o_orderkey")
    val m = typeCounts(t.changeFeed(1, 2))
    val nUpd = t.toDFAt(1).filter(col("o_orderkey") < 100).count()
    val nIns = inserts.count()
    assert(m.get("update_preimage").contains(nUpd), s"got $m")
    assert(m.get("update_postimage").contains(nUpd), s"got $m")
    assert(m.get("insert").contains(nIns), s"got $m")
    assert(!m.contains("delete"))
  }

  test("ops without CDC fall back to per-version diffs; optimize is silent") {
    val t = GraftTable.create(spark, tmpDir("cdf-fallback"),
      li.limit(500).repartition(8))                       // cdf NOT enabled
    t.delete(col("l_returnflag") === "R")                 // v1: no sidecar
    t.optimize()                                          // v2: dataChange=false
    val deleted = t.toDFAt(0).filter(col("l_returnflag") === "R").count()
    val v1 = typeCounts(t.changeFeed(0, 1))
    assert(v1.get("delete").contains(deleted), s"fallback diff, got $v1")
    assert(t.changeFeed(1, 2).count() == 0, "compaction must be invisible")
  }

  test("change feed stays readable across renames and schema evolution") {
    val t = GraftTable.create(spark, tmpDir("cdf-evo"), li.limit(100),
      properties = Map("graft.cdf" -> "true"))
    t.delete(col("l_linenumber") === 1)                    // v1: CDC sidecar
    t.renameColumn("l_discount", "disc")                   // v2: metadata-only
    t.append(t.toDF.limit(5).withColumn("extra", lit(1L)),
      mergeSchema = true)                                  // v3: new column
    val feed = t.changeFeed(0, 3)
    // v1's CDC rows surface under the RENAMED column name, with values
    val v1del = feed.filter(col("_commit_version") === 1 &&
      col("_change_type") === "delete")
    assert(v1del.count() == li.limit(100).filter(col("l_linenumber") === 1).count())
    assert(v1del.filter(col("disc").isNull).count() == 0,
      "renamed column must carry the historical values")
    // columns added later read as null for earlier versions
    assert(v1del.filter(col("extra").isNotNull).count() == 0)
    // the rename itself is invisible (metadata-only commit)
    assert(feed.filter(col("_commit_version") === 2).count() == 0)
    // evolved appends carry the new column
    val v3 = feed.filter(col("_commit_version") === 3)
    assert(v3.count() == 5)
    assert(v3.filter(col("extra") === 1L).count() == 5)
  }

  test("a no-op restore emits no phantom inserts") {
    val t = GraftTable.create(spark, tmpDir("cdf-restore"), li.limit(100))
    t.append(li.limit(10))          // v1
    t.restore(1)                    // v2: same file set re-activated
    assert(t.changeFeed(1, 2).count() == 0,
      "restoring to the current state must not re-emit the table as inserts")
  }

  test("cleanupLogs reclaims CDC sidecars with their carrier commits") {
    val t = GraftTable.create(spark, tmpDir("cdf-clean"), li.limit(100),
      properties = Map("graft.cdf" -> "true"))
    t.delete(col("l_linenumber") === 1)                   // v1 writes CDC
    (2 to 22).foreach(_ => t.append(li.limit(2)))         // checkpoints at 10, 20
    def cdcFiles(): Int = {
      val d = java.nio.file.Paths.get(t.path, "_graft_cdc")
      if (!java.nio.file.Files.exists(d)) 0
      else {
        import scala.jdk.CollectionConverters._
        val w = java.nio.file.Files.walk(d)
        try w.iterator().asScala.count(p =>
          p.getFileName.toString.endsWith(".parquet")) finally w.close()
      }
    }
    assert(cdcFiles() > 0)
    // vacuum must NOT touch CDC sidecars
    t.vacuum(0.0, dryRun = false)
    assert(cdcFiles() > 0, "vacuum must spare CDC sidecars")
    t.cleanupLogs()
    assert(cdcFiles() == 0, "log cleanup must reclaim dropped commits' CDC")
  }
}
