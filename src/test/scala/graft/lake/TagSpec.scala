package graft.lake

import graft.GraftSparkSpec
import org.apache.spark.sql.functions._

/** Named tags (L112 — Iceberg-style refs): creation/drop semantics,
  * the vacuum and log-cleanup PINNING that makes a tag durable, and
  * the read surfaces (API, SQL rewrite, reader option, RESTORE).
  */
class TagSpec extends GraftSparkSpec {

  test("create/read/drop: strict duplicates, name validation, history ops") {
    import spark.implicits._
    val t = GraftTable.create(spark, tmpDir("tag_basic"),
      (1 to 50).map(i => (i.toLong, s"v$i")).toDF("id", "v"))
    t.append((51 to 80).map(i => (i.toLong, s"v$i")).toDF("id", "v"))
    t.createTag("rel-1.0", Some(0L))
    t.createTag("head") // defaults to the current version (the
    // CREATE TAG commit itself was version 2, so head pins 2)
    assert(t.tags == Map("rel-1.0" -> 0L, "head" -> 2L))
    assert(t.toDFAtTag("rel-1.0").count() == 50L)
    assert(t.toDFAtTag("head").count() == 80L)
    intercept[IllegalArgumentException](t.createTag("rel-1.0", Some(1L)))
    intercept[IllegalArgumentException](t.createTag("bad name"))
    intercept[IllegalArgumentException](t.createTag("future", Some(99L)))
    t.dropTag("head")
    assert(t.tags.keySet == Set("rel-1.0"))
    intercept[IllegalArgumentException](t.dropTag("head"))
    val ops = t.history.collect().map(_.getAs[String]("operation"))
    assert(ops.count(_ == "CREATE TAG") == 2 && ops.count(_ == "DROP TAG") == 1)
  }

  test("vacuum (full and LITE) pins tagged snapshots' files and DVs") {
    import spark.implicits._
    val t = GraftTable.create(spark, tmpDir("tag_vacuum"),
      (1 to 100).map(i => (i.toLong, s"v$i")).toDF("id", "v"))
    t.deleteMergeOnRead(col("id") > 90L) // live DVs in the tagged state
    t.createTag("pinned")
    t.delete(col("id") <= 40L) // CoW: tagged files tombstone
    t.optimize()
    // a LITE pass first (tombstone-driven), then the full walk
    t.vacuumLite(retentionHours = 0.0, dryRun = false)
    t.vacuum(retentionHours = 0.0, dryRun = false)
    assert(t.toDFAtTag("pinned").count() == 90L,
      "the tagged snapshot must read exactly after retention-0 vacuums")
    assert(t.toDFAtTag("pinned").agg(sum("id")).head.getLong(0) ==
      (1L to 90L).sum)
    assert(t.toDF.count() == 50L)
    // drop the tag: the next vacuum MAY reclaim (files no longer live)
    t.dropTag("pinned")
    t.vacuum(retentionHours = 0.0, dryRun = false)
    intercept[Exception](t.toDFAtTag("pinned"))
  }

  test("log cleanup pins the tag via a pointer-neutral historical checkpoint") {
    import spark.implicits._
    val t = GraftTable.create(spark, tmpDir("tag_cleanup"),
      (1 to 30).map(i => (i.toLong, s"v$i")).toDF("id", "v"))
    t.createTag("v0", Some(0L))
    (1 to 6).foreach(i =>
      t.append(Seq((100L + i, s"x$i")).toDF("id", "v")))
    val newestCkptBefore = t.log.checkpointVersion
    t.cleanupLogs()
    assert(t.log.checkpointVersion == newestCkptBefore ||
      t.log.checkpointVersion.exists(v => newestCkptBefore.forall(_ <= v)),
      "the historical checkpoint must never move the pointer backward")
    assert(!t.log.hasCommit(0L) || t.log.hasCheckpointAt(0L) ||
      t.toDFAtTag("v0").count() == 30L)
    // the actual contract: the tagged version still replays exactly
    assert(t.toDFAtTag("v0").count() == 30L)
    assert(t.toDFAtTag("v0").agg(sum("id")).head.getLong(0) == (1L to 30L).sum)
  }

  test("log cleanup pins tags BETWEEN the commit cutoff and the pointer " +
      "checkpoint (keepVersions > 0 window — r13 advisory)") {
    import spark.implicits._
    val t = GraftTable.create(spark, tmpDir("tag_cleanup_mid"),
      (1 to 30).map(i => (i.toLong, s"v$i")).toDF("id", "v"))
    (1 to 12).foreach(i =>
      t.append(Seq((100L + i, s"x$i")).toDF("id", "v")))
    t.createTag("mid", Some(9L)) // version 13; pointer checkpoint at 10
    val cv = t.log.checkpointVersion.get
    assert(cv == 10L, s"fixture expects the interval checkpoint at 10, got $cv")
    // cutoff = min(cv=10, latest(13) - keep(4)) = 9: the tag sits
    // exactly in [cutoff, cv), where checkpoint pruning deletes every
    // non-pinned dir < cv — without a historical checkpoint AT the tag
    // its replay base is gone while its older commits are deleted
    t.cleanupLogs(keepVersions = 4)
    assert(!t.log.hasCommit(0L), "cleanup must actually delete old commits")
    assert(t.log.hasCheckpointAt(9L),
      "a tag between cutoff and the pointer checkpoint needs its own " +
        "historical checkpoint or VERSION AS OF 'tag' breaks unrepairably")
    assert(t.toDFAtTag("mid").count() == 39L)
    assert(t.toDFAtTag("mid").agg(sum("id")).head.getLong(0) ==
      (1L to 30L).sum + (101L to 109L).sum)
  }

  test("clones do NOT inherit tags: a ref names a SOURCE version, " +
      "meaningless (or wrong) in the clone's fresh log") {
    import spark.implicits._
    val src = GraftTable.create(spark, tmpDir("tag_clone_src"),
      (1 to 40).map(i => (i.toLong, s"v$i")).toDF("id", "v"))
    src.append((41 to 60).map(i => (i.toLong, s"v$i")).toDF("id", "v"))
    src.createTag("rel", Some(1L))
    val shallow = GraftTable.shallowClone(spark,
      src.path, tmpDir("tag_clone_sh"))
    assert(shallow.tags.isEmpty,
      "a shallow clone must not carry source-version refs")
    val deep = GraftTable.deepClone(spark, src.path, tmpDir("tag_clone_dp"))
    assert(deep.tags.isEmpty,
      "a deep clone must not carry source-version refs")
    assert(src.tags == Map("rel" -> 1L), "the source keeps its tag")
  }

  test("SQL surface: CREATE/DROP TAG, SHOW TAGS, VERSION AS OF 'tag', " +
      "RESTORE TO TAG; reader option tagAsOf") {
    import spark.implicits._
    val loc = tmpDir("tag_sql")
    GraftTable.create(spark, loc,
      (1 to 60).map(i => (i.toLong, s"v$i")).toDF("id", "v"))
    val gsql = new GraftSql(spark)
    gsql.register("tt", loc)
    gsql.sql("ALTER TABLE tt CREATE TAG golden")
    gsql.sql("DELETE FROM tt WHERE id <= 20")
    gsql.sql("ALTER TABLE tt CREATE TAG trimmed AS OF VERSION 1")
    val shown = gsql.sql("SHOW TAGS tt").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(shown == Map("golden" -> 0L, "trimmed" -> 1L))
    assert(gsql.sql("SELECT COUNT(*) AS n FROM tt VERSION AS OF 'golden'")
      .head.getLong(0) == 60L)
    // reader option route
    assert(spark.read.format("graftlake").option("tagAsOf", "golden")
      .load(loc).count() == 60L)
    // restore to the tag, then drop it
    gsql.sql("RESTORE TABLE tt TO TAG golden")
    assert(gsql.sql("SELECT COUNT(*) AS n FROM tt").head.getLong(0) == 60L)
    gsql.sql("ALTER TABLE tt DROP TAG trimmed")
    assert(gsql.sql("SHOW TAGS tt").count() == 1L)
  }
}
