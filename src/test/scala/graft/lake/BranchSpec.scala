package graft.lake

import graft.GraftSparkSpec
import org.apache.spark.sql.functions._

/** Writable branches (L113 — the lakeFS/Nessie workflow on one table):
  * zero-copy fork, full DML independence, serializable merge-back
  * through the L98 reservation/decision protocol (crash-injected),
  * seal semantics, vacuum pinning, and partitioned-merge scanning.
  */
class BranchSpec extends GraftSparkSpec {

  private def fixture(name: String, n: Int = 100): GraftTable = {
    import spark.implicits._
    GraftTable.create(spark, tmpDir(name),
      (1 to n).map(i => (i.toLong, s"v$i")).toDF("id", "v").repartition(4))
  }

  test("create/list/read/drop: a branch is a zero-copy fork with " +
      "full DML independence") {
    import spark.implicits._
    val t = fixture("br_basic")
    val bt = t.createBranch("dev")
    assert(t.branches == Seq("dev"))
    assert(bt.toDF.count() == 100L)
    // diverge on the branch; the parent must not move
    bt.delete(col("id") <= 20L)
    bt.append(Seq((500L, "b1")).toDF("id", "v"))
    assert(bt.toDF.count() == 81L)
    assert(t.toDF.count() == 100L, "parent reads are isolated from branch DML")
    // parent DML does not leak into the branch either
    t.append(Seq((600L, "p1")).toDF("id", "v"))
    assert(bt.toDF.count() == 81L)
    intercept[IllegalArgumentException](t.createBranch("dev"))
    intercept[IllegalArgumentException](t.createBranch("bad name"))
    t.dropBranch("dev")
    assert(t.branches.isEmpty)
    intercept[IllegalArgumentException](t.branch("dev"))
    val ops = t.history.collect().map(_.getAs[String]("operation"))
    assert(ops.contains("CREATE BRANCH") && ops.contains("DROP BRANCH"))
  }

  test("merge fast-forward: branch diverges (append + CoW delete + MoR " +
      "delete), parent still — merged state equals the linear result; " +
      "the branch seals") {
    import spark.implicits._
    val t = fixture("br_merge_ff")
    val bt = t.createBranch("exp")
    bt.delete(col("id") <= 10L)                 // CoW rewrite
    bt.deleteMergeOnRead(col("id") > 90L)       // MoR mask survives merge
    bt.append((1000L to 1009L).map(i => (i, s"n$i")).toDF("id", "v"))
    val metrics = t.mergeBranch("exp")
    assert(metrics("numAddedFiles").toInt > 0)
    val ids = t.toDF.select("id").as[Long].collect().sorted
    assert(ids.toSeq == ((11L to 90L) ++ (1000L to 1009L)),
      "merged parent must equal the linear-history result exactly")
    assert(t.history(1).collect().head.getAs[String]("operation")
      == "MERGE BRANCH")
    // sealed: every further branch commit refuses; re-merge refuses
    intercept[UnsupportedOperationException](
      bt.append(Seq((1L, "x")).toDF("id", "v")))
    intercept[IllegalArgumentException](t.mergeBranch("exp"))
    // but the merged branch stays READABLE (nothing moved)
    assert(bt.toDF.count() == 90L)
    t.dropBranch("exp")
    // the parent still reads its merged state after the drop — merged
    // files are parent-referenced, the drop only removed the branch log
    assert(t.toDF.count() == 90L)
  }

  test("merge commutes with parent appends since the fork") {
    import spark.implicits._
    val t = fixture("br_merge_commute")
    val bt = t.createBranch("exp")
    t.append((200L to 204L).map(i => (i, s"p$i")).toDF("id", "v"))
    bt.append((300L to 304L).map(i => (i, s"b$i")).toDF("id", "v"))
    t.mergeBranch("exp")
    val ids = t.toDF.select("id").as[Long].collect().sorted
    assert(ids.toSeq == ((1L to 100L) ++ (200L to 204L) ++ (300L to 304L)),
      "an intervening parent append must survive the merge (commute)")
  }

  test("merge conflicts when the parent removed a base file the branch read") {
    import spark.implicits._
    val t = fixture("br_merge_conflict")
    val bt = t.createBranch("exp")
    bt.append(Seq((999L, "b")).toDF("id", "v"))
    t.delete(col("id") <= 50L) // rewrites base files the branch forked on
    intercept[java.util.ConcurrentModificationException](t.mergeBranch("exp"))
    // aborted cleanly: parent state intact, branch unsealed and usable
    assert(t.toDF.count() == 50L)
    assert(bt.toDF.count() == 101L)
    bt.append(Seq((998L, "b2")).toDF("id", "v"))
  }

  test("crash after the parent reservation: NOTHING merges, the branch " +
      "stays writable, a re-merge succeeds") {
    import spark.implicits._
    val oldGrace = TxnLog.PendingGraceMs
    TxnLog.PendingGraceMs = 0 // post-crash accessors decide immediately
    try {
      val t = fixture("br_crash_reserve")
      val bt = t.createBranch("exp")
      bt.append(Seq((999L, "b")).toDF("id", "v"))
      t.mergeCrashHook = p =>
        if (p == "after-parent-reserve") throw new RuntimeException(s"crash:$p")
      intercept[RuntimeException](t.mergeBranch("exp"))
      t.mergeCrashHook = _ => ()
      // recovery from disk alone: the undecided parent reservation
      // resolves ABORT on first access; the branch was never touched
      val t2 = GraftTable.forPath(spark, t.path)
      assert(t2.toDF.count() == 100L, "the crashed merge must not land")
      assert(t2.history(1).collect().head.getAs[String]("operation")
        == "TRANSACTION ABORTED")
      val bt2 = t2.branch("exp")
      assert(bt2.toDF.count() == 101L)
      t2.mergeBranch("exp")
      assert(t2.toDF.count() == 101L, "re-merge after the crash succeeds")
    } finally TxnLog.PendingGraceMs = oldGrace
  }

  test("crash between the branch seal reservation and the decision: " +
      "both sides abort; crash after the decision: both sides final") {
    import spark.implicits._
    val oldGrace = TxnLog.PendingGraceMs
    TxnLog.PendingGraceMs = 0
    try {
      val t = fixture("br_crash_decide")
      val bt = t.createBranch("exp")
      bt.append(Seq((999L, "b")).toDF("id", "v"))
      t.mergeCrashHook = p =>
        if (p == "after-branch-reserve") throw new RuntimeException(s"crash:$p")
      intercept[RuntimeException](t.mergeBranch("exp"))
      t.mergeCrashHook = _ => ()
      val t2 = GraftTable.forPath(spark, t.path)
      assert(t2.toDF.count() == 100L,
        "undecided reservations must resolve ABORT on both logs")
      val bt2 = t2.branch("exp")
      // the branch's aborted seal reservation must leave it unsealed
      bt2.append(Seq((998L, "b2")).toDF("id", "v"))
      // now crash AFTER the decision: the merge is durable on both
      t2.mergeCrashHook = p =>
        if (p == "after-decision") throw new RuntimeException(s"crash:$p")
      intercept[RuntimeException](t2.mergeBranch("exp"))
      t2.mergeCrashHook = _ => ()
      val t3 = GraftTable.forPath(spark, t.path)
      assert(t3.toDF.count() == 102L,
        "a decided merge must be visible after the crash")
      intercept[UnsupportedOperationException](
        t3.branch("exp").append(Seq((1L, "x")).toDF("id", "v")))
    } finally TxnLog.PendingGraceMs = oldGrace
  }

  test("parent vacuum pins a live branch's fork view; a dropped " +
      "unmerged branch's files reclaim") {
    import spark.implicits._
    val t = fixture("br_vacuum")
    val bt = t.createBranch("exp")
    bt.append(Seq((999L, "b")).toDF("id", "v"))
    // the parent rewrites every base file the branch forked on...
    t.delete(col("id") <= 99L)
    t.optimize()
    // ...and a zero-retention vacuum MUST spare them: the branch reads
    // its fork view through absolute references into the parent root
    t.vacuum(retentionHours = 0.0, dryRun = false)
    assert(bt.toDF.count() == 101L,
      "parent vacuum pulled data out from under a live branch")
    assert(t.toDF.count() == 1L)
    // drop without merging: the next vacuum reclaims the branch's own
    // (now unreferenced) data files
    val branchDir = java.nio.file.Paths.get(t.path, "_graft_branches", "exp")
    t.dropBranch("exp")
    t.vacuum(retentionHours = 0.0, dryRun = false)
    val leftover =
      if (!java.nio.file.Files.isDirectory(branchDir)) Nil
      else {
        val w = java.nio.file.Files.walk(branchDir)
        try {
          import scala.jdk.CollectionConverters._
          w.iterator().asScala
            .filter(p => p.toString.endsWith(".parquet")).toList
        } finally w.close()
      }
    assert(leftover.isEmpty,
      s"dropped unmerged branch data must reclaim, found: $leftover")
  }

  test("SQL surface: CREATE/DROP/MERGE BRANCH, SHOW BRANCHES, and DML " +
      "on the auto-registered branch alias") {
    import spark.implicits._
    val loc = tmpDir("br_sql")
    GraftTable.create(spark, loc,
      (1 to 50).map(i => (i.toLong, s"v$i")).toDF("id", "v"))
    val gsql = new GraftSql(spark)
    gsql.register("bt", loc)
    gsql.sql("ALTER TABLE bt CREATE BRANCH trial")
    val shown = gsql.sql("SHOW BRANCHES bt").collect()
    assert(shown.map(_.getString(0)).toSeq == Seq("trial"))
    assert(!shown.head.getBoolean(2), "freshly created branch is unmerged")
    gsql.sql("DELETE FROM bt_trial WHERE id <= 40")
    assert(gsql.sql("SELECT COUNT(*) AS c FROM bt_trial").head.getLong(0) == 10L)
    assert(gsql.sql("SELECT COUNT(*) AS c FROM bt").head.getLong(0) == 50L)
    gsql.sql("MERGE BRANCH trial INTO bt")
    assert(gsql.sql("SELECT COUNT(*) AS c FROM bt").head.getLong(0) == 10L)
    assert(gsql.sql("SHOW BRANCHES bt").collect().head.getBoolean(2),
      "SHOW BRANCHES must report the branch merged")
    gsql.sql("ALTER TABLE bt DROP BRANCH trial")
    assert(gsql.sql("SHOW BRANCHES bt").count() == 0L)
  }

  test("CONCURRENT branches: independent diverge, first merge lands, " +
      "a second merge commutes when disjoint (appends) and conflicts " +
      "when its read set was rewritten; CREATE BRANCH AS OF TAG forks " +
      "at the pinned version") {
    import spark.implicits._
    val t = fixture("br_concurrent")
    val a = t.createBranch("exp-a")
    val b = t.createBranch("exp-b")
    a.append(Seq((500L, "a")).toDF("id", "v"))
    b.append(Seq((600L, "b")).toDF("id", "v"))
    t.mergeBranch("exp-a")
    // b's merge commutes: a's merge only ADDED files, b's read set
    // (the shared base) is untouched
    t.mergeBranch("exp-b")
    val ids = t.toDF.select("id").as[Long].collect().sorted
    assert(ids.toSeq == ((1L to 100L) :+ 500L :+ 600L))
    // now a REWRITE on one branch vs a concurrent merge: the second
    // merge must conflict (its read set lost files)
    val c = t.createBranch("exp-c")
    val d = t.createBranch("exp-d")
    c.delete(col("id") <= 10L)
    d.delete(col("id") <= 5L) // overlapping base files
    t.mergeBranch("exp-c")
    intercept[java.util.ConcurrentModificationException](
      t.mergeBranch("exp-d"))
    assert(t.toDF.count() == 92L, "only exp-c's delete landed")
    // AS OF TAG sugar: fork exactly at a release pin
    val gsql = new GraftSql(spark)
    gsql.register("ct", t.path)
    gsql.sql("ALTER TABLE ct CREATE TAG rel")
    gsql.sql("DELETE FROM ct WHERE id > 400")
    gsql.sql("ALTER TABLE ct CREATE BRANCH hotfix AS OF TAG 'rel'")
    assert(gsql.sql("SELECT COUNT(*) AS c FROM ct_hotfix").head.getLong(0)
      == 92L, "the branch must fork at the tagged (pre-delete) version")
  }

  test("merging a branch's PARTITIONED writes scans correctly under " +
      "the parent (per-branch basePath grouping)") {
    import spark.implicits._
    val loc = tmpDir("br_partitioned")
    val t = GraftTable.create(spark, loc,
      (1 to 60).map(i => (i.toLong, i % 3, s"v$i")).toDF("id", "bucket", "v"),
      partitionBy = Seq("bucket"))
    val bt = t.createBranch("exp")
    bt.append((100L to 105L).map(i => (i, (i % 3).toInt, s"n$i"))
      .toDF("id", "bucket", "v"))
    t.mergeBranch("exp")
    assert(t.toDF.count() == 66L)
    // partition values must come through for BOTH layouts (parent dirs
    // and merged `_graft_branches/exp/bucket=...` dirs)
    val byBucket = t.toDF.groupBy("bucket").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byBucket == Map(0 -> 22L, 1 -> 22L, 2 -> 22L), s"got $byBucket")
    // and partition PRUNING still prunes into the merged files
    val pruned = t.readWhere(col("bucket") === 1)
    assert(pruned.count() == 22L)
  }

  /** Range-clustered 4-file fixture so each test controls exactly
    * which FILE a row-level op rewrites: f0=1..25, f1=26..50,
    * f2=51..75, f3=76..100.
    */
  private def clustered(name: String): GraftTable = {
    import spark.implicits._
    val parts = (0 until 4).map(b =>
      (b * 25 + 1 to b * 25 + 25).map(i => (i.toLong, s"v$i"))
        .toDF("id", "v").coalesce(1))
    val t = GraftTable.create(spark, tmpDir(name), parts.head)
    parts.tail.foreach(p => t.append(p))
    t
  }

  test("REBASE BRANCH (L115): disjoint write sets rebase cleanly — the " +
      "previously-conflicting merge then lands and equals the linear " +
      "result") {
    import spark.implicits._
    val t = clustered("br_rebase_clean")
    val bt = t.createBranch("exp")
    // parent rewrites f0 and appends; branch rewrites f3 and appends —
    // write sets {f0} vs {f3} are disjoint
    t.delete(col("id") <= 25L)
    t.append((200L to 204L).map(i => (i, s"p$i")).toDF("id", "v").coalesce(1))
    bt.delete(col("id") > 75L)
    bt.append((300L to 304L).map(i => (i, s"b$i")).toDF("id", "v").coalesce(1))
    // without a rebase the merge conflicts (parent removed a read file)
    intercept[java.util.ConcurrentModificationException](t.mergeBranch("exp"))
    val m = t.rebaseBranch("exp")
    assert(m("adoptedRemoves").toInt == 1 && m("adoptedAdds").toInt >= 1,
      s"rebase must adopt the parent's delete and append: $m")
    // the branch now reads the parent's since-fork change + its own
    assert(bt.toDF.select("id").as[Long].collect().sorted.toSeq ==
      ((26L to 75L) ++ (200L to 204L) ++ (300L to 304L)),
      "rebased branch = parent head + branch divergence")
    // a second rebase with a still parent is a no-op
    assert(t.rebaseBranch("exp")("adoptedAdds").toInt == 0)
    // and the merge now lands cleanly with the exact linear result
    t.mergeBranch("exp")
    assert(t.toDF.select("id").as[Long].collect().sorted.toSeq ==
      ((26L to 75L) ++ (200L to 204L) ++ (300L to 304L)),
      "post-rebase merge must equal the linear-history result")
  }

  test("REBASE BRANCH conflicts: overlapping CoW rewrites, and a " +
      "parent MoR delete against a branch CoW rewrite of the same file") {
    import spark.implicits._
    // both sides rewrite f0 → write sets overlap → refuse
    val t = clustered("br_rebase_conflict")
    val bt = t.createBranch("exp")
    t.update(col("id") === 3L, Map("v" -> lit("p")))
    bt.delete(col("id") <= 25L)
    intercept[java.util.ConcurrentModificationException](t.rebaseBranch("exp"))
    // branch survives a refused rebase untouched and still usable
    assert(bt.toDF.count() == 75L)
    // MoR vs CoW on the same file: parent masks a row of f1 with a
    // deletion vector (no file removed), branch rewrites f1 — the DV
    // scan must catch the hidden write-write overlap
    val t2 = clustered("br_rebase_dv")
    val bt2 = t2.createBranch("exp")
    t2.deleteMergeOnRead(col("id") === 30L)
    bt2.delete(col("id") >= 26L && col("id") <= 50L)
    intercept[java.util.ConcurrentModificationException](
      t2.rebaseBranch("exp"))
    // the reverse orientation: branch MoR-masks f2, parent rewrites f2
    val t3 = clustered("br_rebase_dv2")
    val bt3 = t3.createBranch("exp")
    bt3.deleteMergeOnRead(col("id") === 60L)
    t3.delete(col("id") >= 51L && col("id") <= 75L)
    intercept[java.util.ConcurrentModificationException](
      t3.rebaseBranch("exp"))
    // disjoint MoR deletes on DIFFERENT files rebase cleanly: the
    // branch adopts the parent's DV and sees both masks
    val t4 = clustered("br_rebase_dv_clean")
    val bt4 = t4.createBranch("exp")
    t4.deleteMergeOnRead(col("id") === 30L)  // DV over f1
    bt4.deleteMergeOnRead(col("id") === 60L) // DV over f2
    assert(t4.rebaseBranch("exp")("adoptedDeletionVectors").toInt == 1)
    assert(bt4.toDF.count() == 98L,
      "rebased branch must see its own AND the adopted DV mask")
    t4.mergeBranch("exp")
    assert(t4.toDF.count() == 98L)
  }

  test("REBASE BRANCH guards: sealed branches and parent schema " +
      "changes refuse; SQL surface works") {
    import spark.implicits._
    val t = clustered("br_rebase_guards")
    val bt = t.createBranch("exp")
    bt.append(Seq((500L, "b")).toDF("id", "v"))
    t.append(Seq((600L, "p")).toDF("id", "v"))
    val gsql = new GraftSql(spark)
    gsql.register("rbt", t.path)
    val sqlMetrics = gsql.sql("REBASE BRANCH exp ONTO rbt")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(sqlMetrics("adoptedAdds").toInt == 1)
    t.mergeBranch("exp")
    // sealed now — rebase refuses like every other branch write
    intercept[IllegalArgumentException](t.rebaseBranch("exp"))
    // a parent schema change since fork refuses the rebase outright
    val t2 = clustered("br_rebase_schema")
    val bt2 = t2.createBranch("exp")
    bt2.append(Seq((500L, "b")).toDF("id", "v"))
    t2.addColumn("note", org.apache.spark.sql.types.StringType)
    intercept[IllegalArgumentException](t2.rebaseBranch("exp"))
  }
}
