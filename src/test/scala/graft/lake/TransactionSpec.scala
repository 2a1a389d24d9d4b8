package graft.lake

import graft.GraftSparkSpec
import org.apache.spark.sql.functions._

/** Cross-statement transactions (BEGIN / COMMIT / ROLLBACK inside a
  * GraftSql script): statements between BEGIN and COMMIT run against
  * shallow-clone SHADOWS and land as ONE log commit per table — or
  * roll back wholesale on any failure, leaving the base untouched.
  */
class TransactionSpec extends GraftSparkSpec {

  private def freshSql(): GraftSql = new GraftSql(spark)

  test("CREATE+INSERT+UPDATE commit as one visible unit; one log commit") {
    val gsql = freshSql()
    val base = tmpDir("txn-base")
    gsql.registerCreate("accounts", base,
      spark.range(10).selectExpr("id AS k", "CAST(100 AS BIGINT) AS bal"))
    val t0 = GraftTable.forPath(spark, base)
    val v0 = t0.version
    val newLoc = tmpDir("txn-created")
    gsql.executeScript(s"""
      BEGIN;
      CREATE TABLE audit LOCATION '$newLoc' AS SELECT k, bal FROM accounts;
      INSERT INTO accounts VALUES (99, 5);
      UPDATE accounts SET bal = bal + 1 WHERE k < 3;
      COMMIT;
    """)
    // exactly ONE commit landed on the base table
    val t1 = GraftTable.forPath(spark, base)
    assert(t1.version == v0 + 1,
      s"the transaction must land as one commit: $v0 -> ${t1.version}")
    val hist = t1.history(1).collect().head
    assert(hist.getAs[String]("operation") == "TRANSACTION")
    // both DML effects visible together
    assert(gsql.sql("SELECT COUNT(*) AS n FROM accounts").head().getLong(0) == 11)
    assert(gsql.sql("SELECT SUM(bal) AS s FROM accounts").head().getLong(0)
      == 10 * 100 + 5 + 3)
    // the created table moved into place and is queryable
    assert(new TxnLog(newLoc).exists)
    assert(gsql.sql("SELECT COUNT(*) AS n FROM audit").head().getLong(0) == 10)
  }

  test("mid-script failure rolls everything back") {
    val gsql = freshSql()
    val base = tmpDir("txn-rb-base")
    gsql.registerCreate("rb_acct", base,
      spark.range(8).selectExpr("id AS k", "CAST(50 AS BIGINT) AS bal"))
    val v0 = GraftTable.forPath(spark, base).version
    val newLoc = tmpDir("txn-rb-created")
    val e = intercept[Exception](gsql.executeScript(s"""
      BEGIN;
      CREATE TABLE rb_new LOCATION '$newLoc' AS SELECT * FROM rb_acct;
      UPDATE rb_acct SET bal = 0 WHERE k < 4;
      SELECT * FROM no_such_table_anywhere;
      COMMIT;
    """))
    assert(e != null)
    // base untouched: no new version, no value change
    val t1 = GraftTable.forPath(spark, base)
    assert(t1.version == v0, "a failed transaction must not commit")
    assert(gsql.sql("SELECT SUM(bal) AS s FROM rb_acct").head().getLong(0)
      == 8 * 50)
    // staged CREATE discarded, name unregistered
    assert(!new TxnLog(newLoc).exists, "the staged CREATE must be discarded")
    intercept[Exception](gsql.sql("SELECT * FROM rb_new"))
    // shadow dirs cleaned up
    assert(!java.nio.file.Files.list(
      java.nio.file.Paths.get(base).toAbsolutePath.getParent)
      .iterator().hasNext == false) // parent listable; just smoke
  }

  test("explicit ROLLBACK restores reads inside the same script") {
    val gsql = freshSql()
    gsql.registerCreate("rb2", tmpDir("txn-rb2"),
      spark.range(5).selectExpr("id AS k", "id AS v"))
    gsql.executeScript("""
      BEGIN;
      DELETE FROM rb2 WHERE k >= 0;
      ROLLBACK;
    """)
    assert(gsql.sql("SELECT COUNT(*) AS n FROM rb2").head().getLong(0) == 5)
  }

  test("reads inside the transaction see its own writes; outside readers do not") {
    val gsql = freshSql()
    val base = tmpDir("txn-iso")
    gsql.registerCreate("iso", base,
      spark.range(6).selectExpr("id AS k", "CAST(1 AS BIGINT) AS v"))
    // outside handle reads the base directly
    val outside = GraftTable.forPath(spark, base)
    gsql.sql("BEGIN")
    gsql.sql("UPDATE iso SET v = 2 WHERE k < 3")
    // read-your-writes inside
    assert(gsql.sql("SELECT SUM(v) AS s FROM iso").head().getLong(0) == 9)
    // invisible outside until COMMIT
    assert(outside.toDF.agg(sum("v")).head().getLong(0) == 6)
    gsql.sql("COMMIT")
    assert(GraftTable.forPath(spark, base).toDF
      .agg(sum("v")).head().getLong(0) == 9)
  }

  test("concurrent writer conflicts the COMMIT and rolls back") {
    val gsql = freshSql()
    val base = tmpDir("txn-conflict")
    gsql.registerCreate("cf", base,
      spark.range(4).selectExpr("id AS k", "id AS v"))
    gsql.sql("BEGIN")
    gsql.sql("UPDATE cf SET v = 100 WHERE k = 0")
    // an external writer lands between BEGIN and COMMIT
    GraftTable.forPath(spark, base)
      .append(spark.range(4, 8).selectExpr("id AS k", "id AS v"))
    val e = intercept[java.util.ConcurrentModificationException](
      gsql.sql("COMMIT"))
    assert(e.getMessage.contains("conflict"))
    // base keeps ONLY the external writer's effect
    val rows = GraftTable.forPath(spark, base).toDF
    assert(rows.count() == 8)
    assert(rows.filter(col("v") === 100).count() == 0)
  }

  test("schema evolution inside a transaction carries to the squash") {
    val gsql = freshSql()
    val base = tmpDir("txn-schema")
    gsql.registerCreate("sc", base,
      spark.range(5).selectExpr("id AS k", "id AS v"))
    gsql.executeScript("""
      BEGIN;
      ALTER TABLE sc ADD COLUMN tag STRING;
      UPDATE sc SET tag = 'x' WHERE k < 2;
      COMMIT;
    """)
    val t = GraftTable.forPath(spark, base)
    assert(t.snapshot.schema.fieldNames.contains("tag"))
    assert(t.toDF.filter(col("tag") === "x").count() == 2)
    assert(t.snapshot.metadata.get.properties.get("graft.cloneSource").isEmpty,
      "clone markers must not leak into the squashed metadata")
  }

  test("maintenance verbs refuse inside a transaction; txn control is strict") {
    val gsql = freshSql()
    gsql.registerCreate("mt", tmpDir("txn-maint"),
      spark.range(3).selectExpr("id AS k"))
    gsql.sql("BEGIN")
    val e = intercept[IllegalArgumentException](gsql.sql("VACUUM mt"))
    assert(e.getMessage.contains("transaction"))
    gsql.sql("ROLLBACK")
    intercept[IllegalStateException](gsql.sql("COMMIT"))
    intercept[IllegalStateException](gsql.sql("ROLLBACK"))
    // a script that forgets COMMIT aborts loudly and rolls back
    val e2 = intercept[IllegalStateException](gsql.executeScript(
      "BEGIN; DELETE FROM mt WHERE k = 0;"))
    assert(e2.getMessage.contains("open transaction"))
    assert(gsql.sql("SELECT COUNT(*) AS n FROM mt").head().getLong(0) == 3)
  }

  test("multi-table transaction: each table lands exactly one commit") {
    val gsql = freshSql()
    val baseA = tmpDir("txn-multi-a")
    val baseB = tmpDir("txn-multi-b")
    gsql.registerCreate("mt_a", baseA,
      spark.range(10).selectExpr("id AS k", "CAST(1 AS BIGINT) AS v"))
    gsql.registerCreate("mt_b", baseB,
      spark.range(10).selectExpr("id AS k", "CAST(2 AS BIGINT) AS v"))
    val (va, vb) = (GraftTable.forPath(spark, baseA).version,
      GraftTable.forPath(spark, baseB).version)
    gsql.executeScript("""
      BEGIN;
      UPDATE mt_a SET v = 10 WHERE k < 5;
      DELETE FROM mt_b WHERE k >= 5;
      UPDATE mt_b SET v = 20 WHERE k = 0;
      COMMIT;
    """)
    val (ta, tb) = (GraftTable.forPath(spark, baseA),
      GraftTable.forPath(spark, baseB))
    assert(ta.version == va + 1 && tb.version == vb + 1,
      "each table's whole transaction must be ONE commit")
    assert(ta.history(1).collect().head.getAs[String]("operation")
      == "TRANSACTION")
    assert(gsql.sql("SELECT SUM(v) AS s FROM mt_a").head().getLong(0)
      == 5 * 10 + 5 * 1)
    assert(gsql.sql("SELECT COUNT(*) AS n FROM mt_b").head().getLong(0) == 5)
    assert(gsql.sql("SELECT SUM(v) AS s FROM mt_b").head().getLong(0)
      == 20 + 4 * 2)
  }

  test("pre-existing deletion-vector masks survive a transactional rewrite") {
    val gsql = freshSql()
    val base = tmpDir("txn-mor")
    gsql.registerCreate("mor", base,
      spark.range(8).selectExpr("id AS k", "id AS v"))
    // base carries a DV mask BEFORE the transaction
    GraftTable.forPath(spark, base).deleteMergeOnRead(col("k") < 2)
    gsql.executeScript("""
      BEGIN;
      UPDATE mor SET v = 99 WHERE k >= 6;
      COMMIT;
    """)
    val t = GraftTable.forPath(spark, base)
    assert(t.toDF.count() == 6, "masked rows must stay deleted")
    assert(t.toDF.filter(col("v") === 99).count() == 2)
  }

  test("backtick-quoted table DML inside a transaction is shadowed") {
    val gsql = freshSql()
    val base = tmpDir("txn-bq")
    // a hyphenated name only reachable through backticks — the alias
    // rewrite must not let its DML bypass the shadow
    gsql.registerCreate("my-sales", base,
      spark.range(6).selectExpr("id AS k", "CAST(10 AS BIGINT) AS v"))
    val v0 = GraftTable.forPath(spark, base).version
    gsql.sql("BEGIN")
    gsql.sql("UPDATE `my-sales` SET v = 99 WHERE k < 3")
    // invisible outside (the base must not have been written)
    assert(GraftTable.forPath(spark, base).version == v0,
      "backticked DML inside BEGIN must hit the shadow, not the base")
    // read-your-writes through the backticked name
    assert(gsql.sql("SELECT SUM(v) AS s FROM `my-sales`")
      .head().getLong(0) == 3 * 99 + 3 * 10)
    gsql.sql("ROLLBACK")
    assert(GraftTable.forPath(spark, base).version == v0)
    assert(gsql.sql("SELECT SUM(v) AS s FROM `my-sales`")
      .head().getLong(0) == 60, "ROLLBACK must undo backticked DML")
    // and COMMIT lands it as one commit on the base
    gsql.executeScript("""
      BEGIN;
      UPDATE `my-sales` SET v = 7 WHERE k = 0;
      DELETE FROM `my-sales` WHERE k = 5;
      COMMIT;
    """)
    val t1 = GraftTable.forPath(spark, base)
    assert(t1.version == v0 + 1, "one squashed commit for the quoted table")
    assert(gsql.sql("SELECT SUM(v) AS s FROM `my-sales`")
      .head().getLong(0) == 7 + 4 * 10)
  }

  test("a failed CTAS rolls back cleanly instead of wedging the txn") {
    val gsql = freshSql()
    gsql.registerCreate("ok_tbl", tmpDir("txn-ctasfail-base"),
      spark.range(4).selectExpr("id AS k"))
    val loc = tmpDir("txn-ctasfail-new")
    gsql.sql("BEGIN")
    // the creates entry registers before the CTAS runs; the SELECT
    // then fails, so the staged location never materializes
    val orig = intercept[Exception](gsql.sql(
      s"CREATE TABLE boom LOCATION '$loc' AS SELECT * FROM absent_tbl_xyz"))
    assert(!orig.getMessage.contains("not a GraftLake table"))
    // ROLLBACK must succeed (not throw 'not a GraftLake table') and
    // actually close the transaction
    gsql.sql("ROLLBACK")
    assert(!gsql.transactionOpen, "rollback must close the transaction")
    intercept[IllegalStateException](gsql.sql("ROLLBACK"))
    // and the same failure inside a script surfaces the ORIGINAL error
    val e2 = intercept[Exception](gsql.executeScript(s"""
      BEGIN;
      CREATE TABLE boom2 LOCATION '${tmpDir("txn-ctasfail-new2")}'
        AS SELECT * FROM absent_tbl_xyz;
      COMMIT;
    """))
    assert(!e2.getMessage.contains("not a GraftLake table"),
      s"the CTAS failure must not be masked by rollback: ${e2.getMessage}")
    assert(!gsql.transactionOpen)
    // the table stays usable
    assert(gsql.sql("SELECT COUNT(*) AS n FROM ok_tbl").head().getLong(0) == 4)
  }

  test("an append landing after the version pre-check is never deleted") {
    // simulate the race the COMMIT pre-check cannot see: a writer
    // lands BETWEEN txnControl's version check and prepareSquash's
    // snapshot read. The squash diff must run against the BEGIN
    // version, so the concurrent append's files never compute into
    // `removes` and both writes survive.
    val base = tmpDir("txn-race-base")
    val t = GraftTable.create(spark, base,
      spark.range(5).selectExpr("id AS k", "id AS v"))
    val baseVersion = t.version
    val shadowDir = s"$base.txn-race-shadow"
    val shadow = GraftTable.shallowClone(spark, base, shadowDir)
    shadow.append(spark.range(100, 105).selectExpr("id AS k", "id AS v"))
    // concurrent append to the BASE after the transaction began
    t.append(spark.range(200, 203).selectExpr("id AS k", "id AS v"))
    val plan = t.prepareSquash(shadow, baseVersion)
    t.commitSquash(plan)
    shadow.deleteTransactionDir(shadowDir)
    val rows = GraftTable.forPath(spark, base).toDF
    assert(rows.count() == 13,
      s"concurrent append must survive the squash: ${rows.count()} rows")
    assert(rows.filter(col("k") >= 200).count() == 3,
      "the concurrent append's rows were deleted by the squash")
    assert(rows.filter(col("k") >= 100 && col("k") < 200).count() == 5)
  }

  private def twoTableFixture(tag: String): (GraftSql, String, String) = {
    val gsql = freshSql()
    val baseA = tmpDir(s"txn-$tag-a")
    val baseB = tmpDir(s"txn-$tag-b")
    gsql.registerCreate(s"${tag}_a", baseA,
      spark.range(10).selectExpr("id AS k", "CAST(1 AS BIGINT) AS v"))
    gsql.registerCreate(s"${tag}_b", baseB,
      spark.range(10).selectExpr("id AS k", "CAST(2 AS BIGINT) AS v"))
    (gsql, baseA, baseB)
  }

  test("crash between the two tables' reservations: NEITHER advances") {
    val oldGrace = TxnLog.PendingGraceMs
    TxnLog.PendingGraceMs = 0 // post-crash accessors decide immediately
    try {
      val (gsql, baseA, baseB) = twoTableFixture("crash1")
      val (va, vb) = (GraftTable.forPath(spark, baseA).version,
        GraftTable.forPath(spark, baseB).version)
      gsql.txnCrashHook = p =>
        if (p == "after-reserve-0") throw new GraftSql.SimulatedCrash(p)
      gsql.sql("BEGIN")
      gsql.sql("UPDATE crash1_a SET v = 100 WHERE k < 5")
      gsql.sql("UPDATE crash1_b SET v = 200 WHERE k < 5")
      intercept[GraftSql.SimulatedCrash](gsql.sql("COMMIT"))
      // recovery from on-disk state alone, as a restarted process:
      // table A holds an undecided reservation; first access decides
      // ABORT (grace 0), so its CONTENT matches the pre-txn state
      val ta = GraftTable.forPath(spark, baseA)
      val tb = GraftTable.forPath(spark, baseB)
      assert(ta.toDF.agg(sum("v")).head().getLong(0) == 10,
        "table A's reserved-but-undecided squash must resolve ABORT")
      assert(tb.version == vb && tb.toDF.agg(sum("v")).head().getLong(0) == 20,
        "table B was never reserved and must be untouched")
      assert(ta.history(1).collect().head.getAs[String]("operation")
        == "TRANSACTION ABORTED",
        "the aborted reservation must be visible in history as such")
      assert(ta.version == va + 1, "the aborted marker consumes a version")
    } finally TxnLog.PendingGraceMs = oldGrace
  }

  test("crash right after the decision: BOTH tables advance") {
    val oldGrace = TxnLog.PendingGraceMs
    TxnLog.PendingGraceMs = 0
    try {
      val (gsql, baseA, baseB) = twoTableFixture("crash2")
      gsql.txnCrashHook = p =>
        if (p == "after-decision") throw new GraftSql.SimulatedCrash(p)
      gsql.sql("BEGIN")
      gsql.sql("UPDATE crash2_a SET v = 100 WHERE k < 5")
      gsql.sql("UPDATE crash2_b SET v = 200 WHERE k < 5")
      intercept[GraftSql.SimulatedCrash](gsql.sql("COMMIT"))
      // the decision file IS the commit: both reservations resolve
      // committed on first access, no coordinator needed afterwards
      val ta = GraftTable.forPath(spark, baseA)
      val tb = GraftTable.forPath(spark, baseB)
      assert(ta.toDF.agg(sum("v")).head().getLong(0) == 5 * 100 + 5,
        "table A must show the transaction after the decision landed")
      assert(tb.toDF.agg(sum("v")).head().getLong(0) == 5 * 200 + 10,
        "table B must show the transaction after the decision landed")
      assert(ta.history(1).collect().head.getAs[String]("operation")
        == "TRANSACTION")
      assert(tb.history(1).collect().head.getAs[String]("operation")
        == "TRANSACTION")
    } finally TxnLog.PendingGraceMs = oldGrace
  }

  test("an in-flight reservation is invisible until the decision lands") {
    // drive the TxnLog protocol directly: within the grace window a
    // pending marker hides its version from readers instead of
    // aborting a live transaction; the decision flips it atomically
    val base = tmpDir("txn-pending-base")
    val t = GraftTable.create(spark, base,
      spark.range(4).selectExpr("id AS k", "id AS v"))
    val v0 = t.version
    val shadowDir = s"$base.txn-pending-shadow"
    val shadow = GraftTable.shallowClone(spark, base, shadowDir)
    shadow.append(spark.range(100, 102).selectExpr("id AS k", "id AS v"))
    val plan = t.prepareSquash(shadow, v0)
    val coord = java.nio.file.Paths
      .get(base, "_graft_log", "_txncoord", "spec-pending.decision")
      .toAbsolutePath.toString
    t.reserveSquash(plan, coord, "spec-pending")
    // grace default (5s) >> this read: the reservation stays hidden
    val mid = GraftTable.forPath(spark, base)
    assert(mid.version == v0, "a fresh pending marker must be invisible")
    assert(mid.toDF.count() == 4)
    // the atomic flip
    assert(t.log.decide(coord, "commit") == "commit")
    val after = GraftTable.forPath(spark, base)
    assert(after.version == v0 + 1)
    assert(after.toDF.count() == 6,
      "the decided reservation must be fully visible")
    shadow.deleteTransactionDir(shadowDir)
  }

  test("a writer blocked by a crashed reservation recovers after the grace") {
    val oldGrace = TxnLog.PendingGraceMs
    TxnLog.PendingGraceMs = 200 // short, but long enough to be 'pending'
    try {
      val base = tmpDir("txn-writerwait-base")
      val t = GraftTable.create(spark, base,
        spark.range(4).selectExpr("id AS k", "id AS v"))
      val v0 = t.version
      val shadowDir = s"$base.txn-ww-shadow"
      val shadow = GraftTable.shallowClone(spark, base, shadowDir)
      shadow.append(spark.range(50, 52).selectExpr("id AS k", "id AS v"))
      val coord = java.nio.file.Paths
        .get(base, "_graft_log", "_txncoord", "spec-ww.decision")
        .toAbsolutePath.toString
      t.reserveSquash(t.prepareSquash(shadow, v0), coord, "spec-ww")
      // the coordinator 'crashed' here — an independent writer must
      // back off through the grace window, decide ABORT for the dead
      // transaction, and land its own commit at the next version
      val t2 = GraftTable.forPath(spark, base)
      t2.append(spark.range(90, 93).selectExpr("id AS k", "id AS v"))
      val rows = GraftTable.forPath(spark, base).toDF
      assert(rows.count() == 7, "writer's append + original rows only")
      assert(rows.filter(col("k") >= 50 && col("k") < 90).count() == 0,
        "the dead transaction's rows must not appear")
      val hist = GraftTable.forPath(spark, base).history(10).collect()
        .map(_.getAs[String]("operation"))
      assert(hist.contains("TRANSACTION ABORTED"),
        s"the dead reservation must resolve ABORT in history: ${hist.toSeq}")
      shadow.deleteTransactionDir(shadowDir)
    } finally TxnLog.PendingGraceMs = oldGrace
  }

  test("gated CTAS: crash after publish but before the decision leaves " +
      "NO phantom table; crash after the decision leaves it readable") {
    val oldGrace = TxnLog.PendingGraceMs
    TxnLog.PendingGraceMs = 0
    try {
      // crash BEFORE decision: DML table unchanged, created table
      // resolves to a clear aborted-creation error, never phantom rows
      val (gsql, baseA, _) = twoTableFixture("ctascrash1")
      val newLoc = tmpDir("ctascrash1-new")
      gsql.txnCrashHook = p =>
        if (p.startsWith("after-create-publish")) throw new GraftSql.SimulatedCrash(p)
      gsql.sql("BEGIN")
      gsql.sql("UPDATE ctascrash1_a SET v = 100 WHERE k < 5")
      gsql.sql(s"CREATE TABLE snap1 LOCATION '$newLoc' AS SELECT * FROM ctascrash1_a")
      intercept[GraftSql.SimulatedCrash](gsql.sql("COMMIT"))
      assert(GraftTable.forPath(spark, baseA).toDF
        .agg(sum("v")).head().getLong(0) == 10,
        "the DML participant must resolve ABORT")
      val e = intercept[IllegalStateException](
        GraftTable.forPath(spark, newLoc).toDF.count())
      assert(e.getMessage.contains("creating transaction aborted"),
        s"aborted gated create must read as a clear error: ${e.getMessage}")

      // crash AFTER decision: both the DML effect and the created
      // table are durable — recovery is read-side only
      val (gsql2, base2A, _) = twoTableFixture("ctascrash2")
      val newLoc2 = tmpDir("ctascrash2-new")
      gsql2.txnCrashHook = p =>
        if (p == "after-decision") throw new GraftSql.SimulatedCrash(p)
      gsql2.sql("BEGIN")
      gsql2.sql("UPDATE ctascrash2_a SET v = 100 WHERE k < 5")
      gsql2.sql(s"CREATE TABLE snap2 LOCATION '$newLoc2' AS SELECT * FROM ctascrash2_a")
      intercept[GraftSql.SimulatedCrash](gsql2.sql("COMMIT"))
      assert(GraftTable.forPath(spark, base2A).toDF
        .agg(sum("v")).head().getLong(0) == 5 * 100 + 5,
        "the DML participant must be committed after the decision")
      val created = GraftTable.forPath(spark, newLoc2).toDF
      assert(created.count() == 10 &&
        created.agg(sum("v")).head().getLong(0) == 5 * 100 + 5,
        "the created table must be readable with the txn-visible rows")
    } finally TxnLog.PendingGraceMs = oldGrace
  }

  test("decision stolen by a concurrent abort: a published gated CTAS " +
      "unpublishes and the DML rolls back") {
    val (gsql, baseA, _) = twoTableFixture("ctassteal")
    val newLoc = tmpDir("ctassteal-new")
    gsql.txnCrashHook = p =>
      if (p.startsWith("after-create-publish")) {
        // a concurrent accessor decides ABORT in the window between
        // the publish and our commit decision: read the coordinator
        // path out of the published table's v0 marker and win the race
        val marker = java.nio.file.Files.readAllLines(
          java.nio.file.Paths.get(newLoc, "_graft_log",
            f"${0L}%020d.json")).get(0)
        val coord = """"coord": "([^"]+)"""".r
          .findFirstMatchIn(marker).get.group(1)
        val cp = java.nio.file.Paths.get(coord)
        java.nio.file.Files.createDirectories(cp.getParent)
        java.nio.file.Files.write(cp, "abort".getBytes,
          java.nio.file.StandardOpenOption.CREATE_NEW)
      }
    gsql.sql("BEGIN")
    gsql.sql("UPDATE ctassteal_a SET v = 100 WHERE k < 5")
    gsql.sql(s"CREATE TABLE snap4 LOCATION '$newLoc' AS SELECT * FROM ctassteal_a")
    intercept[java.util.ConcurrentModificationException](gsql.sql("COMMIT"))
    assert(!GraftTable.isGraftTable(newLoc),
      "the gated create must unpublish when the decision is lost")
    assert(GraftTable.forPath(spark, baseA).toDF
      .agg(sum("v")).head().getLong(0) == 10,
      "the DML participant must resolve ABORT too")
  }

  test("conflict aborts a transaction carrying a CTAS: nothing publishes") {
    val (gsql, baseA, baseB) = twoTableFixture("ctasconf")
    val newLoc = tmpDir("ctasconf-new")
    gsql.sql("BEGIN")
    gsql.sql("UPDATE ctasconf_a SET v = 100 WHERE k < 5")
    gsql.sql("UPDATE ctasconf_b SET v = 100 WHERE k < 5")
    gsql.sql(s"CREATE TABLE snap3 LOCATION '$newLoc' AS SELECT * FROM ctasconf_a")
    // concurrent writer invalidates the pre-check -> COMMIT aborts
    GraftTable.forPath(spark, baseA)
      .append(spark.range(100, 102).selectExpr("id AS k", "id AS v"))
    intercept[java.util.ConcurrentModificationException](gsql.sql("COMMIT"))
    assert(!GraftTable.isGraftTable(newLoc),
      "an aborted transaction's gated create must unpublish entirely")
    intercept[Exception](gsql.sql("SELECT * FROM snap3"))
  }

  test("streaming source: an undecided reservation is invisible and " +
      "emits exactly once after the decision (ST20)") {
    import org.apache.spark.sql.streaming.Trigger
    def runOnce(path: String, ckpt: String): Seq[org.apache.spark.sql.Row] = {
      val got = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
      val q = spark.readStream.format("graftlake").load(path)
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          got.synchronized { got ++= b.collect() }; ()
        }.start()
      q.awaitTermination(120000)
      got.toSeq
    }
    val path = tmpDir("txn-stream-table")
    val ckpt = tmpDir("txn-stream-ckpt")
    val t = GraftTable.create(spark, path,
      spark.range(10).selectExpr("id AS k", "id AS v"))
    assert(runOnce(path, ckpt).size == 10) // initial snapshot

    // an in-flight multi-table transaction reserves a version but its
    // decision has not landed: the stream must see NOTHING (a pending
    // marker is not part of the log), not fail, and not emit rows
    // that could later abort
    val shadowDir = s"$path.txn-st20-shadow"
    val shadow = GraftTable.shallowClone(spark, path, shadowDir)
    shadow.append(spark.range(100, 105).selectExpr("id AS k", "id AS v"))
    val coord = java.nio.file.Paths
      .get(path, "_graft_log", "_txncoord", "spec-st20.decision")
      .toAbsolutePath.toString
    t.reserveSquash(t.prepareSquash(shadow, t.version), coord, "spec-st20")
    assert(runOnce(path, ckpt).isEmpty,
      "a pending reservation must be invisible to the streaming source")

    // decision lands -> exactly the transaction's rows emit, once
    assert(t.log.decide(coord, "commit") == "commit")
    val afterCommit = runOnce(path, ckpt)
    assert(afterCommit.size == 5,
      s"the decided transaction must emit its 5 rows once, got ${afterCommit.size}")
    assert(runOnce(path, ckpt).isEmpty, "no re-emission after the decision")
    shadow.deleteTransactionDir(shadowDir)
  }

  test("two multi-table COMMITs racing on the same tables: one wins, " +
      "one aborts, no lost or phantom rows") {
    val oldGrace = TxnLog.PendingGraceMs
    TxnLog.PendingGraceMs = 100 // B treats A's mid-commit pause as crashed
    try {
      val baseA = tmpDir("txn-race2-a")
      val baseB = tmpDir("txn-race2-b")
      val mkA = GraftTable.create(spark, baseA,
        spark.range(10).selectExpr("id AS k", "CAST(1 AS BIGINT) AS v"))
      GraftTable.create(spark, baseB,
        spark.range(10).selectExpr("id AS k", "CAST(2 AS BIGINT) AS v"))
      val gsqlA = freshSql(); val gsqlB = freshSql()
      Seq(gsqlA, gsqlB).foreach { g =>
        g.register("ra", baseA); g.register("rb", baseB)
      }
      // interleave DETERMINISTICALLY: A pauses after its first
      // reservation; B runs its whole competing COMMIT during the
      // pause (it waits out A's pending marker, decides A dead, and
      // commits); A then resumes, its decision loses, and it rolls
      // back — optimistic concurrency at the transaction grain
      var bError: Throwable = null
      gsqlA.txnCrashHook = p =>
        if (p == "after-reserve-0") {
          try gsqlB.executeScript("""
            BEGIN;
            UPDATE ra SET v = 200 WHERE k < 5;
            UPDATE rb SET v = 300 WHERE k < 5;
            COMMIT;
          """)
          catch { case e: Throwable => bError = e }
        }
      gsqlA.sql("BEGIN")
      gsqlA.sql("UPDATE ra SET v = 100 WHERE k < 5")
      gsqlA.sql("UPDATE rb SET v = 100 WHERE k < 5")
      val aFailed =
        try { gsqlA.sql("COMMIT"); false }
        catch { case _: java.util.ConcurrentModificationException => true }
      val sumA = GraftTable.forPath(spark, baseA).toDF
        .agg(sum("v")).head().getLong(0)
      val sumB = GraftTable.forPath(spark, baseB).toDF
        .agg(sum("v")).head().getLong(0)
      // safety invariants (the interleaving permits three outcomes —
      // A wins, B wins, or BOTH abort when B kills A's pending marker
      // and then trips over the aborted version in its own pre-check;
      // what must NEVER happen is both committing, or a table showing
      // one transaction while its sibling shows the other):
      val aWon = !aFailed
      val bWon = bError == null
      assert(!(aWon && bWon), "at most one racing transaction may commit")
      val expected =
        if (aWon) (5L * 100 + 5, 5L * 100 + 10)
        else if (bWon) (5L * 200 + 5, 5L * 300 + 10)
        else (10L, 20L) // both aborted: both tables untouched
      assert((sumA, sumB) == expected,
        s"state must match the winner ATOMICALLY on both tables: " +
          s"aWon=$aWon bWon=$bWon bErr=${Option(bError).map(_.getMessage)} " +
          s"sums=($sumA,$sumB) expected=$expected")
    } finally TxnLog.PendingGraceMs = oldGrace
  }

  test("DV-only and add-only squashes conflict on intervening removes/masks") {
    // a shadow whose only change is a deletion-vector mask previously
    // took the no-check commit fast path; an intervening remove (or
    // mask) of a file the transaction READ must now abort it
    val base = tmpDir("txn-dvonly-base")
    val t = GraftTable.create(spark, base,
      spark.range(8).selectExpr("id AS k", "id AS v"))
    val baseVersion = t.version
    val shadowDir = s"$base.txn-dvonly-shadow"
    val shadow = GraftTable.shallowClone(spark, base, shadowDir)
    shadow.deleteMergeOnRead(col("k") === 1) // AddDV only, no removes
    // concurrent CoW delete rewrites (removes) a base file
    t.delete(col("k") === 7)
    val plan = t.prepareSquash(shadow, baseVersion)
    intercept[java.util.ConcurrentModificationException](
      t.commitSquash(plan))
    shadow.deleteTransactionDir(shadowDir)
    // and an intervening MoR mask conflicts an add-only squash too
    val base2 = tmpDir("txn-addonly-base")
    val t2 = GraftTable.create(spark, base2,
      spark.range(8).selectExpr("id AS k", "id AS v"))
    val v2 = t2.version
    val shadowDir2 = s"$base2.txn-addonly-shadow"
    val shadow2 = GraftTable.shallowClone(spark, base2, shadowDir2)
    shadow2.append(spark.range(100, 103).selectExpr("id AS k", "id AS v"))
    t2.deleteMergeOnRead(col("k") === 0) // concurrent AddDV on the base
    val plan2 = t2.prepareSquash(shadow2, v2)
    intercept[java.util.ConcurrentModificationException](
      t2.commitSquash(plan2))
    shadow2.deleteTransactionDir(shadowDir2)
  }

  /** The coordinator decision path embedded in a table's latest
    * version-file marker (the marker line is permanent; resolution
    * consults seals/decisions, never rewrites it).
    */
  private def coordPathOf(base: String): String = {
    import scala.jdk.CollectionConverters._
    val logDir = java.nio.file.Paths.get(base, "_graft_log")
    val s = java.nio.file.Files.list(logDir)
    val latest = try s.iterator().asScala.map(_.getFileName.toString)
      .filter(n => n.endsWith(".json") && n.length == 25).max
    finally s.close()
    val line = java.nio.file.Files
      .readAllLines(logDir.resolve(latest)).get(0)
    """"coord": "([^"]+)"""".r.findFirstMatchIn(line).get.group(1)
  }

  private def rmTree(dir: String): Unit = {
    import scala.jdk.CollectionConverters._
    val w = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
    val all = try w.iterator().asScala.toSeq finally w.close()
    all.reverse.foreach(java.nio.file.Files.deleteIfExists(_))
  }

  test("committed outcome survives DROP of the coordinator-host table " +
      "(local decision seal)") {
    val oldGrace = TxnLog.PendingGraceMs
    TxnLog.PendingGraceMs = 0 // any undecided marker aborts instantly
    try {
      val (gsql, baseA, baseB) = twoTableFixture("sealdrop")
      gsql.executeScript("""
        BEGIN;
        UPDATE sealdrop_a SET v = 100 WHERE k < 5;
        UPDATE sealdrop_b SET v = 200 WHERE k < 5;
        COMMIT;
      """)
      // the decision file lives inside ONE participant's directory
      // (the coordinator host). Simulate a later DROP TABLE of the
      // host: the SURVIVING participant's committed marker must still
      // resolve COMMIT from its own local seal — never grace-abort
      // into reverting a committed transaction.
      val coord = coordPathOf(baseB)
      val (host, survivor, survivorSum) =
        if (coord.startsWith(baseA)) (baseA, baseB, 5L * 200 + 10)
        else (baseB, baseA, 5L * 100 + 5)
      rmTree(host)
      // fresh handle, on-disk state only, grace 0: without the seal
      // this read would decide ABORT and silently revert the survivor
      val tb = GraftTable.forPath(spark, survivor)
      assert(tb.toDF.agg(sum("v")).head().getLong(0) == survivorSum,
        "the committed transaction must survive the host table's DROP")
      assert(tb.history(1).collect().head.getAs[String]("operation")
        == "TRANSACTION",
        "the marker must still resolve COMMITTED, not aborted")
    } finally TxnLog.PendingGraceMs = oldGrace
  }

  test("abort outcome observed via the coordinator is sealed locally " +
      "and stays stable after the host disappears") {
    val oldGrace = TxnLog.PendingGraceMs
    TxnLog.PendingGraceMs = 0
    try {
      val (gsql, baseA, baseB) = twoTableFixture("sealabort")
      gsql.txnCrashHook = p =>
        if (p == "after-reserve-1") throw new GraftSql.SimulatedCrash(p)
      gsql.sql("BEGIN")
      gsql.sql("UPDATE sealabort_a SET v = 100 WHERE k < 5")
      gsql.sql("UPDATE sealabort_b SET v = 200 WHERE k < 5")
      intercept[GraftSql.SimulatedCrash](gsql.sql("COMMIT"))
      val coord = coordPathOf(baseB)
      val (host, survivor) =
        if (coord.startsWith(baseA)) (baseA, baseB) else (baseB, baseA)
      // first access grace-aborts both reservations via the (still
      // present) coordinator path and seals the outcome locally in the
      // survivor's own _txn dir
      assert(GraftTable.forPath(spark, survivor).toDF
        .agg(sum("v")).head().getLong(0)
        == (if (survivor == baseA) 10L else 20L))
      // the host disappears; the survivor's aborted marker must keep
      // resolving ABORTED from the seal without recreating the
      // coordinator path inside the deleted directory
      rmTree(host)
      val tb = GraftTable.forPath(spark, survivor)
      assert(tb.toDF.agg(sum("v")).head().getLong(0)
        == (if (survivor == baseA) 10L else 20L))
      assert(tb.history(1).collect().head.getAs[String]("operation")
        == "TRANSACTION ABORTED")
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(host,
        "_graft_log", "_txncoord")),
        "a sealed outcome must not resurrect the dropped host's log dir")
    } finally TxnLog.PendingGraceMs = oldGrace
  }

  test("failure publishing the 2nd of two gated CTAS tables unpublishes " +
      "the 1st (no aborted-reservation husk left behind)") {
    val gsql = freshSql()
    val base = tmpDir("txn-pubfail-base")
    gsql.registerCreate("pubfail_src", base,
      spark.range(10).selectExpr("id AS k", "CAST(1 AS BIGINT) AS v"))
    val loc1 = tmpDir("txn-pubfail-new1")
    val loc2 = tmpDir("txn-pubfail-new2")
    // make the SECOND create's final location unmovable: a non-empty
    // directory already there makes Files.move throw mid-publish
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(loc2, "occupied"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(loc2, "occupied", "x"), "x".getBytes)
    intercept[Exception](gsql.executeScript(s"""
      BEGIN;
      CREATE TABLE pub1 LOCATION '$loc1' AS SELECT * FROM pubfail_src;
      CREATE TABLE pub2 LOCATION '$loc2' AS SELECT * FROM pubfail_src WHERE k < 5;
      COMMIT;
    """))
    // the 1st create moved into place BEFORE the 2nd failed: the abort
    // handler must know about it and unpublish — otherwise an
    // aborted-reservation husk blocks ever re-creating a table there
    assert(!GraftTable.isGraftTable(loc1),
      "the partially-published 1st create must be unpublished on abort")
    // and the location is actually reusable: the same CTAS now succeeds
    gsql.executeScript(s"""
      BEGIN;
      CREATE TABLE pub1 LOCATION '$loc1' AS SELECT * FROM pubfail_src;
      INSERT INTO pubfail_src VALUES (99, 7);
      COMMIT;
    """)
    assert(GraftTable.forPath(spark, loc1).toDF.count() == 10)
    assert(GraftTable.forPath(spark, base).toDF.count() == 11)
  }

  test("transactional COMMIT refreshes external artifacts: participants' " +
      "auto-manifests track the decided state (reserved commits never " +
      "ran the per-commit hooks)") {
    val gsql = freshSql()
    val aLoc = tmpDir("txn-art-a"); val bLoc = tmpDir("txn-art-b")
    GraftTable.create(spark, aLoc,
      spark.range(10).selectExpr("id AS k", "id AS v"),
      properties = Map("graft.manifest.autoGenerate" -> "true"))
    GraftTable.create(spark, bLoc,
      spark.range(10).selectExpr("id AS k", "id AS v"),
      properties = Map("graft.manifest.autoGenerate" -> "true"))
    gsql.register("arta", aLoc); gsql.register("artb", bLoc)
    def extCount(loc: String): Long = spark.read.parquet(
      spark.read.textFile(java.nio.file.Paths
        .get(loc, "_graft_manifest", "manifest").toString)
        .collect().toIndexedSeq: _*).count()
    assert(extCount(aLoc) == 10 && extCount(bLoc) == 10)
    gsql.executeScript("""
      BEGIN;
      INSERT INTO arta VALUES (100, 1);
      INSERT INTO artb VALUES (200, 2);
      COMMIT;
    """)
    assert(extCount(aLoc) == 11,
      "participant A's manifest must track the decided multi-table state")
    assert(extCount(bLoc) == 11,
      "participant B's manifest must track the decided multi-table state")
  }

  test("transactional COMMIT refreshes the Delta-log export: a " +
      "participant's auto _delta_log tracks the decided state") {
    val gsql = freshSql()
    val loc = tmpDir("txn-art-delta")
    GraftTable.create(spark, loc,
      spark.range(10).selectExpr("id AS k", "id AS v"),
      properties = Map("graft.delta.autoExport" -> "true"))
    // the CREATE hook ran before the property landed in the read
    // snapshot; the first layout commit seeds the export
    GraftTable.forPath(spark, loc)
      .append(spark.range(10, 20).selectExpr("id AS k", "id AS v"))
    assert(DeltaExport.externalRead(spark, loc).count() == 20)
    val v0 = DeltaExport.parse(loc).version
    gsql.register("artd", loc)
    gsql.executeScript("""
      BEGIN;
      INSERT INTO artd VALUES (100, 1);
      COMMIT;
    """)
    assert(DeltaExport.parse(loc).version == v0 + 1,
      "the decided transactional state must append one sync commit")
    assert(DeltaExport.externalRead(spark, loc).count() == 21,
      "external Delta readers must see the decided state")
  }

  test("heartbeat covers gated-CTAS reservations: later phase-2 work " +
      "refreshes a published create's version-0 marker") {
    // r12 advisory: only DML squash reservations used to heartbeat —
    // a long publish phase could age a live created table's
    // reservation past the grace window. Two creates in one txn: by
    // the time the SECOND publishes, the beat list must have
    // refreshed the FIRST's version-0 marker mtime.
    val gsql = freshSql()
    val base = tmpDir("txn-hb-ctas-base")
    gsql.registerCreate("hb_src", base,
      spark.range(10).selectExpr("id AS k", "id AS v"))
    val loc1 = tmpDir("txn-hb-ctas-1")
    val loc2 = tmpDir("txn-hb-ctas-2")
    val locOf = Map("hb1" -> loc1, "hb2" -> loc2)
    def markerMtime(loc: String): Long = java.nio.file.Files
      .getLastModifiedTime(java.nio.file.Paths.get(
        loc, "_graft_log", f"${0L}%020d.json")).toMillis
    var firstLoc: Option[String] = None
    var firstMtime = 0L
    var refreshed = false
    gsql.txnCrashHook = p =>
      if (p.startsWith("after-create-publish-")) {
        val name = p.stripPrefix("after-create-publish-")
        firstLoc match {
          case None =>
            firstLoc = Some(locOf(name))
            firstMtime = markerMtime(locOf(name))
            Thread.sleep(20) // outlast filesystem mtime granularity
          case Some(l) =>
            refreshed = markerMtime(l) > firstMtime
        }
      }
    gsql.executeScript(s"""
      BEGIN;
      CREATE TABLE hb1 LOCATION '$loc1' AS SELECT * FROM hb_src;
      CREATE TABLE hb2 LOCATION '$loc2' AS SELECT * FROM hb_src WHERE k < 5;
      COMMIT;
    """)
    assert(firstLoc.isDefined, "two creates must route through phase 2")
    assert(refreshed,
      "the second publish's beat must refresh the first create's marker")
    assert(GraftTable.forPath(spark, loc1).toDF.count() == 10)
    assert(GraftTable.forPath(spark, loc2).toDF.count() == 5)
  }

  test("heartbeat: a slow live coordinator is not grace-aborted while " +
      "it makes progress") {
    val oldGrace = TxnLog.PendingGraceMs
    TxnLog.PendingGraceMs = 300
    try {
      val base = tmpDir("txn-hb-base")
      val t = GraftTable.create(spark, base,
        spark.range(4).selectExpr("id AS k", "id AS v"))
      val v0 = t.version
      val shadowDir = s"$base.txn-hb-shadow"
      val shadow = GraftTable.shallowClone(spark, base, shadowDir)
      shadow.append(spark.range(100, 102).selectExpr("id AS k", "id AS v"))
      val coord = java.nio.file.Paths
        .get(base, "_graft_log", "_txncoord", "spec-hb.decision")
        .toAbsolutePath.toString
      val v = t.reserveSquash(t.prepareSquash(shadow, v0), coord, "spec-hb")
      // simulate a coordinator mid-phase-2 on a big transaction: total
      // elapsed time far exceeds the grace window, but each heartbeat
      // proves liveness — concurrent readers must keep treating the
      // marker as pending (invisible), never abort it
      (1 to 4).foreach { _ =>
        Thread.sleep(200) // grace is 300: an unrefreshed marker dies here
        t.log.refreshReservation(v)
        val mid = GraftTable.forPath(spark, base)
        assert(mid.version == v0,
          "a heartbeating reservation must stay pending, not abort")
      }
      // ...and the eventual decision still commits it
      assert(t.log.decide(coord, "commit") == "commit")
      assert(GraftTable.forPath(spark, base).toDF.count() == 6)
      shadow.deleteTransactionDir(shadowDir)
    } finally TxnLog.PendingGraceMs = oldGrace
  }
}
