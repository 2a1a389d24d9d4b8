package graft.lake

import graft.GraftSparkSpec
import org.apache.spark.sql.functions._

/** Row filters + column masks (L114 — storage-layer governance):
  * policy enforcement on every public read surface, maintenance ops
  * reading RAW by construction, pruning-soundness guards on masked
  * predicates, policy-invariant schema, and the MV exclusivity rule.
  */
class GovernanceSpec extends GraftSparkSpec {

  private def fixture(name: String): GraftTable = {
    import spark.implicits._
    GraftTable.create(spark, tmpDir(name),
      (1 to 100).map(i => (i.toLong, s"user$i@x.com", i % 10))
        .toDF("id", "email", "grade").repartition(4))
  }

  test("row filter + mask apply on toDF / SQL / time travel / tags; " +
      "schema is policy-invariant; masks see RAW inputs") {
    val t = fixture("gov_basic")
    t.createTag("pre-policy")
    t.setRowFilter("grade < 5")
    t.setColumnMask("email",
      "concat('***', substring(email, char_length(email) - 3, 4))")
    assert(t.toDF.count() == 50L)
    assert(t.toDF.schema.map(f => (f.name, f.dataType)) ==
      t.snapshot.schema.map(f => (f.name, f.dataType)),
      "masking must not change the read schema (names/types)")
    val emails = t.toDF.select("email").collect().map(_.getString(0))
    assert(emails.forall(_.startsWith("***")),
      "every visible email must be masked")
    // masks evaluate against RAW values: the substring above reads the
    // ORIGINAL email's tail, which survives into the masked value
    assert(emails.exists(_.endsWith(".com")))
    // time travel and tag reads enforce the CURRENT policy — policy
    // strengthening closes VERSION AS OF too
    assert(t.toDFAt(0).count() == 50L,
      "time travel must not bypass the row filter")
    assert(t.toDFAtTag("pre-policy").select("email").collect()
      .forall(_.getString(0).startsWith("***")),
      "tag reads must not bypass the mask")
    // SQL via GraftSql registration reads governed too
    val gsql = new GraftSql(spark)
    gsql.register("gov", t.path)
    assert(gsql.sql("SELECT COUNT(*) AS c FROM gov").head.getLong(0) == 50L)
    // clearing restores raw reads
    t.clearRowFilter()
    t.clearColumnMask("email")
    assert(t.toDF.count() == 100L)
    assert(t.toDF.select("email").collect()
      .forall(!_.getString(0).startsWith("***")))
  }

  test("readWhere: pruning stays on for clean predicates, a predicate " +
      "over a MASKED column disables stats pruning and matches masked " +
      "values") {
    val t = fixture("gov_prune")
    t.setColumnMask("id", "CAST(id % 7 AS BIGINT)")
    // predicate on the masked column: must evaluate against the MASKED
    // value (what the reader sees), and must not be stats-pruned on
    // raw footers (raw id range 1..100 vs masked range 0..6)
    val hit = t.readWhere(col("id") === 3L)
    assert(hit.count() == 14L, // ids 3,10,17,...,94 with id%7==3
      "masked-column predicate must match masked values")
    assert(hit.select("id").collect().forall(_.getLong(0) == 3L))
    // predicate on an unmasked column keeps full skipping + the mask
    val g = t.readWhere(col("grade") === 1)
    assert(g.count() == 10L)
    assert(g.select("id").collect().forall(_.getLong(0) < 7L))
  }

  test("maintenance reads RAW: OPTIMIZE preserves hidden rows, " +
      "ANALYZE/constraints validate true data") {
    val t = fixture("gov_maintenance")
    t.setRowFilter("grade < 5")
    t.setColumnMask("email", "'hidden'")
    // OPTIMIZE rewrites through the raw path: hidden rows survive
    t.optimize()
    assert(t.toDF.count() == 50L)
    t.clearRowFilter()
    assert(t.toDF.count() == 100L,
      "OPTIMIZE under a row filter must never drop hidden rows")
    t.setRowFilter("grade < 5")
    // CHECK constraint validation runs on raw rows: a constraint
    // violated only by HIDDEN rows must still refuse
    intercept[IllegalArgumentException](
      t.addConstraint("low_grade", "grade < 5"))
    // ANALYZE sees raw values (stats feed pruning of raw footers)
    val statsRow = t.computeStats().filter(col("column") === "email")
      .select("n_distinct").head
    assert(statsRow.getLong(0) > 1L,
      "stats must describe raw data, not the constant mask")
  }

  test("public CDC is governed (r15): changesBetween, TABLE CHANGES, " +
      "batch CDF relation, and streaming CDF never show a hidden row " +
      "or an unmasked value") {
    import spark.implicits._
    val t = fixture("gov_cdf")
    t.setRowFilter("grade < 5")
    t.setColumnMask("email", "'hidden'")
    // the appended batch: one visible row (grade 1), one hidden (grade 9)
    t.append(Seq((200L, "vis@x.com", 1), (201L, "sec@x.com", 9))
      .toDF("id", "email", "grade"))
    val v = t.version
    // changesBetween: hidden row's change invisible, values masked
    val cb = t.changesBetween(v - 1, v)
    assert(cb.count() == 1L && cb.select("id").head.getLong(0) == 200L)
    assert(cb.select("email").head.getString(0) == "hidden",
      "change rows must carry MASKED values")
    // TABLE CHANGES (SQL surface)
    val gsql = new GraftSql(spark)
    gsql.register("gov_cdf_t", t.path)
    val tc = gsql.sql(s"TABLE CHANGES gov_cdf_t BETWEEN $v AND $v")
    assert(tc.count() == 1L && tc.select("id").head.getLong(0) == 200L)
    assert(tc.select("email").head.getString(0) == "hidden")
    // batch CDF relation (readChangeFeed option)
    val rel = spark.read.format("graftlake")
      .option("readChangeFeed", "true")
      .option("startingVersion", v.toString)
      .option("endingVersion", v.toString)
      .load(t.path)
    assert(rel.count() == 1L &&
      rel.select("email").head.getString(0) == "hidden")
    // streaming CDF: the initial snapshot must not leak hidden rows
    val q = spark.readStream.format("graftlake")
      .option("readChangeFeed", "true").load(t.path)
      .writeStream.format("memory").queryName("gov_cdf_stream")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val streamed = spark.table("gov_cdf_stream")
    assert(streamed.count() == 51L, // 50 original visible + id 200
      "streaming CDF initial snapshot must apply the row filter")
    assert(streamed.select("email").collect()
      .forall(_.getString(0) == "hidden"),
      "streaming CDF must carry masked values")
    // the raw fold stays available to maintenance (private surface)
    assert(t.rawChangeFeed(v - 1, v).count() == 2L)
  }

  test("external exports refuse on governed tables; policies refuse " +
      "under auto-export (raw egress has no enforcement point)") {
    import spark.implicits._
    val t = fixture("gov_export")
    t.setRowFilter("grade < 5")
    intercept[IllegalArgumentException](DeltaExport.export(t))
    intercept[IllegalArgumentException](IcebergExport.export(t))
    t.clearRowFilter()
    // ungoverned again: exports work
    DeltaExport.export(t)
    assert(DeltaExport.externalRead(spark, t.path).count() == 100L)
    // reverse direction: auto-export on → policy install refuses
    t.setTableProperties(Map("graft.delta.autoExport" -> "true"))
    intercept[IllegalArgumentException](t.setRowFilter("grade < 5"))
    intercept[IllegalArgumentException](t.setColumnMask("email", "'x'"))
    intercept[IllegalArgumentException](t.setTableProperties(
      Map("graft.rowFilter" -> "grade < 5")))
    t.setTableProperties(Map("graft.delta.autoExport" -> "false"))
    t.setRowFilter("grade < 5")
    // and enabling auto-export on a governed table refuses
    intercept[IllegalArgumentException](t.setTableProperties(
      Map("graft.iceberg.autoExport" -> "true")))
    val t2 = fixture("gov_export2")
    t2.setColumnMask("email", "'x'")
    intercept[IllegalArgumentException](IcebergExport.export(t2))
  }

  test("session-scoped MV registration enforces exclusivity both " +
      "directions (no bypass via the in-memory catalog)") {
    val t = fixture("gov_mv_session")
    val mv = MaterializedAgg.create(spark, tmpDir("gov_mv_session_view"), t,
      groupCols = Seq("grade"), sumCols = Seq("id"))
    graft.plans.MvCatalog.register(mv) // session-only: no property stamped
    try {
      intercept[IllegalArgumentException](t.setRowFilter("grade < 5"))
      intercept[IllegalArgumentException](t.setColumnMask("email", "'x'"))
    } finally graft.plans.MvCatalog.deregister(t.path)
    t.setRowFilter("grade < 5")
    // a governed source refuses SESSION registration too
    val mv2Src = fixture("gov_mv_session2")
    mv2Src.setRowFilter("grade < 5")
    val mv2 = MaterializedAgg.create(spark,
      tmpDir("gov_mv_session2_view"), mv2Src,
      groupCols = Seq("grade"), sumCols = Seq("id"))
    intercept[IllegalArgumentException](graft.plans.MvCatalog.register(mv2))
  }

  test("principal-bound policies (L116): current_user() binds to the " +
      "session principal — two sessions read different rows through " +
      "ONE stored policy") {
    import spark.implicits._
    val t = GraftTable.create(spark, tmpDir("gov_principal"),
      Seq((1L, "alice", "a@x.com"), (2L, "alice", "a2@x.com"),
        (3L, "bob", "b@x.com"))
        .toDF("id", "owner", "email"))
    t.setRowFilter("owner = current_user()")
    t.setColumnMask("email",
      "CASE WHEN current_user() = 'alice' THEN email ELSE '***' END")
    val sa = spark.newSession(); sa.conf.set(GraftTable.PrincipalConf, "alice")
    val sb = spark.newSession(); sb.conf.set(GraftTable.PrincipalConf, "bob")
    val ta = GraftTable.forPath(sa, t.path)
    val tb = GraftTable.forPath(sb, t.path)
    assert(ta.toDF.count() == 2L, "alice sees her two rows")
    assert(tb.toDF.count() == 1L, "bob sees his one row")
    assert(ta.toDF.select("email").collect()
      .forall(_.getString(0).endsWith("@x.com")),
      "alice's mask branch keeps raw emails")
    assert(tb.toDF.select("email").head.getString(0) == "***",
      "bob's mask branch hides emails")
    // the default session has neither principal → zero rows, no error
    assert(t.toDF.count() == 0L)
    // the bound principal is a literal: the policy PRUNES files via
    // stats when owners are range-clustered (plan-time constant)
    val parts = Seq(
      Seq((10L, "alice", "x@x.com")), Seq((11L, "bob", "y@x.com")))
      .map(_.toDF("id", "owner", "email").coalesce(1))
    val t2 = GraftTable.create(spark, tmpDir("gov_principal2"), parts.head)
    t2.append(parts(1))
    t2.setRowFilter("owner = current_user()")
    val ta2 = GraftTable.forPath(sa, t2.path)
    assert(ta2.toDF.inputFiles.length == 1,
      "current_user() must fold to a literal and prune files")
    assert(ta2.toDF.count() == 1L)
  }

  test("masked-column predicate through the relation layer (pushed " +
      "filters) returns governed-correct rows on a row-tracked table") {
    import spark.implicits._
    // 4 range-clustered files so raw-stats pruning would WRONGLY skip
    val parts = (0 until 4).map(b =>
      (b * 25 + 1 to b * 25 + 25).map(i => (i.toLong, i % 10))
        .toDF("id", "grade").coalesce(1))
    val t = GraftTable.create(spark, tmpDir("gov_rowid_mask"), parts.head,
      properties = Map("graft.rowTracking" -> "true"))
    parts.tail.foreach(p => t.append(p))
    t.setColumnMask("id", "CAST(id % 7 AS BIGINT)")
    // the relation pushes `id = 3` into readWhereWithRowIds: raw stats
    // (files hold 1..25 / 26..50 / ...) would keep only file 1, but
    // masked matches (id%7==3) live in ALL files — 14 rows
    val rel = spark.read.format("graftlake").option("rowIds", "true")
      .load(t.path).where(col("id") === 3L)
    assert(rel.count() == 14L,
      "masked-column pushed filter must not prune on raw stats (r14 advisory)")
    assert(rel.select("id").collect().forall(_.getLong(0) == 3L))
    // unmasked-predicate row-id reads keep pruning + stable ids
    val clean = spark.read.format("graftlake").option("rowIds", "true")
      .load(t.path).where(col("grade") === 3)
    assert(clean.count() == 10L)
  }

  test("streaming batches are governed; DFP/bloom reads guard masked keys") {
    val t = fixture("gov_stream")
    t.setRowFilter("grade < 5")
    val out = spark.readStream.format("graftlake").load(t.path)
      .writeStream.format("memory").queryName("gov_stream_q")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    out.awaitTermination(60000)
    assert(spark.table("gov_stream_q").count() == 50L,
      "streaming micro-batches must apply the row filter")
    // masked join key: the cost-based read falls back to a governed
    // full scan rather than pruning raw stats with masked dim keys
    t.setColumnMask("id", "CAST(id % 7 AS BIGINT)")
    import spark.implicits._
    val dim = Seq(3L).toDF("id")
    val joined = t.readCostBased(dim, "id").join(dim, "id")
    // 14 ids have id%7==3; the row filter (grade<5) then keeps 8
    assert(joined.count() == 8L,
      "a masked join key must not prune on raw stats")
  }

  test("the row filter PRUNES FILES through footer stats — a policy " +
      "is IO reduction, not just a post-scan filter") {
    import spark.implicits._
    // range-clustered files: ids 1..25 / 26..50 / 51..75 / 76..100
    val parts = (0 until 4).map(b =>
      (b * 25 + 1 to b * 25 + 25).map(i => (i.toLong, i % 10))
        .toDF("id", "grade").coalesce(1))
    val t = GraftTable.create(spark, tmpDir("gov_fileprune"), parts.head)
    parts.tail.foreach(p => t.append(p))
    val rawFiles = t.toDF.inputFiles.length
    assert(rawFiles == 4, s"fixture expects 4 range-clustered files, got $rawFiles")
    t.setRowFilter("id > 90")
    assert(t.toDF.inputFiles.length == 1,
      "the policy must skip files whose [min,max] cannot satisfy it")
    assert(t.toDF.count() == 10L)
    // readWhere composes policy pruning with predicate pruning
    val rw = t.readWhere(col("id") < 95L)
    assert(rw.inputFiles.length == 1 && rw.count() == 4L)
    // time travel prunes by the CURRENT policy too: at version 1 the
    // table holds only ids 1..50, so `id > 90` skips EVERY file
    assert(t.toDFAt(1).inputFiles.length == 0 && t.toDFAt(1).count() == 0L)
    t.clearRowFilter()
    assert(t.toDF.inputFiles.length == 4)
  }

  test("installing a policy stamps the `governance` READER feature — " +
      "a pre-governance client refuses the read instead of leaking " +
      "raw rows") {
    val t = fixture("gov_protocol")
    val before = t.snapshot.protocol.map(_.readerFeatures).getOrElse(Nil)
    assert(!before.contains("governance"))
    t.setRowFilter("grade < 5")
    val p = t.snapshot.protocol.getOrElse(fail("protocol action expected"))
    assert(p.readerFeatures.contains("governance"),
      "the SAME commit that installs the policy must stamp the feature")
    assert(p.writerFeatures.contains("governance"),
      "reader features also appear in writerFeatures (Delta rule)")
    // the mask path stamps too
    val t2 = fixture("gov_protocol2")
    t2.setColumnMask("email", "'x'")
    assert(t2.snapshot.protocol.exists(_.readerFeatures.contains("governance")))
    // CREATE with policy properties stamps at version 0
    import spark.implicits._
    val t3 = GraftTable.create(spark, tmpDir("gov_protocol3"),
      Seq((1L, 1), (2L, 7)).toDF("id", "grade"),
      properties = Map("graft.rowFilter" -> "grade < 5"))
    assert(t3.snapshot.protocol.exists(_.readerFeatures.contains("governance")))
    assert(t3.toDF.count() == 1L)
    // clones/branches KEEP the policy properties, so they must keep
    // the protocol floors too (shallow clone used to drop them)
    val bt = t.createBranch("dev")
    assert(bt.snapshot.protocol.exists(_.readerFeatures.contains("governance")),
      "a branch of a governed table must carry the governance floor")
    assert(bt.toDF.count() == 50L,
      "the branch inherits (and enforces) the parent's policy")
    val sc = GraftTable.shallowClone(spark, t.path, tmpDir("gov_clone"))
    assert(sc.snapshot.protocol.exists(_.readerFeatures.contains("governance")))
    assert(sc.toDF.count() == 50L)
  }

  test("MV exclusivity: a registered view refuses policies and a " +
      "policy refuses view registration") {
    import spark.implicits._
    val t = fixture("gov_mv")
    val mv = MaterializedAgg.create(spark, tmpDir("gov_mv_view"), t,
      groupCols = Seq("grade"), sumCols = Seq("id"))
    graft.plans.MvCatalog.registerPersistent(mv)
    intercept[IllegalArgumentException](t.setRowFilter("grade < 5"))
    intercept[IllegalArgumentException](t.setColumnMask("email", "'x'"))
    graft.plans.MvCatalog.deregisterPersistent(t)
    t.setRowFilter("grade < 5")
    val t2 = fixture("gov_mv2")
    t2.setColumnMask("email", "'x'")
    val mv2 = MaterializedAgg.create(spark, tmpDir("gov_mv2_view"), t2,
      groupCols = Seq("grade"), sumCols = Seq("id"))
    intercept[IllegalArgumentException](
      graft.plans.MvCatalog.registerPersistent(mv2))
  }

  test("policy expressions validate at ALTER time; SQL surface works") {
    val t = fixture("gov_sql")
    intercept[Exception](t.setRowFilter("no_such_column < 5"))
    intercept[IllegalArgumentException](t.setColumnMask("nope", "'x'"))
    // the GENERIC property path gets the same guards — no bypass by
    // spelling the policy as a raw TBLPROPERTY
    intercept[Exception](t.setTableProperties(
      Map("graft.rowFilter" -> "no_such_column < 5")))
    intercept[Exception](t.setTableProperties(
      Map("graft.colMask.nope" -> "'x'")))
    t.setTableProperties(Map("graft.rowFilter" -> "grade < 5"))
    assert(t.toDF.count() == 50L)
    t.clearRowFilter()
    val gsql = new GraftSql(spark)
    gsql.register("govs", t.path)
    gsql.sql("ALTER TABLE govs SET ROW FILTER 'grade < 5'")
    gsql.sql("ALTER TABLE govs SET MASK email AS '''masked'''")
    assert(gsql.sql("SELECT COUNT(*) AS c FROM govs").head.getLong(0) == 50L)
    assert(gsql.sql("SELECT email FROM govs LIMIT 1").head.getString(0)
      == "masked")
    gsql.sql("ALTER TABLE govs DROP ROW FILTER")
    gsql.sql("ALTER TABLE govs DROP MASK email")
    assert(gsql.sql("SELECT COUNT(*) AS c FROM govs").head.getLong(0) == 100L)
  }
}
