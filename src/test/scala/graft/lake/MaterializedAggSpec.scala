package graft.lake

import graft.{GraftSparkSpec, Tables}
import org.apache.spark.sql.functions._

class MaterializedAggSpec extends GraftSparkSpec {

  private def li = Tables(spark, sfDir, "lineitem")
    .select(col("l_orderkey"), col("l_returnflag"),
      round(col("l_quantity") * 100).cast("long").as("qty_c"))

  private def recompute(t: GraftTable) = t.toDF
    .groupBy("l_returnflag")
    .agg(count(lit(1)).as("mv_count"), sum("qty_c").as("mv_sum_qty_c"))
    .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  private def viewState(mv: MaterializedAgg) = mv.toDF
    .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  test("incremental refresh equals full recompute across DML shapes — no CDC needed") {
    // NO graft.cdf: the refresh must stay exact through the change
    // feed's per-version diff fallback (updates arrive as
    // retract+insert pairs)
    val src = GraftTable.create(spark, tmpDir("mv-src"), li.limit(400))
    val mv = MaterializedAgg.create(spark, tmpDir("mv-view"), src,
      Seq("l_returnflag"), Seq("qty_c"))
    assert(viewState(mv) == recompute(src), "initial materialization")
    src.delete(col("l_orderkey") % 3 === 0)
    src.update(col("l_orderkey") % 4 === 0,
      Map("qty_c" -> (col("qty_c") * 2)))
    src.append(li.limit(50))
    mv.refresh()
    assert(viewState(mv) == recompute(src),
      "delete+update+append folded incrementally must equal recompute")
    // refresh with an unchanged source is a no-op commit-wise
    val v = mv.view.version
    mv.refresh()
    assert(mv.view.version == v, "unchanged source must not commit")
    // the source-version stamp rides the SAME commit as the new state
    val props = mv.view.snapshot.metadata.get.properties
    assert(props("graft.mv.sourceVersion").toLong == src.version)
  }

  test("fully retracted groups vanish; reattach validates the source") {
    val src = GraftTable.create(spark, tmpDir("mv-src2"),
      li.filter(col("l_returnflag").isin("A", "R")).limit(200))
    val mv = MaterializedAgg.create(spark, tmpDir("mv-view2"), src,
      Seq("l_returnflag"), Seq("qty_c"))
    assert(mv.toDF.count() == 2)
    src.delete(col("l_returnflag") === "A")
    mv.refresh()
    assert(viewState(mv) == recompute(src))
    assert(mv.toDF.filter(col("l_returnflag") === "A").count() == 0,
      "a group whose rows are all deleted must leave the view")
    // reattach by path; wrong source refuses
    val again = MaterializedAgg.forPath(spark, mv.view.path, src)
    assert(viewState(again) == recompute(src))
    val other = GraftTable.create(spark, tmpDir("mv-src3"), li.limit(10))
    intercept[IllegalArgumentException](
      MaterializedAgg.forPath(spark, mv.view.path, other))
  }

  test("min/max state: insert-only folds, boundary retraction recomputes, null-safe") {
    // NULL stripe: min/max must ignore NULLs on both paths
    val withNulls = li.withColumn("qty_c",
      when(col("l_orderkey") % 4 === 0, lit(null).cast("long"))
        .otherwise(col("qty_c")))
    val src = GraftTable.create(spark, tmpDir("mv-mm-src"), withNulls.limit(200),
      properties = Map("graft.cdf" -> "true"))
    val mv = MaterializedAgg.create(spark, tmpDir("mv-mm-view"), src,
      Seq("l_returnflag"), Nil, minCols = Seq("qty_c"), maxCols = Seq("qty_c"))
    def expect = src.toDF.groupBy("l_returnflag")
      .agg(min("qty_c").as("mn"), max("qty_c").as("mx"))
      .collect().map(r => (r.getString(0), r.get(1), r.get(2))).toSet
    def got = mv.toDF
      .select(col("l_returnflag"), col("mv_min_qty_c"), col("mv_max_qty_c"))
      .collect().map(r => (r.getString(0), r.get(1), r.get(2))).toSet
    assert(got == expect, "initial min/max materialization")
    // append-only delta: fold path (no retraction anywhere)
    src.append(withNulls.limit(60))
    mv.refresh()
    assert(got == expect, "insert-only fold must track min/max")
    // delete the rows holding the global max: every affected group's
    // stored max is retracted — only the recompute path can recover
    val mx = src.toDF.agg(max("qty_c")).head().getLong(0)
    src.delete(col("qty_c") === mx)
    mv.refresh()
    assert(got == expect, "boundary retraction must recompute, not keep the fold")
  }

  test("fractional SUM/AVG columns refuse at create; MIN/MAX accept them") {
    val src = GraftTable.create(spark, tmpDir("mv-frac-src"),
      Tables(spark, sfDir, "lineitem")
        .select(col("l_returnflag"), col("l_quantity")))
    // long-state sums would truncate a double per row — refuse loudly
    val e = intercept[IllegalArgumentException] {
      MaterializedAgg.create(spark, tmpDir("mv-frac-view"), src,
        Seq("l_returnflag"), Seq("l_quantity"))
    }
    assert(e.getMessage.contains("integral"))
    // extremes keep native types: a double min/max column is fine
    val mv = MaterializedAgg.create(spark, tmpDir("mv-frac-mm"), src,
      Seq("l_returnflag"), Nil,
      minCols = Seq("l_quantity"), maxCols = Seq("l_quantity"))
    assert(mv.toDF.count() > 0)
  }

  test("racing refreshes converge: view equals recompute, no double-apply") {
    import java.util.ConcurrentModificationException
    val src = GraftTable.create(spark, tmpDir("mv-race-src"), li.limit(300),
      properties = Map("graft.cdf" -> "true"))
    val viewDir = tmpDir("mv-race-view")
    MaterializedAgg.create(spark, viewDir, src, Seq("l_returnflag"), Seq("qty_c"))
    src.delete(col("l_orderkey") % 5 === 0)
    src.append(li.limit(40))
    // two handles race the SAME refresh window; each either lands or
    // loses the optimistic commit — in every interleaving the stamp
    // and the folded state move together, so the view can never
    // double-apply the delta
    val h1 = MaterializedAgg.forPath(spark, viewDir, src)
    val h2 = MaterializedAgg.forPath(spark, viewDir, src)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      def submit(mv: MaterializedAgg) =
        pool.submit(new java.util.concurrent.Callable[Boolean] {
          def call(): Boolean =
            try { mv.refresh(); true }
            catch { case _: ConcurrentModificationException => false }
        })
      val a = submit(h1); val b = submit(h2)
      val (okA, okB) = (a.get(), b.get())
      assert(okA || okB, "at least one refresh must land")
      // a loser retried now is a version-check no-op, never a re-fold
      MaterializedAgg.forPath(spark, viewDir, src).refresh()
      assert(viewState(MaterializedAgg.forPath(spark, viewDir, src)) ==
        recompute(src), "post-race view state diverged from recompute")
    } finally pool.shutdown()
  }

  test("MV view state is protocol-stamped with a named writer feature") {
    val src = GraftTable.create(spark, tmpDir("mv-src-proto"), li.limit(50))
    val mv = MaterializedAgg.create(spark, tmpDir("mv-view-proto"), src,
      Seq("l_returnflag"), Seq("qty_c"))
    val proto = mv.view.snapshot.protocol
    assert(proto.exists(_.writerFeatures.contains("materializedView")),
      "view state must carry the materializedView writer feature")
    assert(proto.exists(_.minWriterVersion >= 2),
      "pre-feature (v1) writers must be rejected from view state")
  }

  test("source RESTORE folds through the change feed as a rollback") {
    val src = GraftTable.create(spark, tmpDir("mv-src4"), li.limit(100))
    val vSeed = src.version
    src.append(li.limit(60))
    val mv = MaterializedAgg.create(spark, tmpDir("mv-view4"), src,
      Seq("l_returnflag"), Seq("qty_c"))
    // restore commits FORWARD (action replay), so the refresh sees it
    // as a normal change-feed range whose diff retracts the rollback
    src.restore(vSeed)
    mv.refresh()
    assert(viewState(mv) == recompute(src),
      "after a source rollback the view must reflect the restored rows")
  }

  test("join view: fact AND dim deltas fold incrementally, both exact") {
    import spark.implicits._
    val fact = (1 to 60).map(i => (i.toLong % 12, i.toLong, i * 10L))
      .toDF("fk", "seq", "v")
    val dimDf = (0L until 12L).map(k => (k, s"seg-${k % 3}")).toDF("fk", "segment")
    val src = GraftTable.create(spark, tmpDir("mvj-fact"), fact,
      properties = Map("graft.cdf" -> "true"))
    val d = GraftTable.create(spark, tmpDir("mvj-dim"), dimDf)
    val mv = MaterializedAgg.createJoin(spark, tmpDir("mvj-view"),
      src, d, Seq("fk"), Seq("segment"), Seq("v"))
    def expect = src.toDF.join(d.toDF, "fk").groupBy("segment")
      .agg(count(lit(1)).as("n"), sum("v").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    def state = mv.toDF.select("segment", "mv_count", "mv_sum_v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    def ops(op: String) = mv.view.history
      .filter(col("operation") === op).count()
    // fact-side deltas fold incrementally
    src.delete(col("seq") % 4 === 0)
    src.append(Seq((3L, 1000L, 777L)).toDF("fk", "seq", "v"))
    mv.refresh()
    assert(state == expect, "folded join view must equal fact'/dim recompute")
    assert(ops("MV REFRESH") == 1 && ops("MV REMATERIALIZE") == 0,
      "a dim-stable window must fold, not rebuild")
    // a dim change FOLDS too: Δdim joins the fact at the refreshed
    // version (moving fact rows between dim-side groups), no rebuild
    d.update(col("fk") === 3, Map("segment" -> lit("seg-moved")))
    mv.refresh()
    assert(state == expect, "post-dim-change view must equal the fresh join")
    assert(ops("MV REFRESH") == 2 && ops("MV REMATERIALIZE") == 0,
      "a dim change must fold through the dim change feed, not rebuild")
    // fact and dim moving in the SAME window telescopes exactly
    src.delete(col("seq") === 1000L)
    d.update(col("fk") === 5, Map("segment" -> lit("seg-five")))
    mv.refresh()
    assert(state == expect, "a mixed fact+dim window must fold exactly")
    assert(ops("MV REFRESH") == 3 && ops("MV REMATERIALIZE") == 0)
    // a fact row with no dim match contributes nothing, incrementally too
    src.append(Seq((99L, 2000L, 5L)).toDF("fk", "seq", "v"))
    mv.refresh()
    assert(state == expect)
    assert(ops("MV REFRESH") == 4, "the dangling-key append still folds")
  }

  test("a refresh window reaching below cleaned-up logs degrades to a rebuild, exact") {
    val src = GraftTable.create(spark, tmpDir("mv-clean-src"), li.limit(100))
    val mv = MaterializedAgg.create(spark, tmpDir("mv-clean-view"), src,
      Seq("l_returnflag"), Seq("qty_c"))
    // advance past a checkpoint, then reclaim the pre-checkpoint
    // commits the stamped window would need
    (1 to 12).foreach(_ => src.append(li.limit(10)))
    src.log.cleanupLogs()
    mv.refresh()
    assert(viewState(mv) == recompute(src),
      "a truncated change-feed window must rebuild to the exact state")
    assert(mv.view.history.filter(col("operation") === "MV REMATERIALIZE")
      .count() >= 1, "the degraded path must be a re-materialization")
    // and the NEXT refresh folds incrementally again
    src.append(li.limit(10))
    val before = mv.view.history
      .filter(col("operation") === "MV REFRESH").count()
    mv.refresh()
    assert(viewState(mv) == recompute(src))
    assert(mv.view.history.filter(col("operation") === "MV REFRESH")
      .count() == before + 1, "post-rebuild refreshes fold again")
  }

  test("join view reopened via forPath reattaches the dim; refresh stays exact") {
    import spark.implicits._
    val src = GraftTable.create(spark, tmpDir("mvj-fp-fact"),
      (1 to 40).map(i => (i.toLong % 8, i.toLong, i * 7L)).toDF("fk", "seq", "v"),
      properties = Map("graft.cdf" -> "true"))
    val d = GraftTable.create(spark, tmpDir("mvj-fp-dim"),
      (0L until 8L).map(k => (k, s"s${k % 2}")).toDF("fk", "segment"))
    val viewDir = tmpDir("mvj-fp-view")
    MaterializedAgg.createJoin(spark, viewDir, src, d,
      Seq("fk"), Seq("segment"), Seq("v"))
    // a FRESH handle (new session in real life) must rediscover the
    // dim from the stored pointer — refreshing without it would fold
    // the fact feed unjoined and corrupt dim-side groupings
    val reopened = MaterializedAgg.forPath(spark, viewDir, src)
    src.append(Seq((3L, 999L, 11L), (5L, 998L, 13L)).toDF("fk", "seq", "v"))
    reopened.refresh()
    val expect = src.toDF.join(d.toDF, "fk").groupBy("segment")
      .agg(count(lit(1)).as("n"), sum("v").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val state = reopened.toDF.select(col("segment"), col("mv_count"),
        col("mv_sum_v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(state == expect,
      "a forPath-reopened join view must fold fact deltas through the dim")
    // a dim change through the reopened handle folds through its feed
    d.update(col("fk") === 1, Map("segment" -> lit("sX")))
    reopened.refresh()
    val expect2 = src.toDF.join(d.toDF, "fk").groupBy("segment")
      .agg(count(lit(1)).as("n"), sum("v").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val state2 = reopened.toDF.select(col("segment"), col("mv_count"),
        col("mv_sum_v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(state2 == expect2,
      "a dim change seen through forPath must fold exactly")
  }

  test("COUNT DISTINCT view: occurrence-grain state folds exactly; forPath guards") {
    import spark.implicits._
    val rows = (1 to 120).map(i => (s"g${i % 3}", i.toLong % 20, i.toLong))
    val src = GraftTable.create(spark, tmpDir("mvdd-src"),
      rows.toDF("g", "x", "seq"), properties = Map("graft.cdf" -> "true"))
    val viewDir = tmpDir("mvdd-view")
    val mv = MaterializedDistinct.create(spark, viewDir, src, Seq("g"), "x")
    def expect = src.toDF.groupBy("g")
      .agg(countDistinct("x").as("n")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    def got = mv.toDF.collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == expect, "initial distinct state")
    // partial retraction: x=5 keeps other rows -> count must NOT move
    src.delete(col("x") === 5 && col("seq") < 30)
    // full retraction: every row of x=7 leaves
    src.delete(col("x") === 7)
    src.append(Seq(("g0", 99L, 999L), ("g1", 99L, 998L)).toDF("g", "x", "seq"))
    mv.refresh()
    assert(got == expect,
      "folded distinct counts must equal recompute across partial/full retractions")
    assert(mv.view.history.filter(col("operation") === "MV REMATERIALIZE")
      .count() == 0, "the DML window must fold, not rebuild")
    // refresh with an unchanged source is a no-op
    val v = mv.view.version
    mv.refresh()
    assert(mv.view.version == v)
    // the two view kinds refuse each other's forPath
    intercept[IllegalArgumentException](
      MaterializedAgg.forPath(spark, viewDir, src))
    intercept[IllegalArgumentException](
      MaterializedDistinct.forPath(spark, tmpDir("mvdd-not-a-view"), src))
  }

  test("LEFT-OUTER join view: fact folds O(delta), dim changes are FREE") {
    import spark.implicits._
    val src = GraftTable.create(spark, tmpDir("mvoj-fact"),
      // keys 0..9 in the fact, dim covers only 0..7 → keys 8,9 are
      // null-extended from the start
      (1 to 60).map(i => (i.toLong % 10, i.toLong)).toDF("fk", "v"),
      properties = Map("graft.cdf" -> "true"))
    val d = GraftTable.create(spark, tmpDir("mvoj-dim"),
      (0L until 8L).map(k => (k, s"g${k % 3}")).toDF("fk", "grp"))
    val viewDir = tmpDir("mvoj-view")
    val mv = MaterializedOuterJoin.create(spark, viewDir,
      src, d, Seq("fk"), Seq("grp"), Seq("v"))
    def expect = src.toDF.join(d.toDF, Seq("fk"), "left").groupBy("grp")
      .agg(count(lit(1)).as("n"), sum("v").as("s"))
      .collect().map(r => (Option(r.getString(0)), r.getLong(1),
        r.getLong(2))).toSet
    def got = mv.toDF.select(col("grp"), col("mv_count"), col("mv_sum_v"))
      .collect().map(r => (Option(r.getString(0)), r.getLong(1),
        r.getLong(2))).toSet
    assert(expect.exists(_._1.isEmpty),
      "fixture sanity: a NULL-extended group must exist")
    assert(got == expect, "initial outer state")
    // fact DML folds through the state MV — never a rebuild
    src.delete(col("v") % 7 === 0)
    src.append(Seq((11L, 500L), (3L, 501L)).toDF("fk", "v")) // new unmatched key 11
    mv.refresh()
    assert(got == expect, "fact fold across delete+append incl. new unmatched key")
    assert(mv.view.history.filter(col("operation") === "MV REMATERIALIZE")
      .count() == 0, "fact DML must fold, not rebuild")
    val vAfterFacts = mv.view.version
    // dim churn: update (moves groups), INSERT (converts null-extended
    // rows to matched — THE case group-grain state cannot express),
    // delete (converts matched back to null-extended). NO refresh call:
    // the read joins the live dim.
    d.update(col("fk") === 1, Map("grp" -> lit("gX")))
    d.append(Seq((8L, "gNEW")).toDF("fk", "grp"))
    d.delete(col("fk") === 2)
    assert(got == expect,
      "dim update+insert+delete must be visible with ZERO refresh")
    assert(mv.view.version == vAfterFacts,
      "dim changes must not touch the view state at all")
    // forPath round-trip keeps folding; plain forPath refuses the kind
    val reopened = MaterializedOuterJoin.forPath(spark, viewDir, src)
    src.append(Seq((8L, 900L)).toDF("fk", "v")) // now matched by dim insert
    reopened.refresh()
    assert(got == expect, "reopened handle folds; new key matches live dim")
    intercept[IllegalArgumentException](
      MaterializedAgg.forPath(spark, viewDir, src))
  }

  test("outer view read is state-sized: the plan never scans the fact") {
    import spark.implicits._
    val factDir = tmpDir("mvop-fact")
    val src = GraftTable.create(spark, factDir,
      (1 to 50).map(i => (i.toLong % 10, i.toLong)).toDF("fk", "v"),
      properties = Map("graft.cdf" -> "true"))
    val d = GraftTable.create(spark, tmpDir("mvop-dim"),
      (0L until 8L).map(k => (k, s"g$k")).toDF("fk", "grp"))
    val viewDir = tmpDir("mvop-view")
    val mv = MaterializedOuterJoin.create(spark, viewDir, src, d,
      Seq("fk"), Seq("grp"), Seq("v"))
    val plan = mv.toDF.queryExecution.executedPlan.toString
    // the read joins STATE with DIM — at 100 TB the fact never appears
    assert(plan.contains("mvop-view") && plan.contains("mvop-dim"),
      "read must scan the state and the dim")
    assert(!plan.contains("mvop-fact"),
      "read must NEVER scan the fact table — that is the whole point " +
        "of the key-grain state")
  }

  test("outer-join kinds: RIGHT/FULL maintain from the same fact state") {
    import spark.implicits._
    // fact keys 0..9; dim covers 4..13 → fact-only keys 0..3 (left/full
    // null-extension) AND dim-only keys 10..13 (right/full single
    // null-extended rows) both present
    val src = GraftTable.create(spark, tmpDir("mvojk-fact"),
      (1 to 60).map(i => (i.toLong % 10, i.toLong)).toDF("fk", "v"),
      properties = Map("graft.cdf" -> "true"))
    val d = GraftTable.create(spark, tmpDir("mvojk-dim"),
      (4L until 14L).map(k => (k, s"g${k % 3}")).toDF("fk", "grp"))
    val dirs = Seq("right", "full").map(k => k -> tmpDir(s"mvojk-$k")).toMap
    for (kind <- Seq("right", "full")) {
      val mv = MaterializedOuterJoin.create(spark, dirs(kind),
        src, d, Seq("fk"), Seq("grp"), Seq("v"), joinType = kind)
      def expect = src.toDF.join(d.toDF, Seq("fk"), kind).groupBy("grp")
        .agg(count(lit(1)).as("n"), sum("v").as("s"), count(col("v")).as("nv"))
        .collect().map(r => (Option(r.getString(0)), r.getLong(1),
          Option(r.get(2)), r.getLong(3))).toSet
      def got = mv.toDF.select(col("grp"), col("mv_count"),
          col("mv_sum_v"), col("mv_cnt_v"))
        .collect().map(r => (Option(r.getString(0)), r.getLong(1),
          Option(r.get(2)), r.getLong(3))).toSet
      assert(got == expect, s"$kind: initial state")
      // fact DML folds; dim DML needs no refresh — for BOTH kinds.
      // Per-kind fresh dim keys keep the unique-key contract intact
      // across iterations.
      val (newKey, newGrp) =
        if (kind == "right") (20L, "gR") else (21L, "gF")
      src.delete(col("v") % 6 === 0)
      src.append(Seq((12L, 700L + newKey), (2L, 701L)).toDF("fk", "v"))
      mv.refresh()
      d.delete(col("fk") === (if (kind == "right") 5L else 6L))
      d.append(Seq((newKey, newGrp)).toDF("fk", "grp")) // new dim-only key
      assert(got == expect,
        s"$kind: fact fold + zero-refresh dim churn must stay exact")
    }
    // sanity on the discriminating group: a dim-only key group has
    // n = 1 (its single null-extended row), sum NULL, count(v) = 0
    val full = MaterializedOuterJoin.forPath(spark, dirs("full"), src)
    val gNew = full.toDF.filter(col("grp") === "gF").head()
    assert(gNew.getLong(1) == 1L && gNew.isNullAt(2) && gNew.getLong(3) == 0L,
      "a dim-only group is one null-extended row: count 1, NULL sum, 0 vals")
    val gsql = new GraftSql(spark)
    gsql.register("ojf", src.path); gsql.register("ojd", d.path)
    // SQL: RIGHT/FULL create through the shared statement shape
    for (kind <- Seq("RIGHT OUTER", "FULL")) {
      val kdir = tmpDir(s"mvojk-sql-${kind.split(' ').head.toLowerCase}")
      gsql.sql(s"CREATE MATERIALIZED VIEW ojv_${kind.split(' ').head} " +
        s"LOCATION '$kdir' AS SELECT grp, COUNT(*), SUM(v) FROM ojf " +
        s"$kind JOIN ojd USING (fk) GROUP BY grp")
      val k = kind.split(' ').head.toLowerCase
      val got = MaterializedOuterJoin.forPath(spark, kdir, src).toDF
        .select(col("grp"), col("mv_count"), col("mv_sum_v"))
        .collect().map(r => (Option(r.getString(0)), r.getLong(1),
          Option(r.get(2)))).toSet
      val expect = src.toDF.join(d.toDF, Seq("fk"), k).groupBy("grp")
        .agg(count(lit(1)).as("n"), sum("v").as("s"))
        .collect().map(r => (Option(r.getString(0)), r.getLong(1),
          Option(r.get(2)))).toSet
      assert(got == expect, s"SQL $kind view must match the live outer join")
    }
    // an ON-style outer form refuses loudly instead of silently
    // falling through to the plain-query path
    val se = intercept[IllegalArgumentException] {
      gsql.sql("CREATE MATERIALIZED VIEW ojbad LOCATION '" +
        tmpDir("mvojk-on") + "' AS SELECT grp, SUM(v) FROM ojf " +
        "LEFT JOIN ojd ON ojf.fk = ojd.fk GROUP BY grp")
    }
    assert(se.getMessage.contains("USING"), se.getMessage)
    // createJoin still refuses non-inner, pointing at the outer class
    val e = intercept[IllegalArgumentException] {
      MaterializedAgg.createJoin(spark, tmpDir("mvojk-cj"), src, d,
        Seq("fk"), Seq("grp"), Seq("v"), joinType = "full")
    }
    assert(e.getMessage.contains("MaterializedOuterJoin"), e.getMessage)
  }

  test("outer views: DIM-side aggregates expand exactly from weighted state") {
    import spark.implicits._
    // dim carries an integral weight column (population) with a NULL
    // stripe; dim covers 3..11 so fact-only (0..2) and dim-only
    // (10,11) keys exercise both null-extension directions
    val src = GraftTable.create(spark, tmpDir("mvod-fact"),
      (1 to 70).map(i => (i.toLong % 10, i.toLong)).toDF("fk", "v"),
      properties = Map("graft.cdf" -> "true"))
    val d = GraftTable.create(spark, tmpDir("mvod-dim"),
      (3L until 12L).map(k =>
        (k, s"g${k % 3}", if (k % 4 == 0) None else Some(k * 100)))
        .toDF("fk", "grp", "pop"))
    for (kind <- Seq("left", "right", "full")) {
      val mv = MaterializedOuterJoin.create(spark, tmpDir(s"mvod-$kind"),
        src, d, Seq("fk"), Seq("grp"), Seq("v", "pop"),
        minCols = Seq("pop"), maxCols = Seq("v"), joinType = kind)
      def expect = src.toDF.join(d.toDF, Seq("fk"), kind).groupBy("grp")
        .agg(sum("pop").as("sp"), count(col("pop")).as("np"),
          min("pop").as("mp"), sum("v").as("sv"), max("v").as("xv"))
        .collect().map(r => (Option(r.getString(0)), Option(r.get(1)),
          r.getLong(2), Option(r.get(3)), Option(r.get(4)),
          Option(r.get(5)))).toSet
      def got = mv.toDF.select(col("grp"), col("mv_sum_pop"),
          col("mv_cnt_pop"), col("mv_min_pop"), col("mv_sum_v"), col("mv_max_v"))
        .collect().map(r => (Option(r.getString(0)), Option(r.get(1)),
          r.getLong(2), Option(r.get(3)), Option(r.get(4)),
          Option(r.get(5)))).toSet
      assert(got == expect,
        s"$kind: dim-side sum/count/min must equal the live outer join")
      // fact churn folds, dim churn free — the dim expansion rides both
      src.delete(col("v") % 8 === 0)
      src.append(Seq((11L, 800L + (if (kind == "left") 0L else 1L)))
        .toDF("fk", "v"))
      mv.refresh()
      d.update(col("fk") === 7, Map("pop" -> lit(9999L)))
      assert(got == expect,
        s"$kind: dim-side aggregates must stay exact through churn")
    }
    // fractional dim-side sums refuse (exact long weighting only)
    val dFrac = GraftTable.create(spark, tmpDir("mvod-dfrac"),
      Seq((1L, 0.5)).toDF("fk", "w"))
    val fe = intercept[IllegalArgumentException] {
      MaterializedOuterJoin.create(spark, tmpDir("mvod-fracview"), src,
        dFrac, Seq("fk"), Seq("w"), Seq("w"))
    }
    assert(fe.getMessage.contains("integral"), fe.getMessage)
  }

  test("outer-join LEFT via SQL: create + REFRESH route to the outer class") {
    import spark.implicits._
    val src = GraftTable.create(spark, tmpDir("mvojr-fact"),
      (1 to 40).map(i => (i.toLong % 8, i.toLong)).toDF("fk", "v"),
      properties = Map("graft.cdf" -> "true"))
    val d = GraftTable.create(spark, tmpDir("mvojr-dim"),
      (0L until 6L).map(k => (k, s"g$k")).toDF("fk", "grp"))
    val gsql = new GraftSql(spark)
    gsql.register("ojf", src.path); gsql.register("ojd", d.path)
    // LEFT creates a working view through SQL, REFRESH routes to it
    val leftDir = tmpDir("mvojr-left")
    gsql.sql("CREATE MATERIALIZED VIEW ojlv LOCATION '" + leftDir +
      "' AS SELECT grp, COUNT(*), SUM(v) FROM ojf " +
      "LEFT JOIN ojd USING (fk) GROUP BY grp")
    def expect = src.toDF.join(d.toDF, Seq("fk"), "left").groupBy("grp")
      .agg(count(lit(1)).as("n"), sum("v").as("s"))
      .collect().map(r => (Option(r.getString(0)), r.getLong(1),
        r.getLong(2))).toSet
    def got = MaterializedOuterJoin.forPath(spark, leftDir, src).toDF
      .select(col("grp"), col("mv_count"), col("mv_sum_v"))
      .collect().map(r => (Option(r.getString(0)), r.getLong(1),
        r.getLong(2))).toSet
    assert(got == expect)
    src.delete(col("v") % 5 === 0)
    gsql.sql("REFRESH MATERIALIZED VIEW ojlv")
    assert(got == expect, "SQL REFRESH must fold the fact delta")
    // a non-unique dim refuses the star-schema contract
    val dupDim = GraftTable.create(spark, tmpDir("mvojr-dupdim"),
      Seq((1L, "a"), (1L, "b")).toDF("fk", "grp"))
    val ue = intercept[IllegalArgumentException] {
      MaterializedOuterJoin.create(spark, tmpDir("mvojr-dupview"), src,
        dupDim, Seq("fk"), Seq("grp"), Seq("v"))
    }
    assert(ue.getMessage.contains("not unique"), ue.getMessage)
  }

  test("COUNT DISTINCT view: NULLs don't count, all-NULL groups surface as 0") {
    import spark.implicits._
    // g0: mixed NULL/non-NULL; g1: all NULL (must appear with 0, per SQL
    // semantics where the group exists but COUNT(DISTINCT x) skips NULLs);
    // g2: no NULLs.
    val rows = Seq(
      ("g0", Some(1L)), ("g0", Some(2L)), ("g0", None), ("g0", None),
      ("g1", None), ("g1", None),
      ("g2", Some(1L)), ("g2", Some(1L)), ("g2", Some(3L)))
    val src = GraftTable.create(spark, tmpDir("mvdn-src"),
      rows.toDF("g", "x"), properties = Map("graft.cdf" -> "true"))
    val mv = MaterializedDistinct.create(spark, tmpDir("mvdn-view"),
      src, Seq("g"), "x")
    def expect = src.toDF.groupBy("g")
      .agg(countDistinct("x").as("n")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    def got = mv.toDF.collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(expect == Set(("g0", 2L), ("g1", 0L), ("g2", 2L)),
      "oracle sanity: countDistinct skips NULLs, all-NULL group exists at 0")
    assert(got == expect, "initial state over a nullable distinct column")
    // fold a window that retracts one NULL, adds a NULL to g2, and
    // retracts g0's x=1 entirely — NULL churn must not move any count
    src.delete(col("g") === "g1" && col("x").isNull)
    src.append(Seq(("g2", Option.empty[Long]), ("g1", Option.empty[Long]))
      .toDF("g", "x"))
    src.delete(col("g") === "g0" && col("x") === 1L)
    mv.refresh()
    assert(got == expect,
      "folded counts over NULL churn must equal recompute")
    assert(got == Set(("g0", 1L), ("g1", 0L), ("g2", 2L)))
    assert(mv.view.history.filter(col("operation") === "MV REMATERIALIZE")
      .count() == 0, "NULL handling must not force a rebuild")
  }

  test("racing DISTINCT refreshes converge without double-applying") {
    import spark.implicits._
    import java.util.ConcurrentModificationException
    val src = GraftTable.create(spark, tmpDir("mvdd-race-src"),
      (1 to 150).map(i => (s"g${i % 3}", i.toLong % 25)).toDF("g", "x"),
      properties = Map("graft.cdf" -> "true"))
    val viewDir = tmpDir("mvdd-race-view")
    MaterializedDistinct.create(spark, viewDir, src, Seq("g"), "x")
    src.delete(col("x") % 4 === 0)
    src.append(Seq(("g0", 77L), ("g2", 78L)).toDF("g", "x"))
    val h1 = MaterializedDistinct.forPath(spark, viewDir, src)
    val h2 = MaterializedDistinct.forPath(spark, viewDir, src)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      def submit(mv: MaterializedDistinct) =
        pool.submit(new java.util.concurrent.Callable[Boolean] {
          def call(): Boolean =
            try { mv.refresh(); true }
            catch { case _: ConcurrentModificationException => false }
        })
      val a = submit(h1); val b = submit(h2)
      assert(a.get() || b.get(), "at least one refresh must land")
      MaterializedDistinct.forPath(spark, viewDir, src).refresh()
      val expect = src.toDF.groupBy("g").agg(countDistinct("x").as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      val got = MaterializedDistinct.forPath(spark, viewDir, src).toDF
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got == expect, "post-race distinct state diverged from recompute")
    } finally pool.shutdown()
  }

  test("SQL COUNT DISTINCT view: CREATE + REFRESH route to the distinct class") {
    import spark.implicits._
    val gsql = new GraftSql(spark)
    gsql.registerCreate("dvsrc", tmpDir("mvdd-sql-src"),
      (1 to 60).map(i => (s"g${i % 2}", i.toLong % 10)).toDF("g", "x"))
    val viewDir = tmpDir("mvdd-sql-view")
    gsql.sql("CREATE MATERIALIZED VIEW dview LOCATION '" + viewDir +
      "' AS SELECT g, COUNT(DISTINCT x) FROM dvsrc GROUP BY g")
    def expect = gsql.sql("SELECT g, COUNT(DISTINCT x) AS n FROM dvsrc GROUP BY g")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    def got = MaterializedDistinct.forPath(spark,
        viewDir, gsql.table("dvsrc")).toDF
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == expect)
    gsql.sql("DELETE FROM dvsrc WHERE x = 3")
    gsql.sql("REFRESH MATERIALIZED VIEW dview")
    assert(got == expect, "SQL-refreshed distinct view must track the delete")
    // mixing COUNT DISTINCT with other aggregates refuses loudly
    intercept[IllegalArgumentException] {
      gsql.sql("CREATE MATERIALIZED VIEW bad LOCATION '" +
        tmpDir("mvdd-sql-bad") + "' AS SELECT g, COUNT(DISTINCT x), SUM(x) " +
        "FROM dvsrc GROUP BY g")
    }
  }

  test("SQL join view: CREATE ... JOIN USING, REFRESH folds both feeds") {
    import spark.implicits._
    val gsql = new GraftSql(spark)
    gsql.registerCreate("jfact",
      tmpDir("mvjsql-fact"),
      (1 to 40).map(i => (i.toLong % 8, i.toLong, i * 5L)).toDF("fk", "seq", "v"))
    gsql.registerCreate("jdim", tmpDir("mvjsql-dim"),
      (0L until 8L).map(k => (k, s"g${k % 2}")).toDF("fk", "grp"))
    gsql.sql("CREATE MATERIALIZED VIEW jmv LOCATION '" +
      tmpDir("mvjsql-view") + "' AS SELECT grp, COUNT(*), SUM(v) " +
      "FROM jfact JOIN jdim USING (fk) GROUP BY grp")
    def expect = gsql.sql(
      "SELECT grp, COUNT(*) AS n, SUM(v) AS s FROM jfact JOIN jdim USING (fk) GROUP BY grp")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    def state = gsql.sql("SELECT grp, mv_count, mv_sum_v FROM jmv")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(state == expect)
    gsql.sql("DELETE FROM jfact WHERE seq % 3 = 0")
    gsql.sql("REFRESH MATERIALIZED VIEW jmv")
    assert(state == expect, "SQL-created join view must fold fact deltas")
    gsql.sql("UPDATE jdim SET grp = 'moved' WHERE fk = 2")
    gsql.sql("REFRESH MATERIALIZED VIEW jmv")
    assert(state == expect, "SQL-created join view must fold the dim change")
  }
}
