package graft.plans

import graft.{GraftSparkSpec, Tables}
import graft.lake.{GraftTable, MaterializedAgg}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class MvRewriteSpec extends GraftSparkSpec {

  private def li = Tables(spark, sfDir, "lineitem")
    .select(col("l_orderkey"), col("l_returnflag"),
      round(col("l_quantity") * 100).cast("long").as("qty_c"))

  private def scansView(df: DataFrame, viewDir: String): Boolean =
    df.queryExecution.executedPlan.toString.contains(viewDir)

  test("fresh MV answers matching aggregates; stale views and other shapes don't") {
    val src = GraftTable.create(spark, tmpDir("mvr-src"), li.limit(300))
    val viewDir = tmpDir("mvr-view")
    val mv = MaterializedAgg.create(spark, viewDir, src,
      Seq("l_returnflag"), Seq("qty_c"))
    def q = src.toDF.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum("qty_c").as("s"))
    val expect = q.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    MvCatalog.register(mv)
    try {
      // rewrite fires: the plan reads the view, values are identical
      assert(scansView(q, "mvr-view"), "fresh MV must answer the aggregate")
      assert(q.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2))).toSet == expect)
      // non-matching shapes keep the source plan: a filter below the
      // agg, an aggregate the view doesn't store, a different grouping
      val filtered = src.toDF.filter(col("qty_c") > 0)
        .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
      assert(!scansView(filtered, "mvr-view"))
      val maxQ = src.toDF.groupBy("l_returnflag").agg(max("qty_c").as("m"))
      assert(!scansView(maxQ, "mvr-view"))
      val otherG = src.toDF.groupBy("l_orderkey").agg(count(lit(1)).as("n"))
      assert(!scansView(otherG, "mvr-view"))
      // source moved: the stale view must NOT answer, results stay true
      src.append(li.limit(40))
      val expect2 = (q.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2))).toSet, scansView(q, "mvr-view"))
      assert(!expect2._2, "stale MV must not answer")
      // refreshed view answers again, with the post-append numbers
      mv.refresh()
      assert(scansView(q, "mvr-view"))
      assert(q.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2))).toSet == expect2._1)
    } finally MvCatalog.clear()
  }

  test("persistent registration: a fresh process rewrites with no re-register") {
    val src = GraftTable.create(spark, tmpDir("mvr-p-src"), li.limit(250))
    val viewDir = tmpDir("mvr-p-view")
    val mv = MaterializedAgg.create(spark, viewDir, src,
      Seq("l_returnflag"), Seq("qty_c"))
    def q = src.toDF.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum("qty_c").as("s"))
    // oracle BEFORE any registration exists anywhere (pure source scan)
    val expect = q.collect().map(_.toSeq).toSet
    // the pointer write is a metadata commit on the SOURCE (bumps its
    // version), so the view re-stamps with one empty-delta refresh
    MvCatalog.registerPersistent(mv)
    mv.refresh()
    try {
      // clear() wipes the in-memory maps AND the probe cache — the
      // exact state of a brand-new process. The rule must find the
      // registration from the source table's own properties.
      MvCatalog.clear()
      assert(scansView(q, "mvr-p-view"),
        "a new process must auto-load the persisted registration")
      assert(q.collect().map(_.toSeq).toSet == expect)
      // staleness still gates: append → decline; refresh → answers
      src.append(li.limit(30))
      MvCatalog.clear()
      assert(!scansView(q, "mvr-p-view"), "stale persisted view must decline")
      graft.lake.MaterializedAgg.forPath(spark, viewDir, src).refresh()
      MvCatalog.clear()
      assert(scansView(q, "mvr-p-view"))
      // deregistration is durable too
      MvCatalog.deregisterPersistent(src)
      graft.lake.MaterializedAgg.forPath(spark, viewDir, src).refresh()
      MvCatalog.clear()
      assert(!scansView(q, "mvr-p-view"),
        "a withdrawn persistent registration must not load")
    } finally MvCatalog.clear()
  }

  test("persistent DISTINCT registration survives a fresh process") {
    import spark.implicits._
    import graft.lake.MaterializedDistinct
    val src = GraftTable.create(spark, tmpDir("mvr-pd-src"),
      (1 to 90).map(i => (s"g${i % 3}", i.toLong % 15)).toDF("g", "x"),
      properties = Map("graft.cdf" -> "true"))
    val mv = MaterializedDistinct.create(spark, tmpDir("mvr-pd-view"),
      src, Seq("g"), "x")
    def q = src.toDF.groupBy("g").agg(countDistinct("x").as("n"))
    val expect = q.collect().map(_.toSeq).toSet // oracle pre-registration
    MvCatalog.registerPersistentDistinct(mv)
    mv.refresh() // re-stamp past the pointer commit
    try {
      MvCatalog.clear()
      assert(scansView(q, "mvr-pd-view"),
        "distinct views auto-load from the persisted pointer too")
      assert(q.collect().map(_.toSeq).toSet == expect)
    } finally MvCatalog.clear()
  }

  test("avg and count(col) rewrite from stored sum + non-null count, NULL-exact") {
    // NULL stripe in the averaged column: avg must divide by the
    // NON-NULL count — a sum/count(*) derivation would be wrong here
    val withNulls = li.withColumn("qty_c",
      when(col("l_orderkey") % 3 === 0, lit(null).cast("long"))
        .otherwise(col("qty_c")))
    val src = GraftTable.create(spark, tmpDir("mvr-avg-src"), withNulls.limit(400))
    val mv = MaterializedAgg.create(spark, tmpDir("mvr-avg-view"), src,
      Seq("l_returnflag"), Seq("qty_c"))
    def q = src.toDF.groupBy("l_returnflag")
      .agg(avg("qty_c").as("a"), count(col("qty_c")).as("nv"))
    val expect = q.collect().map(r =>
      (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    MvCatalog.register(mv)
    try {
      assert(scansView(q, "mvr-avg-view"), "fresh MV must answer avg/count(col)")
      assert(q.collect().map(r =>
        (r.getString(0), r.getDouble(1), r.getLong(2))).toSet == expect)
      // exactness survives incremental maintenance of the counts
      src.delete(col("l_orderkey") % 7 === 0)
      mv.refresh()
      assert(scansView(q, "mvr-avg-view"))
      val fromView = q.collect().map(r =>
        (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
      MvCatalog.clear()
      assert(!scansView(q, "mvr-avg-view"))
      val fromSource = q.collect().map(r =>
        (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
      assert(fromView == fromSource, "view-answered avg differs from source scan")
    } finally MvCatalog.clear()
  }

  test("rollup rewrite: GROUP BY over a strict subset of view keys re-aggregates state") {
    val base = Tables(spark, sfDir, "lineitem")
      .select(col("l_returnflag"), col("l_linestatus"),
        when(col("l_orderkey") % 3 === 0, lit(null).cast("long"))
          .otherwise(round(col("l_quantity") * 100).cast("long")).as("qty_c"))
    val src = GraftTable.create(spark, tmpDir("mvr-ru-src"), base.limit(500))
    val mv = MaterializedAgg.create(spark, tmpDir("mvr-ru-view"), src,
      Seq("l_returnflag", "l_linestatus"), Seq("qty_c"),
      minCols = Seq("qty_c"), maxCols = Seq("qty_c"))
    // every foldable aggregate at once, over ONE of the two view keys
    def q = src.toDF.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum("qty_c").as("s"),
        avg("qty_c").as("a"), count(col("qty_c")).as("nv"),
        min("qty_c").as("mn"), max("qty_c").as("mx"))
    // and the degenerate subset: the global (no-key) aggregate
    def g = src.toDF.agg(count(lit(1)).as("n"), sum("qty_c").as("s"))
    MvCatalog.register(mv)
    try {
      assert(scansView(q, "mvr-ru-view"), "subset grouping must answer from state")
      assert(scansView(g, "mvr-ru-view"), "global aggregate is a subset too")
      val fromView = q.collect().map(_.toSeq).toSet
      val gView = g.collect().map(_.toSeq).toSet
      MvCatalog.clear()
      assert(!scansView(q, "mvr-ru-view"))
      val fromSource = q.collect().map(_.toSeq).toSet
      assert(fromView == fromSource,
        "rollup-answered aggregates differ from the source scan")
      assert(gView == g.collect().map(_.toSeq).toSet)
      // superset and disjoint groupings decline
      MvCatalog.register(mv)
      val superset = src.toDF.groupBy("l_returnflag", "l_linestatus", "qty_c")
        .agg(count(lit(1)).as("n"))
      assert(!scansView(superset, "mvr-ru-view"), "superset grouping must decline")
      val disjoint = src.toDF.groupBy("qty_c").agg(count(lit(1)).as("n"))
      assert(!scansView(disjoint, "mvr-ru-view"), "non-subset grouping must decline")
    } finally MvCatalog.clear()
  }

  test("key-only WHERE rewrites over state; value-column WHERE declines") {
    val base = Tables(spark, sfDir, "lineitem")
      .select(col("l_returnflag"), col("l_linestatus"),
        round(col("l_quantity") * 100).cast("long").as("qty_c"))
    val src = GraftTable.create(spark, tmpDir("mvr-f-src"), base.limit(500))
    val mv = MaterializedAgg.create(spark, tmpDir("mvr-f-view"), src,
      Seq("l_returnflag", "l_linestatus"), Seq("qty_c"))
    MvCatalog.register(mv)
    try {
      // exact grouping + filter on a key
      def qe = src.toDF.filter(col("l_returnflag") =!= "A")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), sum("qty_c").as("s"))
      // rollup grouping + filter on the OTHER key (not in the output)
      def qr = src.toDF.filter(col("l_linestatus") === "F")
        .groupBy("l_returnflag").agg(sum("qty_c").as("s"), avg("qty_c").as("a"))
      assert(scansView(qe, "mvr-f-view"), "key-filtered exact shape must answer")
      assert(scansView(qr, "mvr-f-view"), "key-filtered rollup must answer")
      val ve = qe.collect().map(_.toSeq).toSet
      val vr = qr.collect().map(_.toSeq).toSet
      // a predicate over a VALUE column cannot partition groups: decline
      val bad = src.toDF.filter(col("qty_c") > 100)
        .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
      assert(!scansView(bad, "mvr-f-view"), "value-column WHERE must decline")
      // a key-filter mixed with a value reference declines too
      val mixed = src.toDF
        .filter(col("l_returnflag") === "N" && col("qty_c") > 0)
        .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
      assert(!scansView(mixed, "mvr-f-view"))
      MvCatalog.clear()
      assert(qe.collect().map(_.toSeq).toSet == ve,
        "view-answered key-filtered exact differs from source")
      assert(qr.collect().map(_.toSeq).toSet == vr,
        "view-answered key-filtered rollup differs from source")
    } finally MvCatalog.clear()
  }

  test("HAVING composes over the rewrite: the post-aggregate filter rides the state read") {
    // HAVING lowers to a Filter ABOVE the Aggregate referencing the
    // aggregate's output attributes; the rewrite preserves output
    // attribute ids, so the filter resolves against the rewritten
    // subtree untouched — post-aggregate predicates (including on
    // aggregate values, which a BELOW-aggregate WHERE must decline)
    // come for free and still read KB-scale state, not the source.
    val src = GraftTable.create(spark, tmpDir("mvr-h-src"), li.limit(400))
    val mv = MaterializedAgg.create(spark, tmpDir("mvr-h-view"), src,
      Seq("l_returnflag"), Seq("qty_c"))
    def q = src.toDF.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum("qty_c").as("s"))
      .filter(col("s") > 1000 && col("l_returnflag") =!= "zz")
    MvCatalog.register(mv)
    try {
      assert(scansView(q, "mvr-h-view"),
        "a HAVING above the aggregate must not block the rewrite")
      val fromView = q.collect().map(_.toSeq).toSet
      MvCatalog.clear()
      assert(!scansView(q, "mvr-h-view"))
      assert(q.collect().map(_.toSeq).toSet == fromView,
        "view-answered HAVING query differs from source")
    } finally MvCatalog.clear()
  }

  test("min/max rewrite answers from native-typed state") {
    val src = GraftTable.create(spark, tmpDir("mvr-mm-src"), li.limit(300))
    val mv = MaterializedAgg.create(spark, tmpDir("mvr-mm-view"), src,
      Seq("l_returnflag"), Nil, minCols = Seq("qty_c"), maxCols = Seq("qty_c"))
    def q = src.toDF.groupBy("l_returnflag")
      .agg(min("qty_c").as("mn"), max("qty_c").as("mx"))
    MvCatalog.register(mv)
    try {
      assert(scansView(q, "mvr-mm-view"), "fresh MV must answer min/max")
      val fromView = q.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      MvCatalog.clear()
      assert(!scansView(q, "mvr-mm-view"))
      val fromSource = q.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(fromView == fromSource, "view-answered min/max differs from source")
    } finally MvCatalog.clear()
  }

  test("join-shape rewrite: fact-join-dim GROUP BY answers from a doubly-fresh join view") {
    import spark.implicits._
    val src = GraftTable.create(spark, tmpDir("mvr-j-fact"),
      (1 to 50).map(i => (i.toLong % 10, i.toLong, i * 3L)).toDF("fk", "seq", "v"),
      properties = Map("graft.cdf" -> "true"))
    val d = GraftTable.create(spark, tmpDir("mvr-j-dim"),
      (0L until 10L).map(k => (k, s"g${k % 3}")).toDF("fk", "grp"))
    val mv = MaterializedAgg.createJoin(spark, tmpDir("mvr-j-view"),
      src, d, Seq("fk"), Seq("grp"), Seq("v"))
    MvCatalog.register(mv)
    try {
      def q = src.toDF.join(d.toDF, Seq("fk")).groupBy("grp")
        .agg(count(lit(1)).as("n"), sum("v").as("s"))
      assert(scansView(q, "mvr-j-view"),
        "a doubly-fresh join view must answer the join aggregate")
      val fromView = q.collect().map(_.toSeq).toSet
      // the plain single-table aggregate must NOT be answered by the
      // join view (its state aggregates the join, not the fact alone)
      val plain = src.toDF.groupBy("fk").agg(count(lit(1)).as("n"))
      assert(!scansView(plain, "mvr-j-view"))
      // fact moved: stale view declines until refresh
      src.append(Seq((3L, 999L, 7L)).toDF("fk", "seq", "v"))
      assert(!scansView(q, "mvr-j-view"), "a stale fact stamp must decline")
      mv.refresh()
      assert(scansView(q, "mvr-j-view"))
      // dim moved: declines until the next refresh folds the dim delta
      d.update(col("fk") === 2, Map("grp" -> lit("gX")))
      assert(!scansView(q, "mvr-j-view"), "a stale dim stamp must decline")
      mv.refresh()
      assert(scansView(q, "mvr-j-view"))
      // values equal the real join throughout
      val real = {
        MvCatalog.clear()
        val r = q.collect().map(_.toSeq).toSet
        MvCatalog.register(mv)
        r
      }
      assert(q.collect().map(_.toSeq).toSet == real)
      assert(fromView.nonEmpty)
    } finally MvCatalog.clear()
  }

  test("COUNT DISTINCT rewrite: fresh occurrence state answers; stale/mismatch decline") {
    import spark.implicits._
    import graft.lake.MaterializedDistinct
    val src = GraftTable.create(spark, tmpDir("mvr-d-src"),
      (1 to 90).map(i => (s"g${i % 3}", i.toLong % 15)).toDF("g", "x"),
      properties = Map("graft.cdf" -> "true"))
    val mv = MaterializedDistinct.create(spark, tmpDir("mvr-d-view"),
      src, Seq("g"), "x")
    MvCatalog.registerDistinct(mv)
    try {
      def q = src.toDF.groupBy("g").agg(countDistinct("x").as("n"))
      val expect = {
        MvCatalog.clear(); val r = q.collect().map(_.toSeq).toSet
        MvCatalog.registerDistinct(mv); r
      }
      assert(scansView(q, "mvr-d-view"),
        "a fresh distinct view must answer COUNT(DISTINCT)")
      assert(q.collect().map(_.toSeq).toSet == expect)
      // distinct on a DIFFERENT column declines
      val other = src.toDF.groupBy("g").agg(countDistinct("g").as("n"))
      assert(!scansView(other, "mvr-d-view"))
      // stale stamp declines until refresh
      src.delete(col("x") === 2)
      assert(!scansView(q, "mvr-d-view"))
      mv.refresh()
      assert(scansView(q, "mvr-d-view"))
      val expect2 = {
        MvCatalog.clear(); val r = q.collect().map(_.toSeq).toSet
        MvCatalog.registerDistinct(mv); r
      }
      assert(q.collect().map(_.toSeq).toSet == expect2)
    } finally MvCatalog.clear()
  }

  test("COUNT DISTINCT rewrite over a nullable column matches SQL semantics") {
    import spark.implicits._
    import graft.lake.MaterializedDistinct
    val src = GraftTable.create(spark, tmpDir("mvr-dn-src"),
      Seq(("g0", Some(1L)), ("g0", None), ("g0", Some(2L)),
          ("g1", None), ("g1", None), ("g2", Some(4L))).toDF("g", "x"),
      properties = Map("graft.cdf" -> "true"))
    val mv = MaterializedDistinct.create(spark, tmpDir("mvr-dn-view"),
      src, Seq("g"), "x")
    MvCatalog.registerDistinct(mv)
    try {
      def q = src.toDF.groupBy("g").agg(countDistinct("x").as("n"))
      val expect = {
        MvCatalog.clear(); val r = q.collect().map(_.toSeq).toSet
        MvCatalog.registerDistinct(mv); r
      }
      assert(expect.contains(Seq("g1", 0L)),
        "oracle sanity: the all-NULL group must exist with n=0")
      assert(scansView(q, "mvr-dn-view"))
      assert(q.collect().map(_.toSeq).toSet == expect,
        "rewritten distinct must skip NULL state rows yet keep all-NULL groups")
    } finally MvCatalog.clear()
  }

  test("LEFT-OUTER rewrite: fresh fact stamp answers; dim churn needs no refresh") {
    import spark.implicits._
    import graft.lake.MaterializedOuterJoin
    val src = GraftTable.create(spark, tmpDir("mvr-oj-fact"),
      (1 to 60).map(i => (i.toLong % 10, i.toLong)).toDF("fk", "v"),
      properties = Map("graft.cdf" -> "true"))
    val d = GraftTable.create(spark, tmpDir("mvr-oj-dim"),
      (0L until 8L).map(k => (k, s"g${k % 3}")).toDF("fk", "grp"))
    val mv = MaterializedOuterJoin.create(spark, tmpDir("mvr-oj-view"),
      src, d, Seq("fk"), Seq("grp"), Seq("v"))
    MvCatalog.registerOuter(mv)
    try {
      def q = src.toDF.join(d.toDF, Seq("fk"), "left").groupBy("grp")
        .agg(count(lit(1)).as("n"), sum("v").as("s"))
      val expect = {
        MvCatalog.clear(); val r = q.collect().map(_.toSeq).toSet
        MvCatalog.registerOuter(mv); r
      }
      assert(expect.exists(_.head == null),
        "fixture sanity: the NULL-extended group must exist")
      assert(scansView(q, "mvr-oj-view"),
        "a fresh LEFT-OUTER view must answer the outer aggregate")
      assert(q.collect().map(_.toSeq).toSet == expect)
      // an INNER join of the same tables must NOT rewrite to it
      val inner = src.toDF.join(d.toDF, Seq("fk")).groupBy("grp")
        .agg(count(lit(1)).as("n"))
      assert(!scansView(inner, "mvr-oj-view"),
        "inner-join queries must not read outer state")
      // dim churn: rewrite keeps firing and stays exact, no refresh
      d.append(Seq((8L, "gNEW")).toDF("fk", "grp"))
      d.delete(col("fk") === 2)
      val expect2 = {
        MvCatalog.clear(); val r = q.collect().map(_.toSeq).toSet
        MvCatalog.registerOuter(mv); r
      }
      assert(scansView(q, "mvr-oj-view"),
        "dim DML must not stale the outer rewrite — the read joins live dim")
      assert(q.collect().map(_.toSeq).toSet == expect2)
      // fact movement DOES stale until refresh
      src.append(Seq((3L, 999L)).toDF("fk", "v"))
      assert(!scansView(q, "mvr-oj-view"), "stale fact stamp must decline")
      mv.refresh()
      assert(scansView(q, "mvr-oj-view"))
      // global rollup (empty grouping is not a subset-of-keys case we
      // claim — but a keyed subset is): group by nothing declines,
      // exact grouping still answers post-refresh
      val expect3 = {
        MvCatalog.clear(); val r = q.collect().map(_.toSeq).toSet
        MvCatalog.registerOuter(mv); r
      }
      assert(q.collect().map(_.toSeq).toSet == expect3)
      // a RIGHT query must NOT read a LEFT view (kind mismatch)
      val rightQ = src.toDF.join(d.toDF, Seq("fk"), "right").groupBy("grp")
        .agg(count(lit(1)).as("n"))
      assert(!scansView(rightQ, "mvr-oj-view"),
        "a left view must not answer a right-outer query")
    } finally MvCatalog.clear()
  }

  test("RIGHT-OUTER rewrite answers from a right view, exact through dim-only keys") {
    import spark.implicits._
    import graft.lake.MaterializedOuterJoin
    val src = GraftTable.create(spark, tmpDir("mvr-roj-fact"),
      (1 to 50).map(i => (i.toLong % 8, i.toLong)).toDF("fk", "v"),
      properties = Map("graft.cdf" -> "true"))
    val d = GraftTable.create(spark, tmpDir("mvr-roj-dim"),
      (4L until 12L).map(k => (k, s"g${k % 3}")).toDF("fk", "grp"))
    val mv = MaterializedOuterJoin.create(spark, tmpDir("mvr-roj-view"),
      src, d, Seq("fk"), Seq("grp"), Seq("v"), joinType = "right")
    MvCatalog.registerOuter(mv)
    try {
      def q = src.toDF.join(d.toDF, Seq("fk"), "right").groupBy("grp")
        .agg(count(lit(1)).as("n"), sum("v").as("s"))
      val expect = {
        MvCatalog.clear(); val r = q.collect().map(_.toSeq).toSet
        MvCatalog.registerOuter(mv); r
      }
      assert(scansView(q, "mvr-roj-view"),
        "a fresh RIGHT view must answer the right-outer aggregate")
      assert(q.collect().map(_.toSeq).toSet == expect,
        "rewritten right-outer must include dim-only single-row groups")
    } finally MvCatalog.clear()
  }

  test("join-view rollup: a strict subset of join-view keys re-aggregates state") {
    import spark.implicits._
    val src = GraftTable.create(spark, tmpDir("mvr-jr-fact"),
      (1 to 60).map(i => (i.toLong % 12, i.toLong, i * 5L)).toDF("fk", "seq", "v"),
      properties = Map("graft.cdf" -> "true"))
    val d = GraftTable.create(spark, tmpDir("mvr-jr-dim"),
      (0L until 12L).map(k => (k, s"g${k % 4}")).toDF("fk", "grp"))
    // view keys (grp, fk): one from each side of the join
    val mv = MaterializedAgg.createJoin(spark, tmpDir("mvr-jr-view"),
      src, d, Seq("fk"), Seq("grp", "fk"), Seq("v"))
    MvCatalog.register(mv)
    try {
      // subset key from the DIM side rolls up stored state
      def byGrp = src.toDF.join(d.toDF, Seq("fk")).groupBy("grp")
        .agg(count(lit(1)).as("n"), sum("v").as("s"), avg("v").as("a"))
      // subset key from the FACT side rolls up too
      def byFk = src.toDF.join(d.toDF, Seq("fk")).groupBy("fk")
        .agg(sum("v").as("s"))
      val (expectGrp, expectFk) = {
        MvCatalog.clear()
        val r = (byGrp.collect().map(_.toSeq).toSet,
          byFk.collect().map(_.toSeq).toSet)
        MvCatalog.register(mv)
        r
      }
      assert(scansView(byGrp, "mvr-jr-view"),
        "a dim-side subset of join-view keys must roll up from state")
      assert(byGrp.collect().map(_.toSeq).toSet == expectGrp)
      assert(scansView(byFk, "mvr-jr-view"),
        "a fact-side subset of join-view keys must roll up from state")
      assert(byFk.collect().map(_.toSeq).toSet == expectFk)
      // a grouping OUTSIDE the view's keys still declines
      val bySeq = src.toDF.join(d.toDF, Seq("fk")).groupBy("seq")
        .agg(sum("v").as("s"))
      assert(!scansView(bySeq, "mvr-jr-view"))
      // key-only WHERE over the join composes with the rollup
      def filtered = src.toDF.join(d.toDF, Seq("fk"))
        .filter(col("grp") =!= "g1").groupBy("grp").agg(sum("v").as("s"))
      val expectF = {
        MvCatalog.clear()
        val r = filtered.collect().map(_.toSeq).toSet
        MvCatalog.register(mv)
        r
      }
      assert(scansView(filtered, "mvr-jr-view"),
        "a key-only WHERE over a join view must rewrite")
      assert(filtered.collect().map(_.toSeq).toSet == expectF)
      // a WHERE touching a non-key column declines
      val valueFiltered = src.toDF.join(d.toDF, Seq("fk"))
        .filter(col("v") > 10).groupBy("grp").agg(sum("v").as("s"))
      assert(!scansView(valueFiltered, "mvr-jr-view"))
    } finally MvCatalog.clear()
  }
}
