package graft.lake

import graft.{GraftSparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Stats→CBO injection (reference §I): analyzed statistics drive join
  * strategy and shuffle sizing, independent of Spark's file-size
  * heuristics.
  */
class CboSpec extends GraftSparkSpec {

  test("computeStats-driven broadcast flips a SMJ to BroadcastHashJoin") {
    val dim = GraftTable.create(spark, tmpDir("cbo_dim"),
      Tables(spark, sfDir, "nation"))
    val fact = GraftTable.create(spark, tmpDir("cbo_fact"),
      Tables(spark, sfDir, "customer"))
    dim.computeStats()
    fact.computeStats()

    assert(Cbo.rowCount(dim).exists(n => n > 0 && n < 100))
    assert(Cbo.rowCount(fact).exists(_ > 100))

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // disable the size heuristic entirely: any broadcast below must
    // come from the stats-driven hint
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plain = fact.toDF.join(dim.toDF,
        col("c_nationkey") === col("n_nationkey"))
      assert(!plain.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))

      val statsDriven = Cbo.readForJoin(fact).join(Cbo.readForJoin(dim),
        col("c_nationkey") === col("n_nationkey"))
      assert(statsDriven.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
      // fact side is over the (tiny) test threshold when one is set low
      val bigFirst = Cbo.readForJoin(fact, maxBroadcastRows = 10)
        .join(Cbo.readForJoin(dim, maxBroadcastRows = 10),
          col("c_nationkey") === col("n_nationkey"))
      assert(!bigFirst.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
      // results identical either way
      assert(statsDriven.count() == plain.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("ANALYZE stats reach Catalyst: optimizedPlan.stats + CBO broadcast flip") {
    val dimPath = tmpDir("cbo_cat_dim")
    val dim = GraftTable.create(spark, dimPath, Tables(spark, sfDir, "nation"))
    val factPath = tmpDir("cbo_cat_fact")
    val fact = GraftTable.create(spark, factPath, Tables(spark, sfDir, "customer"))

    def read(p: String) = spark.read.format("graftlake").load(p)

    // before ANALYZE: no catalog stats — rowCount absent
    assert(read(dimPath).queryExecution.optimizedPlan.stats.rowCount.isEmpty)

    dim.computeStats()
    fact.computeStats()
    val nDim = dim.toDF.count()

    val prevCbo = spark.conf.get("spark.sql.cbo.enabled", "false")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      // rowCount + per-attribute NDV flow into the optimized plan with
      // no explicit API call — the reference's §I EXPLAIN EXTENDED check
      val st = read(dimPath).queryExecution.optimizedPlan.stats
      assert(st.rowCount.contains(BigInt(nDim)), s"rowCount=${st.rowCount}")
      assert(st.attributeStats.nonEmpty)
      val ndvs = st.attributeStats.map { case (a, s) => a.name -> s.distinctCount }
      assert(ndvs.get("n_nationkey").flatten.contains(BigInt(nDim)))

      // CBO sizeInBytes derives from rowCount × row width, far below the
      // raw-file-size heuristic; pick a threshold between the two and the
      // join broadcasts only because stats flowed in
      val statsSize = st.sizeInBytes.toLong
      // the relation's size heuristic: on-disk snapshot bytes × 3
      val rawSize = dim.snapshot.sizeInBytes * 3
      assert(statsSize < rawSize,
        s"CBO row-based size $statsSize should undercut raw $rawSize")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
        ((statsSize + rawSize) / 2).toString)
      val joined = read(factPath).join(read(dimPath),
        col("c_nationkey") === col("n_nationkey"))
      assert(joined.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
      spark.conf.set("spark.sql.cbo.enabled", "false")
      val joinedNoCbo = read(factPath).join(read(dimPath),
        col("c_nationkey") === col("n_nationkey"))
      assert(!joinedNoCbo.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", prevCbo)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }
  }

  test("autoCollect maintains stats per append with no explicit ANALYZE") {
    val li = Tables(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_returnflag", "l_quantity")
    val t = GraftTable.create(spark, tmpDir("cbo_auto"), li.limit(100))
    t.setTableProperties(Map("graft.stats.autoCollect" -> "true"))
    assert(Cbo.tableStats(t).isEmpty, "no stats before the first write")

    // first auto-collect = full ANALYZE of the whole table
    t.append(li.limit(150).filter(col("l_orderkey") >= 0))
    val first = Cbo.tableStats(t)
    assert(first.nonEmpty, "stats must exist after a plain append")
    assert(Cbo.rowCount(t).contains(100L + 150L))

    // second append updates incrementally: rows accumulate from footer
    // stats, min/max widen, NDV never shrinks
    val batch = li.limit(400)
    t.append(batch)
    val second = Cbo.tableStats(t)
    assert(Cbo.rowCount(t).contains(100L + 150L + 400L))
    assert(second("l_returnflag").distinct >= first("l_returnflag").distinct)
    assert(BigDecimal(second("l_quantity").min) <= BigDecimal(first("l_quantity").min))
    assert(BigDecimal(second("l_quantity").max) >= BigDecimal(first("l_quantity").max))
    // the auto refresh is logged as an auto-mode ANALYZE
    val hist = t.history.collect().map(_.getAs[String]("operation"))
    assert(hist.count(_ == "ANALYZE") >= 2)
  }

  test("selectivity estimates come from NDV and row counts") {
    val t = GraftTable.create(spark, tmpDir("cbo_sel"),
      Tables(spark, sfDir, "lineitem"))
    t.computeStats()
    val stats = Cbo.tableStats(t)
    assert(stats.contains("l_returnflag"))
    val total = Cbo.rowCount(t).get
    // l_returnflag has 3 distinct values → selectivity 1/3, estimate ≈ rows/3
    assert(stats("l_returnflag").distinct == 3)
    assert(Cbo.equalitySelectivity(t, "l_returnflag").get == 1.0 / 3)
    assert(Cbo.estimatedRowsAfterEquality(t, "l_returnflag").get == math.round(total / 3.0))
    // shuffle sizing: tiny table → 1 partition; ~64MB target honored
    assert(Cbo.suggestedShufflePartitions(t) == 1)
    assert(Cbo.suggestedShufflePartitions(t, targetBytes = 1024) > 1)
  }

  test("equi-height histogram flips the broadcast decision 1/NDV gets " +
      "wrong on a skewed key") {
    import spark.implicits._
    // 20k rows: ONE heavy key (777) holds 90%, 2k light keys share 10%
    val hot = (1 to 18000).map(_ => 777L)
    val light = (1L to 2000L).map(10000L + _)
    val df = (hot ++ light).toDF("k")
      .withColumn("payload", col("k") * 2)
      .repartition(8)
    val t = GraftTable.create(spark, tmpDir("cbo_hist"), df)
    val gsql = new GraftSql(spark)
    gsql.register("skewed", t.path)
    gsql.sql("ANALYZE TABLE skewed COMPUTE STATISTICS FOR COLUMNS (k)")
    val t2 = GraftTable.forPath(spark, t.path)

    // 1/NDV is catastrophically wrong on the heavy key: NDV ≈ 2001, so
    // it estimates ~10 rows where the truth is 18 000
    val ndvEst = Cbo.estimatedRowsAfterEquality(t2, "k").get
    assert(ndvEst < 100, s"1/NDV estimate should be tiny: $ndvEst")

    // the histogram reads the heavy key's true mass off the repeated
    // quantile boundaries...
    val hotEst = Cbo.estimatedRowsAfterEquality(t2, "k", 777.0).get
    assert(hotEst > 10000L && hotEst <= 20000L,
      s"histogram must see the heavy key's ~18k rows, got $hotEst")
    // ...and a light key stays a light estimate (bucket height / NDV)
    val lightEst = Cbo.estimatedRowsAfterEquality(t2, "k", 10042.0).get
    assert(lightEst < 100, s"light key must estimate small, got $lightEst")
    // out-of-range probe estimates zero
    assert(Cbo.estimatedRowsAfterEquality(t2, "k", -5.0).contains(0L))

    // the DECISION flips: with the size heuristic off, the light-key
    // side broadcasts and the heavy-key side must NOT — under 1/NDV
    // both would broadcast and the hot side floods every executor
    val dim = Seq((777L, 1L), (10042L, 2L), (99999L, 3L)).toDF("k", "w")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val hotJoin = dim.join(
        Cbo.readForJoinEquality(t2, "k", 777.0, maxBroadcastRows = 1000), "k")
      assert(!hotJoin.queryExecution.executedPlan.toString
          .contains("BroadcastHashJoin"),
        "heavy-key side must not broadcast")
      val lightJoin = dim.join(
        Cbo.readForJoinEquality(t2, "k", 10042.0, maxBroadcastRows = 1000), "k")
      assert(lightJoin.queryExecution.executedPlan.toString
          .contains("BroadcastHashJoin"),
        "light-key side must broadcast from the histogram estimate")
      // correctness unaffected by the hint either way
      assert(hotJoin.count() == 18000L)
      assert(lightJoin.count() == 1L)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    // histogram artifact shape: ~KB property, equi-height bounds cover
    // the domain, singleton buckets carry the heavy value
    val h = Cbo.histogram(t2, "k").get
    assert(h.buckets == 32 && h.bounds.length == 33 && h.rows == 20000L)
    assert(h.bounds.count(_ == 777.0) >= 20,
      "the 90% key must occupy most quantile boundaries")
    assert(h.bounds.head == 777.0 && h.bounds.last == 12000.0)
  }

  test("runtime-filter decision prices the MASS, not the key range: a " +
      "narrow heavy range goes plain, a wide light range keeps the bloom") {
    import spark.implicits._
    // 18k rows at key 777 + 2k light rows over [10001, 12000]
    val df = ((1 to 18000).map(_ => 777L) ++ (1L to 2000L).map(10000L + _))
      .toDF("k")
    val t0 = GraftTable.create(spark, tmpDir("cbo_rtf"), df.repartition(4))
    t0.computeHistogram(Seq("k"))
    val t = GraftTable.forPath(spark, t0.path)

    // few keys always enumerate
    assert(Cbo.runtimeFilterDecision(t, "k", 10, 777.0, 800.0)._1
      == "dfp-exact")
    // 101 keys over [700, 800]: WIDTH says 0.9% of the domain, MASS
    // says 90% of the rows (the heavy value) — a bloom built over
    // this dim keeps ~everything, so the filter is pure waste
    val (hot, hotKept) =
      Cbo.runtimeFilterDecision(t, "k", 101, 700.0, 800.0, maxKeys = 50)
    assert(hot == "plain", s"heavy-range filter must be skipped: $hot")
    assert(hotKept > 0.8, s"estimated kept fraction must see the mass: $hotKept")
    // 1000 keys over the wide light tail: WIDTH says half the domain,
    // MASS says ~5% of rows survive — the bloom pays for itself
    val (cold, coldKept) =
      Cbo.runtimeFilterDecision(t, "k", 1000, 10001.0, 11000.0, maxKeys = 50)
    assert(cold == "bloom", s"light-range filter must stay: $cold")
    assert(coldKept < 0.2, s"kept estimate must be small: $coldKept")
    // no histogram -> static fallback (bloom past maxKeys)
    val bare = GraftTable.create(spark, tmpDir("cbo_rtf_bare"),
      (1L to 100L).toDF("k"))
    assert(Cbo.runtimeFilterDecision(bare, "k", 1000, 0.0, 50.0,
      maxKeys = 50)._1 == "bloom")

    // the READ routes accordingly and every path answers identically
    val hotDim = (700L to 800L).toDF("k")
    val coldDim = (10001L to 11000L).toDF("k")
    val (tagH, dfH) = t.readCostBasedTagged(hotDim, "k", maxKeys = 50)
    val (tagC, dfC) = t.readCostBasedTagged(coldDim, "k", maxKeys = 50)
    val (tagS, dfS) = t.readCostBasedTagged(hotDim.limit(5), "k", maxKeys = 50)
    assert(tagH == "plain" && tagC == "bloom" && tagS == "dfp-exact")
    assert(dfH.join(hotDim, "k").count() == 18000L)
    assert(dfC.join(coldDim, "k").count() == 1000L)
    assert(t.toDF.join(hotDim, "k").count() == 18000L)
  }

  test("histogram rows exclude NULLs: selectivity on a nullable column " +
      "prices non-null mass, not total row count") {
    import spark.implicits._
    // 6k non-null (4k heavy at 777, 2k light) + 6k NULL rows: the
    // quantile bounds and per-bucket NDVs only ever see non-null
    // values, so a rows=12000 histogram would double every bucket
    // height (r12 advisory)
    val vals: Seq[java.lang.Long] =
      ((1 to 4000).map(_ => java.lang.Long.valueOf(777L)) ++
        (1L to 2000L).map(i => java.lang.Long.valueOf(10000L + i)) ++
        (1 to 6000).map(_ => null.asInstanceOf[java.lang.Long]))
    val t0 = GraftTable.create(spark, tmpDir("cbo_hist_null"),
      vals.toDF("k").repartition(4))
    t0.computeHistogram(Seq("k"))
    val t = GraftTable.forPath(spark, t0.path)
    val h = Cbo.histogram(t, "k").get
    assert(h.rows == 6000L,
      s"histogram mass must be the non-null count, got ${h.rows}")
    // equality on the heavy key lands near its true 4k rows — under
    // the old total-count mass it would estimate ~8k
    val est = Cbo.estimatedRowsAfterEquality(t, "k", 777.0).get
    assert(est > 2000L && est <= 6000L,
      s"non-null-based estimate must bound at the non-null mass: $est")
    // an all-null column refuses cleanly instead of crashing in the
    // quantile pass
    val tn = GraftTable.create(spark, tmpDir("cbo_hist_allnull"),
      (1 to 100).map(_ => (1L, null.asInstanceOf[java.lang.Long]))
        .toDF("a", "b"))
    val ex = intercept[IllegalArgumentException] {
      tn.computeHistogram(Seq("b"))
    }
    assert(ex.getMessage.contains("all-null"))
  }

  test("histogram range selectivity follows the MASS, not the range width") {
    import spark.implicits._
    // same skew: 18k rows at 777, 2k light rows spread over [10001,12000]
    val df = ((1 to 18000).map(_ => 777L) ++ (1L to 2000L).map(10000L + _))
      .toDF("k")
    val t0 = GraftTable.create(spark, tmpDir("cbo_range"), df.repartition(4))
    t0.computeHistogram(Seq("k"))
    val t = GraftTable.forPath(spark, t0.path)

    // the range [0, 1000] covers ONLY the heavy value: 90% of rows in
    // under 5% of the domain width — uniform min/max interpolation
    // ((1000-777)/(12000-777) ≈ 2%) is off by ~45×
    val hotRange = Cbo.estimatedRowsAfterRange(t, "k", 0.0, 1000.0).get
    assert(hotRange > 15000L && hotRange <= 20000L,
      s"range over the heavy value must see its mass: $hotRange")
    // the wide light range [10001, 12000] holds only 10% of rows
    val lightRange = Cbo.estimatedRowsAfterRange(t, "k", 10001.0, 12000.0).get
    assert(lightRange < 4500L,
      s"the wide light range holds only ~2000 rows: $lightRange")
    // degenerate / disjoint ranges
    assert(Cbo.rangeSelectivity(t, "k", 20000.0, 30000.0).contains(0.0))
    assert(Cbo.rangeSelectivity(t, "k", 100.0, 50.0).contains(0.0))
    // full-domain range ≈ everything
    assert(Cbo.estimatedRowsAfterRange(t, "k", 0.0, 99999.0).get > 19000L)
    // no histogram -> None (callers keep their uniform heuristics)
    val bare = GraftTable.create(spark, tmpDir("cbo_range_bare"),
      (1L to 10L).toDF("k"))
    assert(Cbo.rangeSelectivity(bare, "k", 0.0, 5.0).isEmpty)
  }

  test("histograms reach Catalyst's own estimator: the skewed-key filter " +
      "cardinality flips with no explicit API") {
    import spark.implicits._
    val df = ((1 to 18000).map(_ => 777L) ++ (1L to 2000L).map(10000L + _))
      .toDF("k")
    val path = tmpDir("cbo_cat_hist")
    val t = GraftTable.create(spark, path, df.repartition(4))
    t.computeStats()
    t.computeHistogram(Seq("k"))
    val prevCbo = spark.conf.get("spark.sql.cbo.enabled", "false")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val read = spark.read.format("graftlake").load(path)
      val attr = read.queryExecution.optimizedPlan.stats.attributeStats
        .find(_._1.name == "k").map(_._2)
      assert(attr.exists(_.histogram.isDefined),
        "the ANALYZE FOR COLUMNS histogram must surface in attributeStats")
      // Spark's own FilterEstimation now sees the heavy value's mass:
      // the equality filter's row estimate lands near 18k, where the
      // NDV-only estimate would be rows/ndv ≈ 10
      val hotEst = read.filter(col("k") === 777L)
        .queryExecution.optimizedPlan.stats.rowCount
      assert(hotEst.exists(e => e > BigInt(5000) && e <= BigInt(20000)),
        s"histogram-backed Catalyst estimate must see the skew: $hotEst")
      // control: same data analyzed WITHOUT histograms estimates tiny
      val bare = GraftTable.create(spark, tmpDir("cbo_cat_hist_bare"),
        df.repartition(4))
      bare.computeStats()
      val bareEst = spark.read.format("graftlake").load(bare.path)
        .filter(col("k") === 777L)
        .queryExecution.optimizedPlan.stats.rowCount
      assert(bareEst.exists(_ < BigInt(200)),
        s"NDV-only estimate stays uniform-small: $bareEst")
    } finally spark.conf.set("spark.sql.cbo.enabled", prevCbo)
  }

  test("autoCollect refreshes histograms geometrically: <20% growth " +
      "stays stale, past it rebuilds on the append path") {
    import spark.implicits._
    val base = ((1 to 4000).map(_ => 777L) ++ (1L to 1000L).map(10000L + _))
      .toDF("k")
    val t0 = GraftTable.create(spark, tmpDir("cbo_hist_auto"),
      base.repartition(4),
      properties = Map("graft.stats.autoCollect" -> "true"))
    t0.computeStats()
    t0.computeHistogram(Seq("k"))
    val t = GraftTable.forPath(spark, t0.path)
    assert(Cbo.histogram(t, "k").exists(_.rows == 5000L))

    // +10% growth: base stats refresh incrementally, the histogram
    // stays at its build point (no O(table) rebuild per small append)
    t.append((1L to 500L).map(20000L + _).toDF("k"))
    val t1 = GraftTable.forPath(spark, t.path)
    assert(Cbo.rowCount(t1).contains(5500L), "base stats track per append")
    assert(Cbo.histogram(t1, "k").exists(_.rows == 5000L),
      "a 10% append must not rebuild the histogram")

    // cumulative +30%: the growth threshold trips, the append itself
    // rebuilds, and the heavy key's estimate tracks the new mass
    t1.append((1 to 1000).map(_ => 777L).toDF("k"))
    val t2 = GraftTable.forPath(spark, t1.path)
    assert(Cbo.histogram(t2, "k").exists(_.rows == 6500L),
      s"past 20% growth the histogram must rebuild: ${Cbo.histogram(t2, "k").map(_.rows)}")
    val est = Cbo.estimatedRowsAfterEquality(t2, "k", 777.0).get
    assert(est > 4000L && est <= 6500L,
      s"the refreshed histogram must price the heavy key's new mass: $est")
  }

  test("L109: injected stats drive Catalyst's own cost-based join REORDER") {
    import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
    // four analyzed graftlake relations; the SQL names them in the
    // worst syntactic order (fact first), so only a cost model that
    // SEES our injected rowCounts can move the fact join last
    val specs = Seq("orders" -> "cbo_jr_o", "customer" -> "cbo_jr_c",
      "nation" -> "cbo_jr_n", "region" -> "cbo_jr_r")
    val paths = specs.map { case (t, d) =>
      val gt = GraftTable.create(spark, tmpDir(d), Tables(spark, sfDir, t))
      gt.computeStats()
      t -> gt.path
    }.toMap
    paths.foreach { case (t, p) =>
      spark.read.format("graftlake").load(p).createOrReplaceTempView(s"jr_$t")
    }
    val sql =
      """SELECT r_name, count(*) AS n
        |FROM jr_orders o
        |JOIN jr_customer c ON o.o_custkey = c.c_custkey
        |JOIN jr_nation n ON c.c_nationkey = n.n_nationkey
        |JOIN jr_region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY r_name""".stripMargin

    // the INNERMOST join of the optimized tree: the first pair the
    // plan actually evaluates
    def innermostJoinCols(plan: LogicalPlan): Set[String] = {
      val joins = plan.collect { case j: Join => j }
      val inner = joins.filter(j => j.children.forall(_.collect {
        case jj: Join => jj }.isEmpty))
      inner.flatMap(_.output.map(_.name)).toSet
    }

    val prev = Seq("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled")
      .map(k => k -> spark.conf.get(k, "false"))
    try {
      spark.conf.set("spark.sql.cbo.enabled", "false")
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
      val syntactic = innermostJoinCols(spark.sql(sql).queryExecution.optimizedPlan)
      assert(syntactic.exists(_.startsWith("o_")),
        s"without CBO the syntactic fact-first order stands: $syntactic")

      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
      val df = spark.sql(sql)
      val reordered = innermostJoinCols(df.queryExecution.optimizedPlan)
      // cost = size of intermediates: starting from the fact table
      // materializes |orders| rows immediately, while any dim-side
      // start stays at |customer| or below — the reorder must kick
      // the fact out of the innermost pair
      assert(!reordered.exists(_.startsWith("o_")),
        s"with stats + CBO the fact must not be in the innermost join: $reordered")
      // and the reordered plan still answers correctly
      val rows = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val expected = Tables(spark, sfDir, "orders")
        .join(Tables(spark, sfDir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .join(Tables(spark, sfDir, "nation"),
          col("c_nationkey") === col("n_nationkey"))
        .join(Tables(spark, sfDir, "region"),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(rows == expected, "reordered plan changed the answer")
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("PK selectivity subtracts deletion-vector-masked rows") {
    import spark.implicits._
    val t = GraftTable.create(spark, tmpDir("cbo_pk_dv"),
      (1L to 100L).map(i => (i, s"v$i")).toDF("id", "v"))
    t.addPrimaryKey("pk_id", Seq("id"))
    assert(Cbo.equalitySelectivity(t, "id").contains(1.0 / 100),
      "clean table: PK selectivity = 1/footer rows")
    // MoR delete masks 40 rows behind a DV without rewriting files —
    // the footer numRecords still says 100; selectivity must not
    t.deleteMergeOnRead(col("id") <= 40L)
    assert(t.toDF.count() == 60L)
    assert(Cbo.equalitySelectivity(t, "id").contains(1.0 / 60),
      "DV-masked rows must be subtracted from the PK row count")
  }
}
