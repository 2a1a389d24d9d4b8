package graft.operators

import graft.{GraftSparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Scale-mechanics behaviors: bucketed co-located joins (no shuffle)
  * and streaming dedup — the patterns that keep 100 TB pipelines
  * shuffle- and duplicate-safe.
  */
class ScaleSpec extends GraftSparkSpec {

  test("bucketed tables join without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    // the in-memory catalog forgets tables across JVMs but their
    // warehouse dirs survive — clear them so saveAsTable can recreate
    Seq("b_orders", "b_lineitem").foreach { n =>
      val p = java.nio.file.Paths.get("spark-warehouse", n)
      if (java.nio.file.Files.exists(p)) {
        val w = java.nio.file.Files.walk(p)
        val all = try {
          import scala.jdk.CollectionConverters._
          w.iterator().asScala.toSeq
        } finally w.close()
        all.reverse.foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
    Tables(spark, sfDir, "orders")
      .write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("b_orders")
    Tables(spark, sfDir, "lineitem")
      .write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("b_lineitem")
    // at real scale neither side broadcasts — force the sort-merge
    // path the bucketing is designed to de-shuffle
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_orders").join(spark.table("b_lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should be shuffle-free, plan:\n${plan.take(2000)}")
      // co-located result matches the plain join
      val plain = Tables(spark, sfDir, "orders").join(
        Tables(spark, sfDir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
      assert(joined.count() == plain.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("streaming exact dedup drops replayed events") {
    val dir = tmpDir("dedup-src")
    val e = Tables(spark, sfDir, "events")
    // simulate an at-least-once source: every event delivered twice
    e.write.mode("overwrite").parquet(dir)
    e.write.mode("append").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val q = spark.readStream.schema(schema).parquet(dir)
      .withWatermark("ts", "1 hour")
      .dropDuplicates("event_id")
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(spark.table("dedup_out").count() == e.count())
    assert(spark.table("dedup_out").select("event_id").distinct().count() == e.count())
  }

  test("plan-shape guards: the scale-critical paths keep their shapes") {
    // token-budget selection: the cumulative sum must stay two-phase —
    // any Window node would mean a whole-corpus single-reducer sort
    val tb = Pipeline.pipeTokenBudget(spark, sfDir)
    assert(!tb.queryExecution.executedPlan.toString.contains("Window"),
      "pipe_token_budget must not reintroduce a global window")
    // PageRank: no cartesian products; its only nested-loop joins are
    // broadcast 1-row aggregates (the node-count constant)
    val pr = Similarity.simPagerank(spark, sfDir)
    assert(!pr.queryExecution.executedPlan.toString.contains("CartesianProduct"),
      "sim_pagerank must never plan a cartesian product")
    // ranked keyword search reads postings only — document text stays
    // untouched even though idf needs corpus-level df
    val rs = TextOps.textSearchRanked(spark, sfDir)
    val rsPlan = rs.queryExecution.executedPlan.toString
    assert(rsPlan.contains("_graft_text") && !rsPlan.contains("documents.parquet"),
      "ranked search must stay on the postings sidecar")
    // BM25 (round 12): the doc-length norms come from the postings
    // sidecar too — the scoring query must carry ZERO corpus-text
    // scans, and no cartesian (its corpus constants are driver-side
    // literals, not a 1-row join)
    val bm = TextOps.textSearchBm25(spark, sfDir)
    val bmPlan = bm.queryExecution.executedPlan.toString
    assert(bmPlan.contains("_graft_text") && !bmPlan.contains("documents.parquet"),
      "BM25 must stay on the postings sidecar (doc lengths included)")
    assert(!bmPlan.contains("CartesianProduct"),
      "BM25 must never plan a cartesian product")
    // global-rank family: ntile / percent_rank / corpus shuffle must
    // keep the two-phase zipWithIndex ordinal — a Window node here
    // means the single-reducer Window.orderBy funnel came back
    for ((name, df) <- Seq(
        "q29_ntile" -> Analytics.q29Ntile(spark, sfDir),
        "q32_percent_rank" -> Analytics.q32PercentRank(spark, sfDir),
        "q64_rfm" -> Analytics.q64Rfm(spark, sfDir),
        "q65_gini" -> Analytics.q65Gini(spark, sfDir),
        "q68_decile_migration" -> Analytics.q68DecileMigration(spark, sfDir),
        "pipe_quality_decile" -> Pipeline.pipeQualityDecile(spark, sfDir),
        "text_zipf" -> TextOps.textZipf(spark, sfDir),
        "pipe_shuffle" -> Pipeline.pipeShuffle(spark, sfDir)))
      assert(!df.queryExecution.executedPlan.toString.contains("Window"),
        s"$name must not reintroduce a partition-less global window")
    // interval sweep: the running concurrency must stay on the
    // two-phase cumsum — a Window node would be the single-reducer
    // global prefix sum coming back
    val cc = Analytics.q61Concurrency(spark, sfDir)
    assert(!cc.queryExecution.executedPlan.toString.contains("Window"),
      "q61_concurrency must not reintroduce a global window")
    assert(cc.count() == 1)
    // constant-selection family: hybrid fusion and DSIR selection must
    // reach their ordinals through a distributed TakeOrdered — a full
    // global Sort feeding the limit would be the single-reducer funnel
    for ((name, df) <- Seq(
        "sim_hybrid_rrf" -> Similarity.simHybridRrf(spark, sfDir),
        "sim_hybrid_bm25" -> Similarity.simHybridBm25(spark, sfDir),
        "pipe_dsir_select" -> Pipeline.pipeDsirSelect(spark, sfDir)))
      assert(df.queryExecution.executedPlan.toString
          .contains("TakeOrderedAndProject"),
        s"$name must reduce to its constant selection via TakeOrdered")
    // decile/percent-rank family: n comes from counting the settled
    // per-customer aggregate — the final plan must carry NO file scan
    // of the SF-scaled orders fact (the checkpoint severed lineage; a
    // second orders.parquet scan here means the distinct().count()
    // re-scan came back)
    for ((name, df) <- Seq(
        "q29_ntile" -> Analytics.q29Ntile(spark, sfDir),
        "q32_percent_rank" -> Analytics.q32PercentRank(spark, sfDir)))
      assert(!df.queryExecution.executedPlan.toString.contains("orders.parquet"),
        s"$name must count the checkpointed aggregate, not re-scan orders")
    // SF-scaled query files must never pin a literal partition count on
    // a repartition: distinct keys scale with data, so a literal caps
    // the stage at N tasks on a 1000-executor cluster. (LakeOps'
    // literal repartitions are excluded by design — they build small
    // multi-file FIXTURE tables where the file count IS the point.)
    for (f <- Seq("operators/Analytics.scala", "operators/Pipeline.scala",
        "operators/TextOps.scala", "operators/Dedup.scala",
        "operators/Similarity.scala")) {
      val src = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"src/main/scala/graft/$f")), "UTF-8")
      assert(!"""repartition(ByRange)?\(\s*\d""".r.findFirstIn(src).isDefined,
        s"$f hardcodes a literal partition count — use session parallelism")
    }
    // round-11 additions: no cartesian anywhere (their only pins are
    // the commented constant-bounded ones), and q69's lag must stay a
    // window over the AGGREGATED nation×year frame — partitioned, so
    // the plan may carry a Window node but never a partition-less one
    // over fact rows (guarded by the no-cartesian + the aggregate
    // sitting below it; a full-frame global window on this shape
    // would show as Window over the raw lineitem scan)
    for ((name, df) <- Seq(
        "q69_yoy_growth" -> Analytics.q69YoyGrowth(spark, sfDir),
        "q70_supplier_hhi" -> Analytics.q70SupplierHhi(spark, sfDir),
        "pipe_cross_dup" -> Pipeline.pipeCrossDup(spark, sfDir),
        "dedup_cluster_sizes" -> Dedup.dedupClusterSizes(spark, sfDir),
        // round-12: q71's windows run over the (flag, quantity) grain
        // (value-bounded), P21's over near-dup-bounded clusters
        "q71_weighted_median" -> Analytics.q71WeightedMedian(spark, sfDir),
        "pipe_dedup_savings" -> Pipeline.pipeDedupSavings(spark, sfDir)))
      assert(!df.queryExecution.executedPlan.toString.contains("CartesianProduct"),
        s"$name must never plan a cartesian product")
    // round-13 spill-aware rewrites: the pair/triple aggregates must
    // keep their cluster-before-aggregate shape — the final aggregate
    // exchanges on the PAIR key, never running its heavy phase over
    // the order-partitioned join output (the partial hash map that
    // spilled at sf10). hashpartitioning on (part_a, part_b) in the
    // plan is the shape's signature; losing it means the plain
    // groupBy came back.
    for ((name, df, key) <- Seq(
        ("q59_basket", Analytics.q59Basket(spark, sfDir), "part_a"),
        ("q60_basket_lift", Analytics.q60BasketLift(spark, sfDir), "part_a"),
        ("q53_supplier_variety", Analytics.q53SupplierVariety(spark, sfDir),
          "l_suppkey"))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("hashpartitioning") && plan.contains(key),
        s"$name must cluster on its aggregation key before aggregating")
      assert(!plan.contains("CartesianProduct"),
        s"$name must never plan a cartesian product")
    }
    // round-13 additions: fertility is one map-side-combined aggregate
    // (no window, no join); the ablation matrix is ONE scan + a 1-row
    // aggregate unpivoted — neither may plan a cartesian or a window
    for ((name, df) <- Seq(
        "text_fertility" -> TextOps.textFertility(spark, sfDir),
        "pipe_filter_ablation" -> Pipeline.pipeFilterAblation(spark, sfDir))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Window") && !plan.contains("CartesianProduct"),
        s"$name must stay a pure aggregate shape")
    }
    // the ablation matrix reads documents exactly ONCE (shared
    // GopherConditions — one scan computes all five sub-filters)
    val abl = Pipeline.pipeFilterAblation(spark, sfDir)
    val nDocScans = "documents\\.parquet".r
      .findAllIn(abl.queryExecution.executedPlan.toString).length
    assert(nDocScans <= 1,
      s"pipe_filter_ablation must scan documents once, found $nDocScans")
    // de-hinted TPC-H dims: no forced broadcast on SF-scaled sides —
    // the plan must not carry a user hint on customer/part/supplier
    // (AQE may still choose broadcast at runtime from actual sizes)
    for ((name, df) <- Seq(
        "q4_top_customers" -> Analytics.q4TopCustomers(spark, sfDir),
        "q5_region_volume" -> Analytics.q5RegionVolume(spark, sfDir),
        "q52_excess_suppliers" -> Analytics.q52ExcessSuppliers(spark, sfDir))) {
      val hinted = df.queryExecution.analyzed.collect {
        case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
      }
      val files = hinted.flatMap(_.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          lr.relation match {
            case f: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              f.location.inputFiles.toSeq
            case _ => Seq.empty
          }
      }.flatten)
      assert(!files.exists(p => p.contains("customer.parquet") ||
          p.contains("part.parquet") || p.contains("supplier.parquet")),
        s"$name must not force-broadcast an SF-scaled table")
    }
    // round-13 second batch: the cohort matrix and funnel collapse to
    // their user-grain aggregates with NO window and NO cartesian (the
    // cohort cell count is a plain COUNT — a count-distinct buffer or
    // a window here means the one-cohort-per-user argument broke)
    for ((name, df) <- Seq(
        "q72_cohort_retention" -> Analytics.q72CohortRetention(spark, sfDir),
        "q73_funnel" -> Analytics.q73Funnel(spark, sfDir))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Window") && !plan.contains("CartesianProduct"),
        s"$name must stay an aggregate-join shape")
    }
    // collocation report: the top-100 must reduce via a distributed
    // TakeOrdered (its only window runs AFTER the limit, over ≤100
    // rows), and the 1-row N total is a broadcast pin, never a
    // cartesian
    val coll = TextOps.textCollocations(spark, sfDir)
    val collPlan = coll.queryExecution.executedPlan.toString
    assert(collPlan.contains("TakeOrderedAndProject"),
      "text_collocations must select its top-100 via TakeOrdered")
    assert(!collPlan.contains("CartesianProduct"),
      "text_collocations must never plan a cartesian product")
  }
}
