package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core analytics query surface (SURVEY §2.2). Declarative
  * DataFrame plans only — Catalyst handles pushdown/pruning, AQE picks
  * shuffle/broadcast strategy. Doubles are rounded at the output edge
  * so results hash-match the DuckDB oracle.
  *
  * The selective-filter and grouped-agg shapes mirror the reference's
  * baseline measurements (reference docs/02-lab-optimizations.md:93-107
  * and :745-752).
  */
object Analytics {

  /** TPC-H Q1-style pricing summary: grouped multi-aggregate. */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    li.groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** Selective filter + count — the reference's baseline scan
    * (country/category filter ≈ returnflag/shipdate here). The
    * predicate reaches the parquet scan as PushedFilters.
    */
  def q2SelectiveFilter(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    li.filter(col("l_returnflag") === "R" &&
        col("l_shipdate") >= lit("1997-01-01").cast("timestamp"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Join + aggregate: revenue by order priority. */
  def q3JoinRevenue(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
    val li = Tables(spark, dir, "lineitem")
    o.join(li, o("o_orderkey") === li("l_orderkey"))
      .groupBy("o_orderpriority")
      .agg(
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("o_orderpriority")
  }

  /** Top-10 customers by revenue (join + agg + deterministic top-k).
    * Customer is SF-scaled (SF×150k — ~10⁹ rows at the 100 TB design
    * point), so it carries NO broadcast hint: a forced hint overrides
    * Spark's size check and OOMs executors exactly when data grows.
    * AQE still picks a broadcast join at runtime while the side is
    * genuinely small. Only constant-bounded sides (nation/region,
    * 1-row aggregates) are pinned anywhere in this file.
    */
  def q4TopCustomers(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "customer")
    val o = Tables(spark, dir, "orders")
    val li = Tables(spark, dir, "lineitem")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .groupBy("c_custkey", "c_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(10)
  }

  /** 5-way dim join: revenue per region/nation. Nation (25 rows) and
    * region (5) are constant-bounded — pinned; customer is SF-scaled
    * and stays unhinted (AQE broadcasts while genuinely small).
    */
  def q5RegionVolume(spark: SparkSession, dir: String): DataFrame = {
    val r = Tables(spark, dir, "region")
    val n = Tables(spark, dir, "nation")
    val c = Tables(spark, dir, "customer")
    val o = Tables(spark, dir, "orders")
    val li = Tables(spark, dir, "lineitem")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
      .orderBy("r_name", "n_name")
  }

  /** TPC-H Q6-style range-filter revenue forecast. */
  def q6ForecastRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    li.filter(
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"))
  }

  /** Window: top-3 parts by retail price per brand (row_number). */
  def q7TopnPerBrand(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables(spark, dir, "part")
    val w = Window.partitionBy("p_brand")
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
    p.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("p_brand"), col("p_partkey"),
        round(col("p_retailprice"), 2).as("p_retailprice"),
        col("rn").cast("long").as("rn"))
      .orderBy("p_brand", "rn")
  }

  /** Window: running total of order value per customer. */
  def q8RunningSum(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
    val w = Window.partitionBy("o_custkey")
      .orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    o.select(col("o_custkey"), col("o_orderkey"),
        round(sum("o_totalprice").over(w), 2).as("running_total"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Anti join: customers with no orders (NOT EXISTS). */
  def q9AntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "customer")
    val o = Tables(spark, dir, "orders")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** Conditional aggregation (CASE WHEN inside agg). */
  def q10ConditionalAgg(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    li.groupBy("l_linestatus")
      .agg(
        round(sum(when(col("l_returnflag") === "R", col("l_extendedprice")).otherwise(0.0)), 2)
          .as("returned_value"),
        count(when(col("l_discount") > 0.05, lit(1))).as("high_disc_items"))
      .orderBy("l_linestatus")
  }

  /** Exact distinct counts (shuffle-dedup under the hood). */
  def q11DistinctParts(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    li.agg(
      countDistinct("l_partkey").as("n_parts"),
      countDistinct("l_suppkey").as("n_supps"),
      countDistinct("l_orderkey").as("n_orders"))
  }

  /** Event-time tumbling-window aggregation (batch form of the
    * Structured Streaming windowed agg — SURVEY §2.7).
    */
  def q12EventWindows(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "events")
    e.groupBy(date_trunc("hour", col("ts")).as("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .orderBy("window_start", "event_type")
  }

  /** Time-series gap fill: the dense (event_type × hour) grid over
    * the corpus span with ZERO-filled empty buckets — what every
    * monitoring/forecast consumer needs before resampling (a missing
    * bucket and a zero bucket are different facts).
    *
    * Scale shape: the grid derives from a 1-row [min,max] aggregate
    * crossed (broadcast) with the small distinct-type set, `sequence`
    * explodes hours grid-side — |types|·|hours| rows, independent of
    * event count — and the hourly counts aggregate map-side before
    * their one shuffle; the grid join is broadcast (grid ≪ counts).
    */
  def q55GapFill(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "events")
    val span = e.agg(
      date_trunc("hour", min(col("ts"))).as("lo"),
      date_trunc("hour", max(col("ts"))).as("hi"))
    val types = e.select(col("event_type")).distinct()
    val grid = types.crossJoin(broadcast(span))
      .select(col("event_type"),
        explode(sequence(col("lo"), col("hi"),
          expr("INTERVAL 1 HOUR"))).as("hour_ts"))
    val counts = e.groupBy(col("event_type"),
        date_trunc("hour", col("ts")).as("hour_ts"))
      .agg(count(lit(1)).as("cnt"))
    // RIGHT outer with the hint on the non-preserved LEFT: Spark can
    // only build the non-preserved side, so hinting the preserved grid
    // of a left join would be silently ignored. `counts` is the
    // aggregated side — at most |types|·|hours| rows, the same bound
    // as the grid — so it is the safe build side at any event count.
    broadcast(counts).join(grid, Seq("event_type", "hour_ts"), "right")
      .select(col("event_type"), col("hour_ts"),
        coalesce(col("cnt"), lit(0L)).as("n"))
      .orderBy("event_type", "hour_ts")
  }

  /** Equi-width value histogram over order totals: 20 buckets between
    * the observed [min,max] — the distribution-profiling primitive
    * behind data-quality dashboards and skew diagnosis. Bucket edges
    * come from ONE 1-row min/max aggregate (broadcast), bucketing is
    * integer cents arithmetic (identical in both engines), and the
    * bucket aggregate map-side-combines into ≤21 rows — nothing
    * driver-side or shuffle-wide scales with the data.
    */
  def q56Histogram(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
      .select(round(col("o_totalprice") * 100).cast("long").as("cents"))
    val span = o.agg(min("cents").as("lo"), max("cents").as("hi"))
    o.crossJoin(broadcast(span))
      .select(least(expr("((cents - lo) * 20) div (hi - lo + 1)"), lit(19L))
          .cast("long").as("bucket"),
        col("cents"), col("lo"), col("hi"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), min("cents").as("lo_cents"),
        max("cents").as("hi_cents"))
      .orderBy("bucket")
  }

  /** Per-group correlation + least-squares fit (price ~ quantity by
    * return flag) — the relationship-profiling aggregate behind
    * anomaly screens. corr/regr_* are algebraic one-pass aggregates
    * (sums of x, y, xy, x², y²): map-side combined, 3 output rows,
    * no second scan and nothing value-ordered.
    */
  def q57Regression(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("r"),
        round(regr_slope(col("l_extendedprice"), col("l_quantity")), 2).as("slope"),
        round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 2).as("intercept"))
      .orderBy("l_returnflag")
  }

  /** Exact per-group mode with a deterministic tie-break (most
    * frequent quantity per return flag; ties → smallest value).
    * The window ranks DISTINCT (group, value) pairs — cardinality
    * bounded by distinct values, never raw rows — after a map-side
    * combined count; DuckDB's mode() has an unspecified tie-break, so
    * both engines spell the rank explicitly.
    */
  def q58Mode(spark: SparkSession, dir: String): DataFrame = {
    val counted = Tables(spark, dir, "lineitem")
      .select(col("l_returnflag"), qtyC.as("qty_c"))
      .groupBy("l_returnflag", "qty_c").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("l_returnflag")
      .orderBy(col("cnt").desc, col("qty_c"))
    counted.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("l_returnflag"), col("qty_c").as("mode_qty_c"), col("cnt"))
      .orderBy("l_returnflag")
  }

  /** Market-basket co-occurrence: top part pairs ordered together.
    * The self-join runs WITHIN order keys (hash-partitioned equi-join
    * on l_orderkey), so pair fan-out is Σ items² per order — bounded
    * by basket size, never corpus²; pair counts map-side combine and
    * only the global top-20 (total-ordered tie-break) reach the sort.
    */
  def q59Basket(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val pairs = li.select(col("l_orderkey"), col("l_partkey").as("part_a"))
      .join(li.select(col("l_orderkey"), col("l_partkey").as("part_b")),
        "l_orderkey")
      .filter(col("part_a") < col("part_b"))
    // Spill-aware pair count: cluster the pair stream on its
    // aggregation key BEFORE the aggregate. A plain groupBy would run
    // its partial aggregate over the ORDER-partitioned join output,
    // where almost every pair is distinct within a task — the partial
    // hash map grows to (total pairs / tasks) entries of mostly
    // count=1, the fixed-memory spill regime the r12 sf10 pass
    // measured (~10–13× time for 10× data). After the explicit
    // repartition both aggregate phases see only their own hash slice
    // of the pair domain, and AQE's size-targeted coalescing bounds
    // that slice in BYTES — per-task state stays flat as data scales
    // out, which is exactly the property a 1000-executor run needs.
    // (Raw 24-byte pair rows shuffle in place of partial counts; on a
    // mostly-unique pair domain that is the same volume.)
    pairs.repartition(col("part_a"), col("part_b"))
      .groupBy("part_a", "part_b").agg(count(lit(1)).as("n_orders"))
      .orderBy(col("n_orders").desc, col("part_a"), col("part_b"))
      .limit(20)
  }

  /** Association metrics over the basket pairs: support counts stay
    * exact integers; lift = n_ab·N / (n_a·n_b) rounds once at the
    * edge. Item counts join the pair table on its own keys (two
    * broadcastable aggregates); the 1-row order total cross-joins.
    */
  def q60BasketLift(spark: SparkSession, dir: String): DataFrame = {
    // the deduped (order, part) grain feeds four consumers (order
    // count, item counts, both self-join sides) and is deliberately
    // NOT localCheckpoint'ed: the r12 sf10 scale pass A/B'd both —
    // recomputing the distinct keeps every pass in spillable shuffle
    // machinery, while materializing the grain pins it in executor
    // storage and OOMs exactly when the pair hash-aggregate needs the
    // memory most. The measured ~10–13× step for 10× data is the
    // fixed-memory single-box spill regime of that pair aggregate
    // (per-replica-disjoint part pairs ⇒ group count scales linearly;
    // a real cluster's memory scales with executors). SURVEY §6.
    val li = Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val nOrders = li.select("l_orderkey").distinct()
      .agg(count(lit(1)).as("n_total"))
    val itemN = li.groupBy("l_partkey").agg(count(lit(1)).as("n_item"))
    val pairs = li.select(col("l_orderkey"), col("l_partkey").as("part_a"))
      .join(li.select(col("l_orderkey"), col("l_partkey").as("part_b")),
        "l_orderkey")
      .filter(col("part_a") < col("part_b"))
      // cluster on the pair before aggregating — bounds per-task hash
      // state to the size-targeted shuffle slice (see q59Basket)
      .repartition(col("part_a"), col("part_b"))
      .groupBy("part_a", "part_b").agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= 3)
    pairs
      .join(itemN.select(col("l_partkey").as("part_a"), col("n_item").as("n_a")), "part_a")
      .join(itemN.select(col("l_partkey").as("part_b"), col("n_item").as("n_b")), "part_b")
      .crossJoin(broadcast(nOrders))
      .select(col("part_a"), col("part_b"), col("n_ab"), col("n_a"), col("n_b"),
        round(col("n_ab") * col("n_total") /
          (col("n_a") * col("n_b")), 4).as("lift"))
      .orderBy(col("n_ab").desc, col("part_a"), col("part_b"))
      .limit(20)
  }

  /** Ordered funnel (view → click → purchase): per-user first-event
    * times chained by strict ts order — each stage only counts users
    * whose event happened AFTER their previous stage's. Three
    * aggregates + two joins, all shuffling on user_id; no window over
    * raw events, so per-reducer state is one row per user per stage.
    */
  def q37Funnel(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "events")
    val v = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("t_view"))
    val c = e.filter(col("event_type") === "click").join(v, "user_id")
      .filter(col("ts") > col("t_view"))
      .groupBy("user_id").agg(min("ts").as("t_click"))
    val p = e.filter(col("event_type") === "purchase").join(c, "user_id")
      .filter(col("ts") > col("t_click"))
      .groupBy("user_id").agg(min("ts").as("t_purchase"))
    v.agg(count(lit(1)).as("n_users")).select(lit("1_view").as("stage"), col("n_users"))
      .unionByName(c.agg(count(lit(1)).as("n_users"))
        .select(lit("2_click").as("stage"), col("n_users")))
      .unionByName(p.agg(count(lit(1)).as("n_users"))
        .select(lit("3_purchase").as("stage"), col("n_users")))
      .orderBy("stage")
  }

  /** Cohort retention: users cohorted by first-signup day, counted as
    * retained on day offsets 1 and 7 when ANY later event lands on
    * cohort_day + offset. Two shuffles on user_id, then a small
    * (cohort, offset) rollup.
    */
  def q38Retention(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "events")
    val cohort = e.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min(to_date(col("ts"))).as("cohort_day"))
    e.join(cohort, "user_id")
      .withColumn("day_offset",
        datediff(to_date(col("ts")), col("cohort_day")).cast("long"))
      .filter(col("day_offset").isin(1L, 7L))
      .groupBy("cohort_day", "day_offset")
      .agg(countDistinct("user_id").as("n_users"))
      .orderBy("cohort_day", "day_offset")
  }

  /** Skew-resistant two-phase aggregation: explicit salting splits a
    * hot key across `Salts` reducers (partial agg), then a cheap
    * final agg over `Salts` rows/key merges. The per-key result is
    * identical to a direct GROUP BY — which is exactly what the
    * oracle checks. At 100 TB this is the pattern for power-law keys
    * where AQE skew handling alone isn't enough.
    */
  def q15SkewSalted(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "events")
    val Salts = 8
    val partial = e
      .withColumn("__salt", pmod(xxhash64(col("event_id")), lit(Salts.toLong)))
      .groupBy("user_id", "__salt")
      .agg(count(lit(1)).as("pn"), sum("value").as("pv"))
    partial.groupBy("user_id")
      .agg(sum("pn").as("n"), round(sum("pv"), 2).as("sum_value"))
      .orderBy("user_id")
  }

  /** ROLLUP hierarchy totals (OLAP subtotal/grand-total shape). */
  def q16Rollup(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    li.rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("sum_qty"))
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
  }

  /** Exact interpolated percentiles (matches quantile_cont). One
    * array-argument percentile call: the column is buffered once for
    * all four quantiles instead of once per quantile.
    */
  def q17ExactPercentile(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    // distributed order statistics: range-sort the column, index it,
    // select the ≤8 bracketing ranks, interpolate (same lo+frac·(hi−lo)
    // rule as percentile/quantile_cont). The `percentile` aggregate
    // buffers every value through one final reducer — fine at 600k
    // rows, dead at a 100 TB column; here the sort is cluster-wide and
    // only 8 doubles ever reach the driver.
    val qs = Seq(0.25, 0.5, 0.75, 0.95)
    val vals = li.select(col("l_extendedprice").cast("double").as("v"))
      .filter(col("v").isNotNull)
    val n = vals.count()
    val pos = qs.map(q => (n - 1).toDouble * q)
    val ranks = pos.flatMap(p => Seq(p.floor.toLong, p.ceil.toLong)).toSet
    val picked = vals.sort("v").rdd.map(_.getDouble(0)).zipWithIndex()
      .filter { case (_, i) => ranks.contains(i) }
      .map(_.swap).collectAsMap()
    val ps = pos.map { p =>
      val lo = picked(p.floor.toLong)
      lo + (picked(p.ceil.toLong) - lo) * (p - p.floor)
    }
    spark.range(1).select(
      round(lit(ps(0)), 2).as("p25"),
      round(lit(ps(1)), 2).as("p50"),
      round(lit(ps(2)), 2).as("p75"),
      round(lit(ps(3)), 2).as("p95"))
  }

  /** Sessionized gaps: days between consecutive orders per customer
    * (lag window + date arithmetic).
    */
  def q18OrderGaps(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    o.select(col("o_custkey"), col("o_orderkey"),
        datediff(col("o_orderdate"), lag("o_orderdate", 1).over(w))
          .cast("long").as("gap_days"))
      .filter(col("gap_days").isNotNull)
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Fuzzy string matching: edit distance across two dimensions. */
  def q19Levenshtein(spark: SparkSession, dir: String): DataFrame = {
    val n = Tables(spark, dir, "nation")
    val r = Tables(spark, dir, "region")
    n.crossJoin(broadcast(r))
      .select(col("n_name"), col("r_name"),
        levenshtein(col("n_name"), col("r_name")).cast("long").as("dist"))
      .orderBy("n_name", "r_name")
  }

  /** Sketches under a deterministic error-bound contract. The sketch
    * values themselves are engine-specific (HLL++ register layout, GK
    * compaction order), so the emitted row carries the EXACT distinct
    * count plus booleans asserting each sketch landed inside its
    * documented bound: approx_count_distinct's default rsd is 5%
    * (checked at 3σ = 15%), percentile_approx at accuracy 1000 has
    * rank error 1e-3 (checked at ±1% rank — 10× the guarantee, still
    * a real assertion; accuracy 10000 cost ~8 s of GK compression at
    * sf0.1 for precision the assertion can't see). DuckDB replays the
    * exact side and emits literal TRUEs, so a sketch drifting out of
    * bounds turns the row red. The percentile check verifies RANK, not
    * value: the sketch returns an actual data value occupying rank
    * positions (#{v < x}, #{v ≤ x}] — one conditional-count aggregate
    * (O(n) scan, map-side combine, no sort) asserts that interval
    * intersects the ±1%-rank window, so no order statistics and no
    * single-reducer `percentile` buffer anywhere.
    */
  def q13Approx(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val price = col("l_extendedprice").cast("double")
    // exact distinct runs as its OWN aggregation: mixing distinct and
    // non-distinct aggregates in one agg plans an Expand that doubles
    // every scanned row through the sketch updates
    val a = li.agg(
      approx_count_distinct("l_partkey").as("ap"),
      percentile_approx(price, lit(0.5), lit(1000)).as("ap50"),
      percentile_approx(price, lit(0.95), lit(1000)).as("ap95"),
      count(price).as("n")).head()
    val (approxParts, ap50, ap95, n) =
      (a.getLong(0), a.getDouble(1), a.getDouble(2), a.getLong(3))
    val exactParts = li.select("l_partkey").distinct().count()
    val b = li.agg(
      count(when(price < ap50, 1)).as("lt50"),
      count(when(price <= ap50, 1)).as("le50"),
      count(when(price < ap95, 1)).as("lt95"),
      count(when(price <= ap95, 1)).as("le95")).head()
    def rankWithin(lt: Long, le: Long, q: Double): Boolean =
      lt + 1 <= (q + 0.01) * n && le >= (q - 0.01) * n
    spark.range(1).select(
      lit(exactParts).as("exact_parts"),
      lit(math.abs(approxParts - exactParts) <= 0.15 * exactParts).as("parts_within_bound"),
      lit(rankWithin(b.getLong(0), b.getLong(1), 0.5)).as("p50_within_bound"),
      lit(rankWithin(b.getLong(2), b.getLong(3), 0.95)).as("p95_within_bound"))
  }

  /** CUBE: all grouping-set combinations incl. grand total. */
  def q20Cube(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    li.cube("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), round(sum("l_extendedprice"), 2).as("sum_price"))
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
  }

  /** Correlated subquery shape: orders 1.5× above their customer's
    * average, decorrelated into an agg + equi-join (what Catalyst's
    * RewriteCorrelatedScalarSubquery produces anyway — written
    * directly so the shuffle shape is explicit).
    */
  def q21CorrelatedSubquery(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
    val custAvg = o.groupBy("o_custkey").agg(avg("o_totalprice").as("cust_avg"))
    o.join(custAvg, "o_custkey")
      .filter(col("o_totalprice") > col("cust_avg") * 1.5)
      .select(col("o_orderkey"), col("o_custkey"),
        round(col("o_totalprice"), 2).as("o_totalprice"))
      .orderBy("o_orderkey")
  }

  /** Set operations: customers ordering in both 1996 and 1997
    * (INTERSECT) vs only in 1996 (EXCEPT), tagged in one output.
    */
  def q22SetOps(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
    def custsIn(y: Int): DataFrame =
      o.filter(year(col("o_orderdate")) === y).select("o_custkey").distinct()
    custsIn(1996).intersect(custsIn(1997)).withColumn("tag", lit("both"))
      .unionByName(
        custsIn(1996).except(custsIn(1997)).withColumn("tag", lit("only_1996")))
      .orderBy("tag", "o_custkey")
  }

  /** PIVOT: quantity by line status, one column per return flag.
    * Values are enumerated so Spark skips the distinct-value pre-scan.
    */
  def q23Pivot(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    li.groupBy("l_linestatus")
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(round(sum("l_quantity"), 2))
      .orderBy("l_linestatus")
  }

  /** Semi-structured extraction: pull `k` out of the JSON props
    * column and aggregate it per event type.
    */
  def q24JsonExtract(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "events")
    e.select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), round(avg("k"), 4).as("avg_k"), max("k").as("max_k"))
      .orderBy("event_type")
  }

  /** Batch sessionization: 30-minute-gap sessions per user (lag +
    * running sum of session-break flags), the batch twin of the
    * streaming flatMapGroupsWithState sessionizer (SURVEY §2.7 ST2).
    */
  def q25Sessionize(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "events")
    val gapUs = 30L * 60 * 1000000
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    e.select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"))
      .withColumn("new_sess",
        when(lag("ts_us", 1).over(w).isNull ||
          col("ts_us") - lag("ts_us", 1).over(w) > gapUs, 1L).otherwise(0L))
      .withColumn("session_seq", sum("new_sess").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_seq")
      .agg(count(lit(1)).as("n_events"), min("ts_us").as("session_start_us"))
      .orderBy("user_id", "session_seq")
  }

  /** Salted skew join: the fact side (events, user_id is zipfian)
    * carries a random-ish-but-deterministic salt; the dim side (per-
    * user profile, too big to broadcast in the 100 TB deployment) is
    * exploded into one replica per salt value, so a hot key's rows
    * spread across `Salts` reducers instead of one straggler task.
    * The join result is salt-independent — oracle-checked against the
    * plain join. (AQE skew-split is the adaptive alternative; salting
    * is the deterministic one that also works mid-pipeline.)
    */
  def q26SkewJoin(spark: SparkSession, dir: String): DataFrame = {
    val Salts = 8
    val e = Tables(spark, dir, "events")
    val profile = e.groupBy("user_id")
      .agg(count(lit(1)).as("n_user_events"))
    val saltedFacts = e
      .withColumn("__salt", pmod(xxhash64(col("event_id")), lit(Salts.toLong)))
    val saltedDim = profile
      .withColumn("__salt", explode(array((0 until Salts).map(s => lit(s.toLong)): _*)))
    saltedFacts.join(saltedDim, Seq("user_id", "__salt"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        round(sum(col("value") / col("n_user_events")), 2).as("weighted_value"))
      .orderBy("event_type")
  }

  /** Explicit GROUPING SETS with grouping_id — finer than ROLLUP/CUBE:
    * exactly the (flag,status), (flag), and () aggregation levels, with
    * the grouping id disambiguating real nulls from subtotal rows.
    */
  def q31GroupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir, "lineitem").createOrReplaceTempView("li_gs")
    spark.sql(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |  COUNT(*) AS n, ROUND(SUM(l_quantity), 2) AS sum_qty
        |FROM li_gs
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin)
  }

  /** NTILE decile segmentation: customers bucketed into 10 spend
    * deciles, per-decile totals — the quantile-segmentation shape of
    * cohort/quality analyses.
    *
    * NOT `ntile(10).over(Window.orderBy(...))`: a partition-less
    * window funnels the whole per-customer aggregate (SF×150k rows —
    * ~10⁹ at the 100 TB design point) through ONE reducer. Instead
    * the two-phase global ordinal ([[Ranks.withGlobalOrdinal]]) ranks
    * distributed, and NTILE is arithmetic over (ordinal, n): with
    * q = n/10 and r = n%10, the first r buckets hold q+1 rows — the
    * exact SQL NTILE contract, so the hashes match the window form.
    * The only driver traffic is ONE long (the row count).
    */
  def q29Ntile(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
    // spend has exactly one row per customer by construction, so the
    // decile denominator is its row count — localCheckpoint settles the
    // aggregate once so the count and the rank pass share ONE orders scan
    // (never a second distinct() over the SF-scaled fact).
    val spend = o.groupBy("o_custkey")
      .agg(round(sum("o_totalprice"), 2).as("spend"))
      .localCheckpoint()
    val n = spend.count()
    val ranked = Ranks.withGlobalOrdinal(spend, "__ord",
      col("spend").desc, col("o_custkey"))
    ranked.withColumn("decile", Ranks.ntileBucket(col("__ord"), n, 10L))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_customers"), round(sum("spend"), 2).as("decile_spend"))
      .orderBy("decile")
  }

  /** Deterministic string aggregation: per-region sorted nation list
    * (array_sort + concat_ws ≡ DuckDB string_agg ORDER BY).
    */
  def q30StringAgg(spark: SparkSession, dir: String): DataFrame = {
    val n = Tables(spark, dir, "nation")
    val r = Tables(spark, dir, "region")
    n.join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(concat_ws(",", array_sort(collect_list(col("n_name")))).as("nations"),
        count(lit(1)).as("n_nations"))
      .orderBy("r_name")
  }

  /** RANGE-frame window: per-customer trailing-90-day average order
    * value. RANGE frames (value-based, tie-inclusive) complement the
    * ROWS frames of q8/q25 — the moving-aggregate shape time-series
    * feature pipelines use.
    */
  def q27RangeFrame(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
    val w = Window.partitionBy("o_custkey").orderBy("order_day")
      .rangeBetween(-90, Window.currentRow)
    o.select(col("o_custkey"), col("o_orderkey"),
        datediff(col("o_orderdate").cast("date"), lit("1970-01-01").cast("date"))
          .cast("long").as("order_day"),
        // exact integer cents: the windowed sum is order-independent,
        // so the oracle can't drift by float summation order
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .withColumn("avg_90d_cents",
        round(sum("cents").over(w) / count(lit(1)).over(w)).cast("long"))
      .select("o_custkey", "o_orderkey", "order_day", "avg_90d_cents")
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Relative-standing windows: percent_rank and cume_dist over a
    * deterministic total order (spend desc, key) — the normalized-rank
    * complement to q29's ntile bucketing.
    *
    * NOT `percent_rank().over(Window.orderBy(...))`: the partition-
    * less window is a single-reducer funnel over the SF-scaled
    * customer aggregate. The two-phase ordinal
    * ([[Ranks.withGlobalOrdinal]]) ranks distributed; because
    * (spend desc, o_custkey) is tie-free, rank ≡ ordinal, so
    * percent_rank = (i−1)/(n−1) and cume_dist = i/n exactly — both
    * engines divide the same two integers, bit-identical before the
    * 6-dp round. Driver traffic: ONE long.
    */
  def q32PercentRank(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
    // one row per customer by construction → n is the aggregate's row
    // count; localCheckpoint so count + rank share one orders scan.
    val spend = o.groupBy("o_custkey")
      .agg(round(sum("o_totalprice"), 2).as("spend"))
      .localCheckpoint()
    val n = spend.count()
    val ranked = Ranks.withGlobalOrdinal(spend, "__ord",
      col("spend").desc, col("o_custkey"))
    val prDenom = math.max(n - 1, 1L) // n=1 → percent_rank is 0 either way
    ranked
      .withColumn("pr", round((col("__ord") - 1).cast("double") / prDenom, 6))
      .withColumn("cd", round(col("__ord").cast("double") / n, 6))
      .select("o_custkey", "spend", "pr", "cd")
      .orderBy("o_custkey")
  }

  /** Exact per-group median and IQR (grouped continuous quantiles —
    * q17's distributed sort-select generalized per group). Computed
    * over exact integer cents: an even-count median interpolates to a
    * half-cent midpoint, which is exactly representable in cents but a
    * round-half coin-flip in dollars.
    *
    * The obvious `percentile(cents, array(...))` aggregate buffers
    * EVERY group value inside one ObjectHashAggregate task — with 3
    * return flags at 100× that is the whole column in one executor.
    * (A value-histogram variant is also out: cents are near-unique, so
    * the histogram ≈ the data — the q17 lesson.) Instead: one
    * cluster-wide range sort on (group, cents), per-group rank offsets
    * from a |groups|-row count aggregate, and only the ≤6 bracketing
    * values per group ever reach the driver. Interpolation over exact
    * integers at frac ∈ {0,.25,.5,.75} is exact in double, so the
    * result is bit-identical to the percentile() aggregate.
    */
  def q33GroupMedian(spark: SparkSession, dir: String): DataFrame = {
    val qs = Seq(0.25, 0.5, 0.75)
    val vals = Tables(spark, dir, "lineitem")
      .withColumn("cents", round(col("l_extendedprice") * 100).cast("long"))
      .select(col("l_returnflag").as("g"), col("cents"))
      .filter(col("cents").isNotNull)
    // |groups| rows (3 here); sorted with the same binary-ASCII order
    // the range sort below uses, so cumulative offsets line up
    val counts = vals.groupBy("g").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    val offsets = counts.map(_._1)
      .zip(counts.scanLeft(0L)(_ + _._2).init).toMap
    val needed: Set[Long] = counts.flatMap { case (g, n) =>
      qs.flatMap { q =>
        val p = (n - 1).toDouble * q
        Seq(offsets(g) + p.floor.toLong, offsets(g) + p.ceil.toLong)
      }
    }.toSet
    // global range-partitioned sort; zipWithIndex gives the ordinal in
    // (g, cents) order, and equal values straddling a partition edge
    // can't change which VALUE sits at a rank
    val picked = vals.sort("g", "cents").rdd
      .map(_.getLong(1)).zipWithIndex()
      .filter { case (_, i) => needed.contains(i) }
      .map(_.swap).collectAsMap()
    val rows = counts.map { case (g, n) =>
      val ps = qs.map { q =>
        val p = (n - 1).toDouble * q
        val lo = picked(offsets(g) + p.floor.toLong).toDouble
        val hi = picked(offsets(g) + p.ceil.toLong).toDouble
        lo + (hi - lo) * (p - p.floor)
      }
      (g, ps(0), ps(1), ps(2))
    }.toIndexedSeq
    import vals.sparkSession.implicits._
    rows.toDF("l_returnflag", "q1_raw", "m_raw", "q3_raw")
      .select(col("l_returnflag"),
        round(col("q1_raw"), 1).as("q1_cents"),
        round(col("m_raw"), 1).as("median_cents"),
        round(col("q3_raw"), 1).as("q3_cents"))
      .orderBy("l_returnflag")
  }

  /** TPC-H Q2 shape (min-cost supplier): per-group aggregate, group
    * MIN over it, equality join back to recover the argmin rows —
    * Catalyst's decorrelation of `cost = (SELECT MIN(cost) ... WHERE
    * same part)`. Both aggregates shuffle on l_partkey, so AQE plans
    * the join-back without a third shuffle; the dim joins broadcast.
    */
  def q34MinCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val s = Tables(spark, dir, "supplier")
    val n = Tables(spark, dir, "nation")
    // cost in EXACT integer cents (price is exact cents, qty integral):
    // long sums are order-independent, so the min/argmin comparison
    // can never flip on a last-ulp summation difference the way
    // ROUND(AVG(double),2) can between engines
    val ps = li.groupBy("l_partkey", "l_suppkey")
      .agg(round(
        sum(round(col("l_extendedprice") * 100).cast("long")) /
          (sum(col("l_quantity").cast("long")) * 100.0), 2).as("cost"))
    // fresh aliases break the ps→minc self-join lineage ambiguity
    val minc = ps.select(col("l_partkey").as("mk"), col("cost"))
      .groupBy("mk").agg(min("cost").as("min_cost"))
    // supplier is SF-scaled → unhinted (AQE broadcasts while small);
    // nation is constant-bounded (25) → pinned
    ps.join(minc, ps("l_partkey") === minc("mk") &&
        ps("cost") === minc("min_cost"))
      .join(s, ps("l_suppkey") === s("s_suppkey"))
      .join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
      .filter(ps("l_partkey") < 200)
      .select(ps("l_partkey"), col("s_name"), col("n_name"), col("min_cost"))
      .orderBy("l_partkey", "s_name")
  }

  /** TPC-H Q21 flavor: orders served by exactly one supplier, credited
    * to that supplier. ONE lineitem exchange: the NOT-EXISTS ("no
    * second supplier") decorrelates to a per-order distinct supplier
    * SET (collect_set aggregates map-side, so the shuffle carries
    * partially-built sets, not raw line items), solo orders are the
    * size-1 sets — no second distinct shuffle, no window re-partition
    * (the earlier distinct+window shape still re-shuffled from the
    * (orderkey, suppkey) hash to orderkey alone).
    */
  def q35SoloSupplierOrders(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val s = Tables(spark, dir, "supplier")
    li.select("l_orderkey", "l_suppkey")
      .groupBy("l_orderkey").agg(collect_set("l_suppkey").as("supps"))
      .filter(size(col("supps")) === 1)
      .select(col("supps")(0).as("l_suppkey"))
      .groupBy("l_suppkey").agg(count(lit(1)).as("n_solo_orders"))
      // supplier is SF-scaled → unhinted; AQE broadcasts while small
      .join(s, col("l_suppkey") === s("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_solo_orders"))
      .orderBy(col("n_solo_orders").desc, col("s_suppkey"))
      .limit(20)
  }

  /** TPC-H Q15 shape (top supplier by windowed revenue): aggregate
    * view, scalar-subquery MAX over it, equality join back — ties
    * all surface, like the SQL. The 1-row MAX side broadcasts.
    */
  def q36TopRevenueSupplier(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val s = Tables(spark, dir, "supplier")
    // revenue in EXACT integer cent·percent units (price is exact
    // cents, discount exact percent): the long sum is summation-order
    // independent, so the argmax equality can never flip on a last-ulp
    // difference between Spark's partial-agg order and DuckDB's —
    // same hazard q34 fixed for its argmin. Division to display
    // dollars happens after the winner is chosen.
    val rev = li.filter(
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy("l_suppkey")
      .agg(sum(round(col("l_extendedprice") * 100).cast("long") *
        (lit(100L) - round(col("l_discount") * 100).cast("long"))).as("rev_u"))
    val mx = rev.agg(max("rev_u").as("max_u"))
    // the 1-row MAX stays pinned; SF-scaled supplier does not
    rev.join(broadcast(mx), col("rev_u") === col("max_u"))
      .join(s, col("l_suppkey") === s("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        round(col("rev_u") / 10000.0, 2).as("total_rev"))
      .orderBy("s_suppkey")
  }

  /** TPC-H Q4 shape (order-priority checking): orders from one quarter
    * counted per priority when at least one of their lineitems shipped
    * AFTER the order date — a correlated EXISTS decorrelated to a
    * left-semi join with a non-equi residual. One shuffle on the order
    * key for the semi join (the quarter filter pushes to the orders
    * scan first), then a five-group rollup.
    */
  def q39OrderPriority(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
    val li = Tables(spark, dir, "lineitem")
    val q = o.filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
      col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
    q.join(li, q("o_orderkey") === li("l_orderkey") &&
        li("l_shipdate") > q("o_orderdate"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  /** TPC-H Q13 shape (customer order-count distribution): LEFT OUTER
    * join so zero-order customers survive with count 0, then a
    * histogram over the per-customer counts. First aggregate shuffles
    * on c_custkey; the histogram input is one row per customer, so
    * the second shuffle is already small at any corpus size.
    */
  def q40CustDistribution(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "customer")
    val o = Tables(spark, dir, "orders")
    val counts = c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
      .groupBy(c("c_custkey"))
      .agg(count(o("o_orderkey")).as("c_count"))
    counts.groupBy("c_count").agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** TPC-H Q18 shape (large-volume orders): orders whose total
    * quantity clears a threshold, joined back to customer + order
    * attributes. Quantity sums in exact integer units so the
    * threshold test can never flip between engines; the big-order key
    * set is tiny, so the join-back is effectively a semi-join that
    * AQE sizes down.
    */
  def q41BigOrders(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val o = Tables(spark, dir, "orders")
    val c = Tables(spark, dir, "customer")
    val big = li.groupBy("l_orderkey")
      .agg(sum(col("l_quantity").cast("long")).as("total_qty"))
      .filter(col("total_qty") > 300)
    big.join(o, big("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .select(c("c_custkey"), c("c_name"), o("o_orderkey"),
        o("o_totalprice"), big("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  /** TPC-H Q22 shape (inactive high-balance accounts): customers whose
    * balance beats the positive-balance average and who placed no
    * order since 2000, rolled up per market segment. The average test
    * runs in EXACT integer cents cross-multiplied against the count
    * (cents·n > total-cents), so no borderline row can flip on a
    * last-ulp AVG difference between engines; the 1-row aggregate
    * broadcasts, and the inactivity check is an anti join against the
    * (date-filtered) order keys.
    */
  /** Exact revenue in 1e-4-dollar units: cents × (100 − discount
    * basis points), both factors integer-rounded once. Integer sums
    * are associative in any order, so partial aggregation can never
    * produce a different total than the single-threaded oracle — the
    * cross-engine hazard ROUND(SUM(double)) queries carry near
    * rounding boundaries (the q34/q36 lesson).
    */
  private def revE4 =
    round(col("l_extendedprice") * 100).cast("long") *
      (lit(100L) - round(col("l_discount") * 100).cast("long"))

  /** TPC-H Q7 shape (volume shipping): bilateral trade between two
    * nations — lineitem→supplier nation on one side, order→customer
    * nation on the other — per ship year. The 25-row nation dim
    * broadcasts twice under different role names; the fact-side joins
    * shuffle on their natural keys and AQE handles the rest. Revenue
    * stays in exact 1e-4-dollar integers end-to-end.
    */
  def q43NationTrade(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val s = Tables(spark, dir, "supplier")
    val o = Tables(spark, dir, "orders")
    val c = Tables(spark, dir, "customer")
    val n = Tables(spark, dir, "nation")
    val n1 = n.select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val n2 = n.select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    li.join(s, li("l_suppkey") === s("s_suppkey"))
      .join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
      .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
        (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(sum(revE4).as("revenue_e4"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** TPC-H Q8 shape (national market share): NATION_7's share of
    * PROMO-part revenue sold into ASIA, per order year. Numerator and
    * denominator aggregate in exact 1e-4-dollar integers (one
    * conditional, one plain sum — a single pass); only the final
    * per-year ratio goes through doubles, and both engines divide the
    * SAME two integers, so the quotient is bit-identical before the
    * 4-dp round. The 5-row ASIA nation set and the 25-row supplier
    * nation dim broadcast.
    */
  def q44MarketShare(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val p = Tables(spark, dir, "part")
    val s = Tables(spark, dir, "supplier")
    val o = Tables(spark, dir, "orders")
    val c = Tables(spark, dir, "customer")
    val n = Tables(spark, dir, "nation")
    val r = Tables(spark, dir, "region")
    val ns = n.select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val asiaN = n.join(broadcast(r.filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("c_nk"))
    // part and supplier are SF-scaled (0.2·SF / 0.01·SF — still ~10⁸
    // rows at the 100 TB design point) → NO forced hints: a pin
    // overrides Spark's size check and OOMs executors when data grows.
    // AQE broadcasts them at runtime while genuinely small. Only the
    // constant-bounded nation/region derivations stay pinned.
    li.join(p.filter(col("p_type") === "PROMO"),
        li("l_partkey") === p("p_partkey"))
      .join(s, li("l_suppkey") === s("s_suppkey"))
      .join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(ns), col("s_nationkey") === col("s_nk"))
      .join(broadcast(asiaN), col("c_nationkey") === col("c_nk"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(sum(when(col("supp_nation") === "NATION_7", revE4).otherwise(0L)).as("nat"),
        sum(revE4).as("tot"))
      .select(col("o_year"),
        round(col("nat").cast("double") / col("tot").cast("double"), 4).as("mkt_share"))
      .orderBy("o_year")
  }

  def q42InactiveBalance(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "customer")
    val o = Tables(spark, dir, "orders")
    val pos = c.filter(col("c_acctbal") > 0)
      .agg(sum(round(col("c_acctbal") * 100).cast("long")).as("tot"),
        count(lit(1)).as("n"))
    val recent = o
      .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
      .select("o_custkey").distinct()
    c.crossJoin(broadcast(pos))
      .filter(round(col("c_acctbal") * 100).cast("long") * col("n") > col("tot"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("numcust"), round(sum("c_acctbal"), 2).as("totacctbal"))
      .orderBy("c_mktsegment")
  }

  /** Exact quantity in centi-units (l_quantity is a 2-dp double in the
    * dataset): one integer rounding, then every comparison and sum is
    * integer arithmetic — same rationale as [[revE4]].
    */
  private def qtyC = round(col("l_quantity") * 100).cast("long")

  /** TPC-H Q9 shape (product-type profit): profit per (supplier
    * nation, order year) over the 5-way lineitem⋈part⋈supplier⋈orders⋈
    * nation join, restricted to one part type. The dataset has no
    * partsupp, so the cost side is quantity × retail price; both
    * revenue and cost stay in exact 1e-4-dollar integers so partial
    * aggregation order can never flip the total. Nation (constant 25
    * rows) pins its broadcast; SF-scaled part/supplier stay unhinted
    * (AQE broadcasts while small); the fact joins shuffle on their
    * natural keys.
    */
  def q45ProductProfit(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val p = Tables(spark, dir, "part").filter(col("p_type") === "ECONOMY")
    val s = Tables(spark, dir, "supplier")
    val o = Tables(spark, dir, "orders")
    val n = Tables(spark, dir, "nation")
    val costE4 = round(col("p_retailprice") * 100).cast("long") * qtyC
    li.join(p, li("l_partkey") === p("p_partkey"))
      .join(s, li("l_suppkey") === s("s_suppkey"))
      .join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(sum(revE4 - costE4).as("profit_e4"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  /** TPC-H Q10 shape (returned-item reporting): revenue lost to
    * returns per customer in one quarter, top 20. The revenue ranks in
    * exact 1e-4 integers so the LIMIT cutoff cannot flip on a rounding
    * difference; ties break on the unique customer key.
    */
  def q46ReturnedItems(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem").filter(col("l_returnflag") === "R")
    val o = Tables(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
    val c = Tables(spark, dir, "customer")
    val n = Tables(spark, dir, "nation")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name").as("nation"))
      .agg(sum(revE4).as("revenue_e4"))
      .orderBy(col("revenue_e4").desc, col("c_custkey"))
      .limit(20)
  }

  /** TPC-H Q11 shape (important stock): parts whose shipped value
    * exceeds 1/1000 of the corpus total. The global total is a 1-row
    * aggregate that broadcasts into the per-part filter, and the
    * threshold test cross-multiplies integers (value·1000 > total)
    * instead of dividing, so no borderline part can flip on a quotient
    * ulp.
    */
  def q47ImportantParts(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val perPart = li.groupBy("l_partkey").agg(sum(revE4).as("value_e4"))
    val total = li.agg(sum(revE4).as("total_e4"))
    perPart.crossJoin(broadcast(total))
      .filter(col("value_e4") * 1000 > col("total_e4"))
      .select(col("l_partkey"), col("value_e4"))
      .orderBy(col("value_e4").desc, col("l_partkey"))
  }

  /** TPC-H Q12 shape (shipping-priority classification): per line
    * status, how many late-shipped 1997 lineitems belonged to
    * high-priority orders vs the rest — the conditional-count pivot
    * over a fact⋈fact join. "Late" is an integer day-difference
    * predicate pushed to the join output.
    */
  def q48ShipPriority(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val o = Tables(spark, dir, "orders")
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .filter(year(col("l_shipdate")) === 1997 &&
        datediff(col("l_shipdate"), col("o_orderdate")) > 60)
      .groupBy("l_linestatus")
      .agg(count(when(high, 1)).as("high_line_count"),
        count(when(!high, 1)).as("low_line_count"))
      .orderBy("l_linestatus")
  }

  /** TPC-H Q14 shape (promotion effect): the PROMO share of monthly
    * 1997 revenue. Numerator and denominator aggregate as exact 1e-4
    * integers in ONE pass (conditional sum); only the final ratio is a
    * double, and both engines divide the same two integers so the
    * quotient is bit-identical before the 4-dp round.
    */
  def q49PromoEffect(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
      .filter(year(col("l_shipdate")) === 1997)
    val p = Tables(spark, dir, "part")
    li.join(p, li("l_partkey") === p("p_partkey"))
      .groupBy(month(col("l_shipdate")).cast("long").as("o_month"))
      .agg(sum(when(col("p_type") === "PROMO", revE4).otherwise(0L)).as("promo_e4"),
        sum(revE4).as("total_e4"))
      .select(col("o_month"),
        round(lit(100.0) * col("promo_e4") / col("total_e4"), 4).as("promo_pct"))
      .orderBy("o_month")
  }

  /** TPC-H Q17 shape (small-quantity revenue): per brand, revenue from
    * lineitems under half the part's average quantity. The per-part
    * average is never materialized as a double — the predicate
    * cross-multiplies integer centi-quantities (2·q·n < Σq), so the
    * below-average test is exact. Per-part aggregate joins back to the
    * fact on the part key (shuffle on l_partkey both sides — one
    * exchange reused).
    */
  def q50SmallQtyRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val p = Tables(spark, dir, "part")
    val perPart = li.groupBy(col("l_partkey").as("pk"))
      .agg(sum(qtyC).as("sum_qc"), count(lit(1)).as("n"))
    li.join(perPart, li("l_partkey") === col("pk"))
      .filter(qtyC * 2 * col("n") < col("sum_qc"))
      .join(p, li("l_partkey") === p("p_partkey"))
      .groupBy("p_brand")
      .agg(sum(revE4).as("revenue_e4"), count(lit(1)).as("n_items"))
      .orderBy("p_brand")
  }

  /** TPC-H Q19 shape (discounted revenue, OR'd predicate bands): three
    * disjunctive (brand, quantity-band, size-band) arms collapse into
    * one scan — the OR evaluates post-join, no UNION of three scans.
    * Single-row output in exact integers.
    */
  def q51BrandBands(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val p = Tables(spark, dir, "part")
    val arm1 = col("p_brand") === "Brand#1" && col("l_quantity").between(1, 11) &&
      col("p_size").between(1, 5)
    val arm2 = col("p_brand") === "Brand#2" && col("l_quantity").between(10, 20) &&
      col("p_size").between(1, 10)
    val arm3 = col("p_brand") === "Brand#3" && col("l_quantity").between(20, 30) &&
      col("p_size").between(1, 15)
    li.join(p, li("l_partkey") === p("p_partkey"))
      .filter(arm1 || arm2 || arm3)
      .agg(sum(revE4).as("revenue_e4"), count(lit(1)).as("n_items"))
  }

  /** TPC-H Q20 shape (excess-share suppliers): suppliers who shipped
    * more than twice the per-supplier average of some PROMO part in
    * 1997 — a two-level aggregate (part×supplier, then part) whose
    * comparison cross-multiplies integers (q·n > 2·Σq), semi-joined
    * back to the supplier dim. No quantity ever becomes a double.
    */
  def q52ExcessSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
      .filter(year(col("l_shipdate")) === 1997)
    val p = Tables(spark, dir, "part").filter(col("p_type") === "PROMO")
    val s = Tables(spark, dir, "supplier")
    val n = Tables(spark, dir, "nation")
    val ps = li.join(p, li("l_partkey") === p("p_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(qtyC).as("q_ps"))
    val perPart = ps.groupBy(col("l_partkey").as("pk"))
      .agg(sum(col("q_ps")).as("q_p"), count(lit(1)).as("n_supp"))
    val excess = ps.join(perPart, col("l_partkey") === col("pk"))
      .filter(col("q_ps") * col("n_supp") > col("q_p") * 2)
      .select("l_suppkey").distinct()
    // the qualifying-supplier id set is fact-derived and bounded only
    // by the (SF-scaled) supplier dim — NOT a safe forced-broadcast
    // class; leave it to AQE's runtime size check. Nation (25 rows)
    // stays pinned.
    s.join(excess, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name").as("nation"))
      .orderBy("s_suppkey")
  }

  /** TPC-H Q16 shape (supplier variety): distinct suppliers per
    * (brand, size) for non-PROMO parts, excluding negative-balance
    * suppliers via an anti join (the Q16 "complaints" exclusion). The
    * (part, supplier) pairs project to ids before the distinct, so the
    * count-distinct shuffle carries 16-byte rows.
    */
  def q53SupplierVariety(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val p = Tables(spark, dir, "part").filter(col("p_type") =!= "PROMO")
    val bad = Tables(spark, dir, "supplier").filter(col("s_acctbal") < 0)
      .select("s_suppkey")
    li.join(p, li("l_partkey") === p("p_partkey"))
      // the negative-balance exclusion set scales with supplier (SF-
      // scaled) → unhinted; AQE broadcasts the anti side while small
      .join(bad, li("l_suppkey") === col("s_suppkey"), "left_anti")
      .select(col("p_brand"), col("p_size"), col("l_suppkey"))
      // spill-aware distinct-count: dedup the (brand, size, supplier)
      // triples on their FULL key first — clustered input keeps each
      // dedup task's hash map to its own size-bounded slice of the
      // triple domain (see q59Basket) — then count the deduped rows,
      // whose cardinality is dim-bounded (brands × sizes × suppliers),
      // per group. countDistinct over the join output would grow its
      // partial distinct map to (triples / tasks) per task instead.
      .repartition(col("p_brand"), col("p_size"), col("l_suppkey"))
      .distinct()
      .groupBy("p_brand", "p_size")
      .agg(count(lit(1)).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_size"))
  }

  /** Heavy hitters under a bounded Misra–Gries summary
    * ([[graft.functions.MisraGries]]): the sketch pass ships ≤ k−1
    * counters per partition (a full distinct aggregate at 100 TB
    * would shuffle every key), the exact pass recomputes true counts
    * for the reported rows only, and the emitted rows carry the
    * theorem's contract — every item with frequency > n/k is in the
    * summary, every estimate within n/k of truth — as boolean columns
    * the oracle asserts TRUE (q13's sketch-bound pattern). The item
    * key is the token's first letter: genuinely skewed (20%
    * head / 3% tail), so k=24 compresses 19 keys and the threshold
    * splits head from tail.
    */
  /** Interval-overlap sweep: the maximum number of SIMULTANEOUSLY
    * open events (each event spans [ts, ts + value seconds)) and the
    * earliest instant it is reached — the classic "max concurrent
    * sessions" question, and the canonical case where the naive plan
    * is a partition-less running sum over every boundary.
    *
    * Scale shape: boundary deltas (+1 at start, −1 at end) pre-
    * aggregate BY INSTANT (map-side combine, one shuffle keyed on t —
    * also what makes the half-open semantics exact: ends cancel
    * starts at the same instant before any prefix is taken), then the
    * running concurrency is the repo's two-phase exact cumsum
    * (range-sort on t, one long per partition to the driver, offsets
    * scanned back out) — the same discipline as [[Ranks]] and the
    * token-budget cut, no `Window.orderBy` funneling the corpus
    * through one reducer. The final reduce is |partitions| pairs on
    * the driver.
    */
  def q61Concurrency(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "events")
      .filter(col("value") > 0)
      .select(unix_micros(col("ts")).as("s"),
        (unix_micros(col("ts")) +
          (col("value") * 1000000L).cast("long")).as("e"))
    val deltas = e.select(col("s").as("t"), lit(1L).as("d"))
      .unionAll(e.select(col("e").as("t"), lit(-1L).as("d")))
      .groupBy("t").agg(sum("d").as("d"))
    // session-default range partitioning: distinct instants scale with
    // the data, so the cumsum stage must widen with the cluster — never
    // a hardcoded partition count capping it at N tasks
    val sorted = deltas.repartitionByRange(col("t"))
      .sortWithinPartitions("t")
    val rdd = sorted.rdd
    rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val partSums = rdd.mapPartitionsWithIndex { case (i, it) =>
      Iterator((i, it.map(_.getLong(1)).sum))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = partSums.scanLeft(0L)(_ + _)
    val best = rdd.mapPartitionsWithIndex { case (i, it) =>
      var acc = offsets(i)
      var mx = Long.MinValue
      var at = 0L
      it.foreach { r =>
        acc += r.getLong(1)
        if (acc > mx) { mx = acc; at = r.getLong(0) }
      }
      if (mx == Long.MinValue) Iterator.empty else Iterator((mx, at))
    }.collect()
    rdd.unpersist()
    // range partitions are t-ordered, so among partitions tying on
    // the global max the lowest index holds the earliest instant
    val (mx, at) = best.sortBy { case (m, a) => (-m, a) }.head
    import spark.implicits._
    Seq((mx, at)).toDF("max_concurrent", "at_ts_us")
  }

  /** First-order event-type transition matrix (Q51n — what session-
    * replay and behavioral-sequence pipelines estimate before any
    * Markov/attribution modelling): consecutive event pairs per user
    * under the deterministic (ts, event_id) order, counted
    * corpus-wide, with each source type's outgoing total giving the
    * row-normalised transition probability.
    *
    * Scale shape: the lead() window partitions BY USER — per-key
    * state, never a global sort; the pair aggregate map-side combines
    * to ≤ |types|² rows, and the outgoing-total join runs over that
    * constant-bounded matrix.
    */
  def q62Transitions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
      // outgoing totals via a window over the types²-bounded matrix —
      // one events pass, no join-back recomputation of the lead chain
      .withColumn("n_from",
        sum("n").over(Window.partitionBy("from_type")))
      .select(col("from_type"), col("to_type"), col("n"),
        round(col("n").cast("double") / col("n_from"), 6).as("p"))
      .orderBy("from_type", "to_type")
  }

  /** Hourly volume-anomaly sweep per event type (Q51o — the
    * self-monitoring pass an ingest pipeline runs over its own event
    * volumes): hours whose count reaches 3× the type's median hourly
    * count. The median is EXACT integer order statistics — rank the
    * type's hourly rows by (n, hour), take the lower middle — no
    * percentile buffer, no float anywhere.
    *
    * Scale shape: the hourly aggregate map-side combines to
    * (types × hours) rows — CALENDAR-sized, not event-sized — so the
    * per-type rank windows run over time-bounded partitions and the
    * verdict join is a type-keyed join of two calendar-sized sides.
    */
  def q63Anomaly(spark: SparkSession, dir: String): DataFrame = {
    val hourly = Tables(spark, dir, "events")
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n"))
    val byType = Window.partitionBy("event_type")
    hourly
      .withColumn("rn",
        row_number().over(byType.orderBy(col("n"), col("hour"))))
      .withColumn("cnt", count(lit(1)).over(byType))
      // the median attaches via a second window over the SAME
      // calendar-sized partition (no join-back, so the events
      // aggregate runs once); Spark's / on longs is DOUBLE division —
      // floor back to the integer lower-median rank (DuckDB's //)
      .withColumn("med", max(when(
        col("rn") === floor((col("cnt") + 1) / 2).cast("long"),
        col("n"))).over(byType))
      .filter(col("n") >= col("med") * 3)
      .select(col("event_type"), col("hour"), col("n"), col("med"))
      .orderBy("event_type", "hour")
  }

  def q54HeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.GraftSqlShims
    val K = 24
    val toks = Tables(spark, dir, "documents")
      .filter(length(trim(col("text"))) > 0)
      .select(explode(split(trim(col("text")), "\\s+")).as("w"))
      .select(substring(col("w"), 1, 1).as("item"))
    val exact = toks.groupBy("item").agg(count(lit(1)).as("exact_cnt"))
    val tot = toks.agg(count(lit(1)).as("n_total"))
    val sk = toks
      .select(GraftSqlShims.column(graft.functions.MisraGries(
        GraftSqlShims.expression(col("item")), K).toAggregateExpression()).as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.item").as("item"), col("e.est").as("est"))
    exact.crossJoin(broadcast(tot))
      .filter(col("exact_cnt") * K > col("n_total"))
      .join(broadcast(sk), Seq("item"), "left")
      .select(col("item"), col("exact_cnt"),
        col("est").isNotNull.as("in_sketch"),
        (col("est").isNotNull &&
          abs(col("est") - col("exact_cnt")) <= col("n_total") / K)
          .as("est_err_ok"))
      .orderBy("item")
  }

  /** RFM customer segmentation (`q64_rfm`): every customer scored
    * 1–5 on Recency (days since last order), Frequency (order count)
    * and Monetary (lifetime spend, exact cents), then segment-level
    * counts and spend — the classic CRM/cohort table, and the
    * three-axis generalization of q29's decile segmentation.
    *
    * Scale shape: three [[Ranks.withGlobalOrdinal]] passes over the
    * per-customer aggregate (SF-scaled — NEVER a partition-less
    * NTILE window), each bucket then arithmetic over (ordinal, n)
    * via the shared [[Ranks.ntileBucket]] contract; the aggregate is
    * `localCheckpoint`ed once so the three rank passes and the count
    * don't re-run the orders scan. Output is ≤125 segment rows. The
    * only driver traffic is one long (the customer count).
    */
  def q64Rfm(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
    val maxd = o.agg(max(col("o_orderdate").cast("date")).as("corpus_max_d"))
    val base = o.groupBy("o_custkey")
      .agg(max(col("o_orderdate").cast("date")).as("last_d"),
        count(lit(1)).as("freq"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      .crossJoin(broadcast(maxd)) // 1-row aggregate: sanctioned pin
      .withColumn("rec_days",
        datediff(col("corpus_max_d"), col("last_d")).cast("long"))
      .select("o_custkey", "rec_days", "freq", "cents")
      .localCheckpoint()
    val n = base.count()
    def score(metric: String, asc: Boolean): DataFrame = {
      val ord =
        if (asc) Seq(col(metric).asc, col("o_custkey").asc)
        else Seq(col(metric).desc, col("o_custkey").asc)
      Ranks.withGlobalOrdinal(base.select("o_custkey", metric), "__ord", ord: _*)
        .select(col("o_custkey"), col(metric),
          Ranks.ntileBucket(col("__ord"), n, 5L).as(metric + "_score"))
    }
    // 1 = best on every axis: most recent, most frequent, top spend
    val r = score("rec_days", asc = true).drop("rec_days")
    val f = score("freq", asc = false).drop("freq")
    val m = score("cents", asc = false)
    r.join(f, "o_custkey").join(m, "o_custkey")
      .groupBy(col("rec_days_score").as("r_score"),
        col("freq_score").as("f_score"), col("cents_score").as("m_score"))
      .agg(count(lit(1)).as("n_customers"),
        sum("cents").as("segment_cents"))
      .orderBy("r_score", "f_score", "m_score")
  }

  /** Revenue concentration (`q65_gini`): Gini coefficient of
    * per-customer lifetime spend plus the top-decile revenue share —
    * the inequality/concentration health check marketplaces and
    * corpus-curation audits both run.
    *
    * Exact arithmetic end to end: spend in integer cents, the Lorenz
    * weighting Σ i·xᵢ accumulated in DECIMAL(38,0) (order-independent
    * integer sum — no float drift, and no overflow at the 100 TB
    * design point where i·xᵢ exceeds a long), doubles only at the
    * final two divisions. The ascending rank is the two-phase global
    * ordinal, never a partition-less window; driver traffic is one
    * long (the customer count).
    */
  def q65Gini(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
    val rev = o.groupBy("o_custkey")
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      .localCheckpoint() // counted once, ranked once — settle the aggregate
    val n = rev.count()
    val ranked = Ranks.withGlobalOrdinal(rev, "__ord",
      col("cents").asc, col("o_custkey"))
    val cut = n - n / 10L // ordinals above this form the top decile
    ranked
      .agg(sum(col("cents")).as("tot"),
        sum(col("cents").cast("decimal(38,0)") * col("__ord")).as("s"),
        sum(when(col("__ord") > cut, col("cents")).otherwise(lit(0L))).as("topc"))
      .select(lit(n).as("n_customers"),
        col("tot").as("total_cents"),
        round((col("s") * 2).cast("double") /
            (lit(n.toDouble) * col("tot").cast("double")) -
          lit((n + 1).toDouble / n.toDouble), 6).as("gini"),
        round(col("topc").cast("double") / col("tot").cast("double"), 6)
          .as("top10_share"))
  }

  /** Linear multi-touch attribution (`q66_attribution`): every
    * purchase's value splits equally across the user's click/view
    * touches in the preceding 24 h; untouched purchases land in the
    * `direct` bucket — the marketing-attribution table behind every
    * channel-ROI dashboard, and the causal sibling of q14's
    * last-touch as-of join.
    *
    * Exact integers: value in cents, the per-touch share is integer
    * division (`DIV` ≡ DuckDB `//` — `floor(a/b)` through doubles
    * can round UP across the integer boundary when b is large, so
    * both engines use true integer division). One LEFT join keyed on
    * user (+ time-range residual) so the no-touch case rides the
    * same scan, then a per-purchase window (bounded by one user's
    * 24 h touch volume) — no join-back, no second scan of the join.
    */
  def q66Attribution(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "events")
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"),
        col("ts").as("p_ts"), round(col("value") * 100).cast("long").as("cents"))
    val t = e.filter(col("event_type").isin("click", "view"))
      .select(col("event_id").as("t_id"), col("user_id").as("t_uid"),
        col("ts").as("t_ts"), col("event_type").as("touch_type"))
    val j = p.join(t,
      col("user_id") === col("t_uid") &&
        col("t_ts") < col("p_ts") &&
        col("t_ts") >= col("p_ts") - expr("INTERVAL 24 HOURS"), "left")
    val perPurchase = Window.partitionBy("p_id")
    j.withColumn("n_t", count(col("t_id")).over(perPurchase))
      .withColumn("bucket", coalesce(col("touch_type"), lit("direct")))
      .withColumn("att_cents",
        when(col("n_t") === 0, col("cents")).otherwise(expr("cents DIV n_t")))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"), sum("att_cents").as("attributed_cents"))
      .orderBy("bucket")
  }

  /** Cohort LTV triangle (`q67_cohort_ltv`): customers cohorted by
    * first-order month; per (cohort, months-since-first) the active
    * customer count, period revenue, and cumulative revenue — the
    * retention/lifetime-value table every growth team reads.
    *
    * Scale shape: the cohort stamp is a per-customer window (bounded
    * partitions, one scan — no first-order join-back re-running the
    * orders scan), the rollup map-side combines to calendar² rows,
    * and the cumulative sum's window partitions by cohort over those
    * calendar-bounded rows. Revenue in exact cents.
    */
  def q67CohortLtv(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
      .select(col("o_custkey"),
        date_trunc("month", col("o_orderdate")).cast("date").as("m"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
    val perCust = Window.partitionBy("o_custkey")
    val g = o.withColumn("cohort", min("m").over(perCust))
      .withColumn("month_k",
        months_between(col("m"), col("cohort")).cast("long"))
      .groupBy("cohort", "month_k")
      .agg(countDistinct("o_custkey").as("n_active"),
        sum("cents").as("cents_m"))
    val cum = Window.partitionBy("cohort").orderBy("month_k")
    g.withColumn("cum_cents", sum("cents_m").over(cum))
      .select(col("cohort").as("cohort_month"), col("month_k"),
        col("n_active"), col("cents_m"), col("cum_cents"))
      .orderBy("cohort_month", "month_k")
  }

  /** Customer decile MIGRATION between eras (`q68_decile_migration` —
    * the cohort-movement matrix retention/CRM teams read: of the
    * customers in spend decile i before the cut date, how many sit in
    * decile j after it). Spend is exact integer cents; customers
    * active in BOTH eras rank twice.
    *
    * Scale shape: ONE orders scan builds both eras' per-customer
    * sums (conditional aggregation — never two fact scans), the
    * aggregate `localCheckpoint`s once (count + both rank passes
    * share it — the q64 RFM discipline), each era's decile is a
    * [[Ranks.withGlobalOrdinal]] pass + [[Ranks.ntileBucket]]
    * arithmetic (never a partition-less NTILE window), and the
    * join-back is customer-keyed. Output is ≤100 matrix rows; driver
    * traffic is one long.
    */
  def q68DecileMigration(spark: SparkSession, dir: String): DataFrame = {
    val cut = "1998-01-01"
    val o = Tables(spark, dir, "orders")
    val spend = o.groupBy("o_custkey")
      .agg(
        sum(when(col("o_orderdate") < lit(cut),
          round(col("o_totalprice") * 100).cast("long"))).as("c1"),
        sum(when(col("o_orderdate") >= lit(cut),
          round(col("o_totalprice") * 100).cast("long"))).as("c2"))
      .filter(col("c1").isNotNull && col("c2").isNotNull)
      .localCheckpoint()
    val n = spend.count()
    def decile(metric: String): DataFrame =
      Ranks.withGlobalOrdinal(spend.select("o_custkey", metric), "__ord",
          col(metric).desc, col("o_custkey"))
        .select(col("o_custkey"),
          Ranks.ntileBucket(col("__ord"), n, 10L).as(metric + "_d"))
    decile("c1").join(decile("c2"), "o_custkey")
      .groupBy(col("c1_d").as("from_decile"), col("c2_d").as("to_decile"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy("from_decile", "to_decile")
  }

  /** Year-over-year revenue growth per customer nation (the trend
    * table a BI layer puts behind every "growth" tile). Revenue stays
    * in exact 1e-4-dollar integers through the aggregate; the growth
    * ratio divides two exact longs once at the end.
    *
    * Scale shape: the SF-scaled joins (lineitem→orders→customer)
    * shuffle on their natural keys with the 25-row nation dim
    * broadcast; the window runs AFTER aggregation over the
    * |nation|×|year| frame (≤ ~200 rows), partitioned by nation — a
    * lag over a bounded frame, never over fact rows.
    */
  def q69YoyGrowth(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val o = Tables(spark, dir, "orders")
    val c = Tables(spark, dir, "customer")
    val n = Tables(spark, dir, "nation")
    val yearly = li
      .join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(sum(revE4).as("rev"))
    val w = Window.partitionBy("nation").orderBy("o_year")
    yearly
      .withColumn("prev", lag("rev", 1).over(w))
      .filter(col("prev").isNotNull && col("prev") =!= 0L)
      .select(col("nation"), col("o_year"),
        round((col("rev") - col("prev")).cast("double") /
          col("prev").cast("double"), 4).as("yoy_growth"))
      .orderBy("nation", "o_year")
  }

  /** Supplier market concentration per nation — the Herfindahl-
    * Hirschman index procurement/risk teams read (HHI near 1e12 ppm²
    * = monopoly supplier, near 1e12/n = perfectly split). Completes
    * the inequality pair with q65's Gini.
    *
    * Exactness across engines: each supplier's share is computed as
    * floor(rev/total · 1e6) ppm — both operands are exact integers
    * below 2^53, so the double division and the single multiply are
    * IEEE-identical in Spark and DuckDB — and the index is then an
    * INTEGER sum of ppm², never a float accumulation (float sums
    * order-differ across engines; integer sums cannot).
    *
    * Scale shape: fact shuffles once to (nation, supplier) grain;
    * the nation-total join-back is against a ≤25-row aggregate
    * (constant-bounded broadcast pin); output ≤ |nations| rows.
    */
  def q70SupplierHhi(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val s = Tables(spark, dir, "supplier")
    val n = Tables(spark, dir, "nation")
    val bySupp = li
      .join(s, li("l_suppkey") === s("s_suppkey"))
      .join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name").as("nation"), col("s_suppkey"))
      .agg(sum(revE4).as("rev"))
    // ≤25 rows: |nations| — constant-bounded, broadcast pin is safe
    val totals = bySupp.groupBy("nation")
      .agg(sum("rev").as("tot"), count(lit(1)).as("n_suppliers"))
    bySupp.join(broadcast(totals), "nation")
      .withColumn("ppm",
        floor(col("rev").cast("double") / col("tot").cast("double")
          * 1000000d).cast("long"))
      .groupBy("nation")
      .agg(sum(col("ppm") * col("ppm")).as("hhi_ppm2"),
        first(col("n_suppliers")).as("n_suppliers"))
      .orderBy("nation")
  }

  /** q71: revenue-WEIGHTED median quantity per return flag — the
    * "what order size carries half the money" number a plain median
    * (q33's row-weighted one) can't answer. Exact arithmetic: weights
    * are extended-price CENTS (longs), the median is the smallest
    * quantity whose cumulative weight reaches half the flag's total
    * (2·cum ≥ tot in integers — no division at all).
    *
    * Scale shape: ONE map-side-combinable shuffle to the
    * (flag, quantity) grain; the cumulative window then runs over a
    * VALUE-BOUNDED frame (≤ |flags|·|quantity domain| rows — TPC-H
    * quantities are 1..50), the sanctioned constant-bounded window
    * class, never fact rows; flag totals re-ride the same tiny frame.
    */
  def q71WeightedMedian(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val grain = li.groupBy(col("l_returnflag"), col("l_quantity"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("w_cents"))
    // ≤ |flags|×50 rows from here down (value-bounded, commented above)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("l_returnflag").orderBy("l_quantity")
    val tot = org.apache.spark.sql.expressions.Window
      .partitionBy("l_returnflag")
    grain
      .withColumn("cum", sum("w_cents").over(w))
      .withColumn("tot", sum("w_cents").over(tot))
      .filter(col("cum") * 2 >= col("tot"))
      .groupBy("l_returnflag")
      .agg(min("l_quantity").as("median_qty"),
        max("tot").as("total_cents"))
      .orderBy("l_returnflag")
  }

  /** q72: weekly purchasing-cohort retention matrix over the event
    * stream — the full-matrix report beside q38's fixed-offset check
    * (q38 counts day-1/day-7 survivors of signup cohorts; this emits
    * EVERY (cohort week, week offset) cell of the purchase-retention
    * triangle with cohort sizes and ppm rates — the table a retention
    * dashboard actually renders). Cohort = a user's first PURCHASE
    * epoch week; cell = how many of them purchased again `offset`
    * weeks later; retention is an exact integer ppm (DIV — no float
    * division).
    *
    * Scale shape: the raw stream collapses FIRST to the distinct
    * (user, week) purchase-activity grain — the event-type filter
    * pushes to the scan, then one map-side-combinable shuffle on
    * (user, week) bounds everything downstream by users×weeks, not
    * events. The cohort derivation re-aggregates on user_id, and the
    * activity⋈cohort join shuffles both sides on that same user key —
    * no events-sized state anywhere. Because each user carries exactly
    * one cohort week, a user contributes at most one row per
    * (cohort, offset) cell, so the matrix count is a plain COUNT —
    * no count-distinct buffer. Cohort sizes are a calendar-bounded
    * (≤ |weeks| rows) side that AQE broadcasts into the final join.
    */
  def q72CohortRetention(spark: SparkSession, dir: String): DataFrame = {
    // FLOOR division, not DIV: DuckDB's // floors while Spark's DIV
    // truncates toward zero, so a pre-1970 timestamp (negative day
    // diff) would bucket one week apart between engines (r13
    // advisory). pmod keeps the arithmetic exact-integer: day - pmod
    // is divisible by 7, so the DIV is exact and equals floor.
    val activity = Tables(spark, dir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("user_id"),
        expr("CAST((datediff(CAST(ts AS DATE), DATE'1970-01-01') " +
          "- pmod(datediff(CAST(ts AS DATE), DATE'1970-01-01'), 7)) " +
          "DIV 7 AS BIGINT)").as("week"))
      .distinct()
    val cohort = activity.groupBy("user_id")
      .agg(min("week").as("cohort_week"))
    val matrix = activity.join(cohort, "user_id")
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("active_users"))
    val sizes = cohort.groupBy("cohort_week")
      .agg(count(lit(1)).as("cohort_size"))
    matrix.join(sizes, "cohort_week")
      .withColumn("retention_ppm",
        expr("CAST(active_users * 1000000 DIV cohort_size AS BIGINT)"))
      .select("cohort_week", "week_offset", "active_users", "cohort_size",
        "retention_ppm")
      .orderBy("cohort_week", "week_offset")
  }

  /** q73: ordered conversion funnel (view → click → purchase) on
    * GLOBAL first-occurrence anchors, with ppm conversion rates —
    * the single-pass counterpart to q37's progressive funnel (q37
    * re-anchors each stage on the previous stage's min via three
    * chained join-aggregates; this variant fixes all anchors at the
    * user's first occurrence of each type, the other standard funnel
    * definition, and gets the whole report from ONE shuffle).
    * Conversion rates are exact integer ppm via DIV, zero-guarded.
    *
    * Scale shape: ONE shuffle to the user grain with three
    * map-side-combinable conditional MINs (each partial task carries
    * three timestamps per user, independent of event volume), then a
    * single-row global reduce — strictly fewer passes than the
    * chained-stage shape. A NULL-stage comparison is NULL → the
    * conditional counts it as 0, so no explicit null-gating join.
    */
  def q73Funnel(spark: SparkSession, dir: String): DataFrame = {
    val perUser = Tables(spark, dir, "events").groupBy("user_id").agg(
      min(when(col("event_type") === "view", col("ts"))).as("t_view"),
      min(when(col("event_type") === "click", col("ts"))).as("t_click"),
      min(when(col("event_type") === "purchase", col("ts"))).as("t_purchase"))
    perUser.agg(
        count(lit(1)).as("n_users"),
        sum(when(col("t_view").isNotNull, 1L).otherwise(0L)).as("n_view"),
        sum(when(col("t_click") > col("t_view"), 1L).otherwise(0L))
          .as("n_view_click"),
        sum(when(col("t_click") > col("t_view") &&
            col("t_purchase") > col("t_click"), 1L).otherwise(0L))
          .as("n_funnel"))
      .withColumn("click_ppm",
        expr("CAST(CASE WHEN n_view > 0 THEN n_view_click * 1000000 DIV n_view " +
          "ELSE 0 END AS BIGINT)"))
      .withColumn("purchase_ppm",
        expr("CAST(CASE WHEN n_view_click > 0 THEN n_funnel * 1000000 DIV n_view_click " +
          "ELSE 0 END AS BIGINT)"))
  }
}
