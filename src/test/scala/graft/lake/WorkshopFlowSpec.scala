package graft.lake

import graft.GraftSparkSpec
import org.apache.spark.sql.functions._

/** End-to-end replay of the reference workshop's lab flow
  * (reference docs/02-lab-optimizations.md §§A-F) through the
  * GraftSql statement surface — the "a user of the reference could
  * switch" proof. Same statements, same observable semantics.
  */
class WorkshopFlowSpec extends GraftSparkSpec {

  test("reference lab flow: generate, optimize, time travel, vacuum, partition") {
    val gsql = new GraftSql(spark)

    // §A: synthetic sales table written as many small files
    val countries = Seq("US", "CA", "MX", "UK", "DE", "FR", "ES", "BR", "IN", "JP")
    val cats = Seq("electronics", "apparel", "home", "grocery", "toys", "sport")
    val sales = spark.range(20000)
      .withColumn("order_id", col("id"))
      .withColumn("customer_id", pmod(col("id") * 2654435761L, lit(1000)))
      .withColumn("country", element_at(
        array(countries.map(lit): _*), (pmod(col("id") * 31L, lit(10)) + 1).cast("int")))
      .withColumn("category", element_at(
        array(cats.map(lit): _*), (pmod(col("id") * 17L, lit(6)) + 1).cast("int")))
      .withColumn("price", round(pmod(col("id") * 7919L, lit(40000)) / 100.0 + 5.0, 2))
      .withColumn("quantity", (pmod(col("id") * 13L, lit(5)) + 1).cast("int"))
      .withColumn("total", round(col("price") * col("quantity"), 2))
      .drop("id")
    gsql.registerCreate("sales", tmpDir("workshop-sales"), sales.repartition(40))
    val salesTable = gsql.table("sales")
    assert(salesTable.snapshot.numFiles == 40)

    // §B: baseline selective count
    val baseline = gsql.sql(
      "SELECT * FROM sales WHERE country='US' AND category='electronics'").count()
    assert(baseline > 0)

    // §C: OPTIMIZE ... VORDER compacts the small files
    gsql.sql("OPTIMIZE sales VORDER")
    assert(salesTable.snapshot.numFiles < 40)
    assert(gsql.sql(
      "SELECT * FROM sales WHERE country='US' AND category='electronics'").count() == baseline)

    // §D: history, accidental delete, time travel, restore
    val v2 = salesTable.version
    gsql.sql("DELETE FROM sales WHERE country = 'US'")
    val afterDelete = gsql.sql("SELECT COUNT(*) AS n FROM sales").head().getLong(0)
    assert(afterDelete < 20000)
    val ops = gsql.sql("DESCRIBE HISTORY sales")
      .select("operation").collect().map(_.getString(0)).toSeq
    assert(ops.contains("DELETE") && ops.contains("OPTIMIZE"))
    val oldCount = gsql.sql(s"SELECT COUNT(*) AS n FROM sales VERSION AS OF $v2")
      .head().getLong(0)
    assert(oldCount == 20000)
    gsql.sql(s"RESTORE TABLE sales TO VERSION AS OF $v2")
    assert(gsql.sql("SELECT COUNT(*) AS n FROM sales").head().getLong(0) == 20000)

    // §E: VACUUM DRY RUN lists nothing inside retention, RETAIN 0 deletes
    assert(gsql.sql("VACUUM sales DRY RUN").count() >= 0)
    gsql.sql("VACUUM sales RETAIN 0 HOURS")
    assert(gsql.sql("SELECT COUNT(*) AS n FROM sales").head().getLong(0) == 20000)

    // §F: partitioned table + pruned query
    gsql.registerCreate("sales_by_country", tmpDir("workshop-sbc"),
      salesTable.toDF, partitionBy = Seq("country"))
    val detail = gsql.sql("DESCRIBE DETAIL sales_by_country").head()
    assert(detail.getAs[String]("partitionColumns") == "country")
    val (kept, total) = gsql.table("sales_by_country")
      .pruneFiles(col("country") === "US")
    assert(kept < total)
    assert(gsql.sql("SELECT COUNT(*) AS n FROM sales_by_country WHERE country='US'")
      .head().getLong(0) ==
      salesTable.toDF.filter(col("country") === "US").count())

    // §D variant: UPDATE through SQL
    gsql.sql("UPDATE sales SET total = 0.0 WHERE country = 'MX'")
    assert(gsql.sql(
      "SELECT ROUND(SUM(total),2) AS s FROM sales WHERE country='MX'")
      .head().getDouble(0) == 0.0)

    // SHOW PARTITIONS: one row per live partition value, from log
    // metadata only; SHOW TBLPROPERTIES surfaces what SET wrote
    val parts = gsql.sql("SHOW PARTITIONS sales_by_country")
    assert(parts.columns.toSeq == Seq("country", "num_files"))
    val partVals = parts.select("country").collect().map(_.getString(0)).toSet
    assert(partVals == countries.toSet)
    gsql.sql("ALTER TABLE sales SET TBLPROPERTIES ('graft.demo'='on')")
    val props = gsql.sql("SHOW TBLPROPERTIES sales")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("graft.demo").contains("on"))
    intercept[IllegalArgumentException] {
      gsql.sql("SHOW PARTITIONS sales") // unpartitioned
    }

    // INSERT INTO VALUES / SELECT, and INSERT OVERWRITE
    val beforeInsert = gsql.sql("SELECT COUNT(*) AS n FROM sales").head().getLong(0)
    gsql.sql("INSERT INTO sales VALUES " +
      "(99999, 42, 'US', 'electronics', 10.0, 2, 20.0)")
    assert(gsql.sql("SELECT COUNT(*) AS n FROM sales").head().getLong(0)
      == beforeInsert + 1)
    gsql.sql("INSERT INTO sales_by_country SELECT * FROM sales WHERE country = 'JP'")
    val jp2 = gsql.sql(
      "SELECT COUNT(*) AS n FROM sales_by_country WHERE country='JP'")
      .head().getLong(0)
    assert(jp2 == 2 * gsql.sql(
      "SELECT COUNT(*) AS n FROM sales WHERE country='JP'").head().getLong(0))
    gsql.sql("INSERT OVERWRITE sales SELECT * FROM sales WHERE country = 'DE'")
    val after = gsql.sql("SELECT country, COUNT(*) AS n FROM sales GROUP BY country")
      .collect()
    assert(after.length == 1 && after(0).getString(0) == "DE")

    // CTAS: partitioned create straight from a SELECT over lake tables
    gsql.sql("CREATE TABLE de_sales PARTITIONED BY (category) LOCATION '" +
      tmpDir("workshop-ctas") + "' AS SELECT * FROM sales")
    val ctasDetail = gsql.sql("DESCRIBE DETAIL de_sales").head()
    assert(ctasDetail.getAs[String]("partitionColumns") == "category")
    assert(!ctasDetail.getAs[Boolean]("rowTracking"))
    assert(gsql.sql("SELECT COUNT(*) AS n FROM de_sales").head().getLong(0)
      == gsql.sql("SELECT COUNT(*) AS n FROM sales").head().getLong(0))
  }

  test("RESTORE TIMESTAMP AS OF and COPY INTO statements") {
    val gsql = new GraftSql(spark)
    val df = spark.range(100).withColumn("v", col("id") * 2)
    gsql.registerCreate("ts_tbl", tmpDir("sql-restore-ts"), df)
    // the SQL literal truncates to seconds: sleep past the boundary so
    // the truncated timestamp still lands strictly after the CTAS
    // commit and strictly before the delete's millisecond clock
    Thread.sleep(1100)
    val ts = java.time.Instant.ofEpochMilli(System.currentTimeMillis())
      .atZone(java.time.ZoneOffset.UTC).toLocalDateTime
      .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
    gsql.sql("DELETE FROM ts_tbl WHERE id < 50")
    assert(gsql.sql("SELECT COUNT(*) AS n FROM ts_tbl").head().getLong(0) == 50)
    gsql.sql(s"RESTORE TABLE ts_tbl TO TIMESTAMP AS OF '$ts'")
    assert(gsql.sql("SELECT COUNT(*) AS n FROM ts_tbl").head().getLong(0) == 100)

    val src = tmpDir("sql-copy-src")
    df.limit(30).coalesce(1).write.parquet(src)
    gsql.sql(s"COPY INTO ts_tbl FROM '$src'")
    assert(gsql.sql("SELECT COUNT(*) AS n FROM ts_tbl").head().getLong(0) == 130)
    gsql.sql(s"COPY INTO ts_tbl FROM '$src'") // idempotent
    assert(gsql.sql("SELECT COUNT(*) AS n FROM ts_tbl").head().getLong(0) == 130)

    // TABLE CHANGES is inclusive of BOTH bounds: version 1 is the
    // delete, so BETWEEN 1 AND 1 must surface its 50 delete rows
    val ch = gsql.sql("TABLE CHANGES ts_tbl BETWEEN 1 AND 1")
    assert(ch.filter(col("_change_type") === "delete").count() == 50)
    assert(ch.count() == 50)

    // TIMESTAMP bounds resolve at-or-after (start) / at-or-before
    // (end): the delete commit's own timestamp pins the same window
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSS").withZone(java.time.ZoneOffset.UTC)
    val ts1 = fmt.format(java.time.Instant
      .ofEpochMilli(gsql.table("ts_tbl").log.commitTimestamp(1)))
    val chTs = gsql.sql(
      s"TABLE CHANGES ts_tbl BETWEEN TIMESTAMP '$ts1' AND TIMESTAMP '$ts1'")
    assert(chTs.filter(col("_change_type") === "delete").count() == 50)
    assert(chTs.count() == 50)

    // ANALYZE TABLE persists stats; DELETE without WHERE empties
    gsql.sql("ANALYZE TABLE ts_tbl COMPUTE STATISTICS")
    assert(gsql.table("ts_tbl").snapshot.metadata.get.properties.keys
      .exists(_.startsWith("graft.stats.")))
    gsql.sql("DELETE FROM ts_tbl")
    assert(gsql.sql("SELECT COUNT(*) AS n FROM ts_tbl").head().getLong(0) == 0)
  }

  test("explicit-schema CREATE, named-column INSERT, IN-subquery DELETE") {
    val gsql = new GraftSql(spark)
    // CREATE TABLE (schema) USING graftlake LOCATION: empty, typed
    gsql.sql("CREATE TABLE regs (rid BIGINT, name STRING, score DOUBLE) " +
      s"USING graftlake LOCATION '${tmpDir("sql-create-schema")}'")
    assert(gsql.sql("SELECT COUNT(*) AS n FROM regs").head().getLong(0) == 0)
    assert(gsql.table("regs").snapshot.schema.fieldNames.toSeq ==
      Seq("rid", "name", "score"))

    // named-column INSERT: listed columns map positionally, omitted
    // column (score) inserts NULL
    gsql.sql("INSERT INTO regs (rid, name) VALUES (1, 'ada'), (2, 'bob'), (3, 'eve')")
    assert(gsql.sql("SELECT COUNT(*) AS n FROM regs").head().getLong(0) == 3)
    assert(gsql.sql("SELECT COUNT(*) AS n FROM regs WHERE score IS NULL")
      .head().getLong(0) == 3)
    // reordered column list still maps by name
    gsql.sql("INSERT INTO regs (name, score, rid) VALUES ('zoe', 9.5, 4)")
    assert(gsql.sql("SELECT score FROM regs WHERE rid = 4").head().getDouble(0) == 9.5)
    // omitted column with a declared default fills from the default
    gsql.sql("ALTER TABLE regs ALTER COLUMN score SET DEFAULT 1.5")
    gsql.sql("INSERT INTO regs (rid, name) VALUES (5, 'kim')")
    assert(gsql.sql("SELECT score FROM regs WHERE rid = 5").head().getDouble(0) == 1.5)
    // unknown column in the list refuses
    intercept[IllegalArgumentException](
      gsql.sql("INSERT INTO regs (rid, nope) VALUES (9, 'x')"))

    // IN-subquery DELETE: keyed anti-merge against the subquery result
    val other = spark.range(3, 10).select(col("id").as("rid"))
    other.createOrReplaceTempView("doomed")
    gsql.sql("DELETE FROM regs WHERE rid IN (SELECT rid FROM doomed)")
    assert(gsql.sql("SELECT rid FROM regs ORDER BY rid").collect()
      .map(_.getLong(0)).toSeq == Seq(1L, 2L))
    // subquery over a registered lake table works too
    gsql.sql("DELETE FROM regs WHERE rid IN (SELECT rid FROM regs WHERE name = 'bob')")
    assert(gsql.sql("SELECT rid FROM regs").collect().map(_.getLong(0)).toSeq == Seq(1L))

    // IN-subquery UPDATE: SET evaluates on the target row
    gsql.sql("INSERT INTO regs (rid, name, score) VALUES (6, 'pat', 2.0), (7, 'lee', 3.0)")
    spark.range(6, 8).select(col("id").as("rid")).createOrReplaceTempView("bump")
    gsql.sql("UPDATE regs SET score = score * 10 WHERE rid IN (SELECT rid FROM bump)")
    assert(gsql.sql("SELECT SUM(score) AS s FROM regs WHERE rid >= 6")
      .head().getDouble(0) == 50.0)
    assert(gsql.sql("SELECT score FROM regs WHERE rid = 1").head().isNullAt(0),
      "rows outside the key set must be untouched")
  }

  test("CREATE OR REPLACE, TRUNCATE, SHOW COLUMNS, DROP TABLE") {
    val gsql = new GraftSql(spark)
    val loc = tmpDir("sql-cort")
    gsql.sql(s"CREATE OR REPLACE TABLE facts LOCATION '$loc' AS " +
      "SELECT 1 AS k, 'one' AS v")
    assert(gsql.sql("SELECT COUNT(*) AS n FROM facts").head().getLong(0) == 1)
    // replace: new contents AND schema, same log (history grows)
    gsql.sql("CREATE OR REPLACE TABLE facts AS " +
      "SELECT 10 AS k, 2.5 AS score UNION ALL SELECT 20, 3.5")
    assert(gsql.sql("SELECT COUNT(*) AS n FROM facts").head().getLong(0) == 2)
    assert(gsql.table("facts").version >= 1, "replace must extend history")
    assert(gsql.table("facts").toDFAt(0).count() == 1,
      "pre-replace version stays time-travelable")
    // SHOW COLUMNS reflects the replaced schema
    val cols = gsql.sql("SHOW COLUMNS IN facts").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(cols == Seq("k" -> "int", "score" -> "decimal(2,1)"))
    // TRUNCATE: metadata-only (no rewrite), history preserved
    val m = gsql.sql("TRUNCATE TABLE facts").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(m("numRemovedFiles").toInt > 0)
    assert(gsql.sql("SELECT COUNT(*) AS n FROM facts").head().getLong(0) == 0)
    assert(gsql.table("facts").toDFAt(1).count() == 2,
      "truncate must not erase history")
    // DROP TABLE unregisters the name; data stays for re-registration
    gsql.sql("DROP TABLE facts")
    intercept[IllegalArgumentException](gsql.table("facts"))
    gsql.register("facts2", loc)
    assert(gsql.sql("SELECT COUNT(*) AS n FROM facts2").head().getLong(0) == 0)
  }

  test("CREATE / REFRESH MATERIALIZED VIEW statements") {
    val gsql = new GraftSql(spark)
    try {
      gsql.registerCreate("mvsrc", tmpDir("sql-mv-src"),
        graft.Tables(spark, sfDir, "lineitem")
          .select(col("l_orderkey"), col("l_returnflag"),
            round(col("l_quantity") * 100).cast("long").as("qty_c")).limit(300))
      gsql.sql(s"CREATE MATERIALIZED VIEW flag_stats LOCATION '${tmpDir("sql-mv")}' " +
        "AS SELECT l_returnflag, COUNT(*), SUM(qty_c) FROM mvsrc GROUP BY l_returnflag")
      // the view is queryable like a table and already materialized
      val n0 = gsql.sql("SELECT SUM(mv_count) AS n FROM flag_stats").head().getLong(0)
      assert(n0 == 300)
      // source DML + REFRESH folds the delta in
      gsql.sql("DELETE FROM mvsrc WHERE l_orderkey % 2 = 0")
      gsql.sql("REFRESH MATERIALIZED VIEW flag_stats")
      val n1 = gsql.sql("SELECT SUM(mv_count) AS n FROM flag_stats").head().getLong(0)
      assert(n1 == gsql.sql("SELECT COUNT(*) AS n FROM mvsrc").head().getLong(0))
      // AVG maintains as its sum + non-null count pair
      gsql.sql(s"CREATE MATERIALIZED VIEW flag_avg LOCATION '${tmpDir("sql-mv-avg")}' " +
        "AS SELECT l_returnflag, AVG(qty_c) FROM mvsrc GROUP BY l_returnflag")
      val avgGot = gsql.sql("SELECT l_returnflag, " +
          "CAST(mv_sum_qty_c AS DOUBLE) / mv_cnt_qty_c AS a FROM flag_avg ORDER BY l_returnflag")
        .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
      val avgExp = gsql.sql("SELECT l_returnflag, AVG(qty_c) AS a FROM mvsrc " +
          "GROUP BY l_returnflag ORDER BY l_returnflag")
        .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
      assert(avgGot == avgExp)
      // MIN/MAX maintain (insert-only fold + recompute-on-retract)
      gsql.sql(s"CREATE MATERIALIZED VIEW flag_mm LOCATION '${tmpDir("sql-mv-mm")}' " +
        "AS SELECT l_returnflag, MIN(qty_c), MAX(qty_c) FROM mvsrc GROUP BY l_returnflag")
      // delete rows holding the current max -> refresh must recompute
      gsql.sql("DELETE FROM mvsrc WHERE qty_c > 3000")
      gsql.sql("REFRESH MATERIALIZED VIEW flag_mm")
      val mmGot = gsql.sql("SELECT l_returnflag, mv_min_qty_c, mv_max_qty_c " +
          "FROM flag_mm ORDER BY l_returnflag")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      // the WHERE suppresses the L67 rewrite (filter below the agg), so
      // this truly recomputes from the source — qty_c is never NULL
      // here, so values are unchanged and the assertion is not circular
      val mmExp = gsql.sql("SELECT l_returnflag, MIN(qty_c) AS mn, MAX(qty_c) AS mx " +
          "FROM mvsrc WHERE qty_c IS NOT NULL GROUP BY l_returnflag ORDER BY l_returnflag")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      assert(mmGot == mmExp, "retract-recomputed min/max must match the source")
      // unmaintainable select list still refuses loudly
      intercept[IllegalArgumentException](
        gsql.sql(s"CREATE MATERIALIZED VIEW bad LOCATION '${tmpDir("sql-mv-bad")}' " +
          "AS SELECT l_returnflag, SUM(qty_c * 2) FROM mvsrc GROUP BY l_returnflag"))
    } finally graft.plans.MvCatalog.clear()
  }

  test("backtick-quoted registered names work in the maintenance grammar") {
    val gsql = new GraftSql(spark)
    gsql.registerCreate("my-sales", tmpDir("sql-bq"),
      graft.Tables(spark, sfDir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .repartition(6))
    val n0 = gsql.sql("SELECT COUNT(*) AS n FROM `my-sales`").head().getLong(0)
    assert(n0 > 0)
    val m = gsql.sql("OPTIMIZE `my-sales`")
    assert(m.columns.toSeq == Seq("metric", "value"))
    assert(gsql.sql("DESCRIBE HISTORY `my-sales`")
      .select("operation").collect().map(_.getString(0)).contains("OPTIMIZE"))
    gsql.sql("DELETE FROM `my-sales` WHERE o_orderkey % 2 = 0")
    val n1 = gsql.sql("SELECT COUNT(*) AS n FROM `my-sales`").head().getLong(0)
    assert(n1 < n0 && n1 > 0)
    // a quoted string literal containing a registered name is untouched
    val echo = gsql.sql("SELECT 'keep `my-sales` intact' AS s").head().getString(0)
    assert(echo == "keep `my-sales` intact")
  }
}
