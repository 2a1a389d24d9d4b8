package graft.lake

import graft.{GraftSparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Schema evolution, CHECK constraints, and in-place conversion. */
class EvolutionSpec extends GraftSparkSpec {

  private def li = Tables(spark, sfDir, "lineitem")

  test("mergeSchema append evolves the schema; old files read new column as null") {
    val t = GraftTable.create(spark, tmpDir("evo"), li.limit(100))
    val withExtra = li.limit(20).withColumn("quality_tier", lit("gold"))
    intercept[IllegalArgumentException](t.append(withExtra)) // strict append refuses
    t.append(withExtra, mergeSchema = true)
    val df = t.toDF
    assert(df.columns.contains("quality_tier"))
    assert(df.filter(col("quality_tier").isNull).count() == 100)
    assert(df.filter(col("quality_tier") === "gold").count() == 20)
    // incompatible type change still refused
    val badType = li.limit(5).withColumn("quality_tier", lit(1))
    intercept[IllegalArgumentException](t.append(badType, mergeSchema = true))
  }

  test("SET NOT NULL: stats-only validation, write enforcement, DROP relaxes") {
    val base = li.limit(200).select(col("l_orderkey"), col("l_returnflag"),
      when(col("l_orderkey") % 7 === 0, lit(null).cast("double"))
        .otherwise(col("l_quantity")).as("qty"))
    val t = GraftTable.create(spark, tmpDir("evo-nn"), base)
    // a column with existing NULLs refuses (counted via footer stats)
    val e = intercept[IllegalArgumentException](t.setNotNull("qty"))
    assert(e.getMessage.contains("existing rows are NULL"))
    // a clean column accepts — via the stats fast path: every active
    // file carries a nullCount, so no data scan is needed
    assert(t.snapshot.activeFiles.forall(
      _.stats.exists(_.nullCounts.contains("l_returnflag"))),
      "precondition: stats must cover the column for the stats-only path")
    t.setNotNull("l_returnflag")
    assert(!t.snapshot.schema("l_returnflag").nullable)
    // enforcement: a write carrying a NULL refuses loudly
    val bad = base.withColumn("l_returnflag",
      when(col("l_orderkey") % 3 === 0, lit(null).cast("string"))
        .otherwise(col("l_returnflag")))
    val e2 = intercept[IllegalArgumentException](t.append(bad))
    assert(e2.getMessage.contains("NOT NULL constraint on l_returnflag"))
    // clean writes still land; DROP NOT NULL relaxes enforcement
    t.append(base.limit(10))
    assert(t.toDF.count() == 210)
    t.dropNotNull("l_returnflag")
    assert(t.snapshot.schema("l_returnflag").nullable)
    t.append(bad.limit(21))
    assert(t.toDF.filter(col("l_returnflag").isNull).count() > 0)
  }

  test("SET NOT NULL after a masking delete: DV-excused nulls validate by scan") {
    val base = li.limit(100).select(col("l_orderkey"),
      when(col("l_orderkey") % 5 === 0, lit(null).cast("double"))
        .otherwise(col("l_quantity")).as("qty"))
    val t = GraftTable.create(spark, tmpDir("evo-nn-dv"), base)
    assert(base.filter(col("qty").isNull).count() > 0)
    // remove every NULL row via a deletion vector (stats now overcount)
    t.deleteMergeOnRead(col("qty").isNull)
    assert(t.snapshot.dvFiles.nonEmpty, "precondition: delete must be MoR")
    t.setNotNull("qty") // falls back to the scan and passes
    assert(!t.snapshot.schema("qty").nullable)
    // SQL spelling round-trips
    val gsql = new GraftSql(spark)
    gsql.register("nnt", t.path)
    gsql.sql("ALTER TABLE nnt ALTER COLUMN qty DROP NOT NULL")
    assert(t.snapshot.schema("qty").nullable)
    gsql.sql("ALTER TABLE nnt ALTER COLUMN qty SET NOT NULL")
    assert(!t.snapshot.schema("qty").nullable)
  }

  test("ADD COLUMN is metadata-only; DDL statements round-trip via SQL") {
    val path = tmpDir("addcol")
    val t = GraftTable.create(spark, path, li.limit(100))
    val filesBefore = t.snapshot.activeFiles.map(_.path).toSet
    val g = new GraftSql(spark)
    g.register("ac", path)
    g.sql("ALTER TABLE ac ADD COLUMN quality_tier STRING")
    assert(t.snapshot.activeFiles.map(_.path).toSet == filesBefore,
      "ADD COLUMN must not touch data files")
    assert(t.toDF.columns.contains("quality_tier"))
    assert(t.toDF.filter(col("quality_tier").isNull).count() == 100)
    intercept[IllegalArgumentException](t.addColumn("quality_tier",
      org.apache.spark.sql.types.StringType))
    // parenthesized-type and COLUMNS(...) forms parse too
    g.sql("ALTER TABLE ac ADD COLUMNS (price_dec DECIMAL(10,2))")
    assert(t.snapshot.schema("price_dec").dataType.simpleString == "decimal(10,2)")
    // appends may now carry the new column; old rows read null
    t.append(li.limit(10).withColumn("quality_tier", lit("gold"))
      .withColumn("price_dec", lit(1.5).cast("decimal(10,2)")))
    assert(t.toDF.filter(col("quality_tier") === "gold").count() == 10)

    // constraint DDL: add enforces on writes, drop stops enforcing
    g.sql("ALTER TABLE ac ADD CONSTRAINT qty_pos CHECK (l_quantity > 0)")
    val bad = t.toDF.limit(5).withColumn("l_quantity", lit(-1.0))
    intercept[IllegalArgumentException](t.append(bad))
    g.sql("ALTER TABLE ac DROP CONSTRAINT qty_pos")
    t.append(bad) // constraint gone
    assert(t.toDF.filter(col("l_quantity") < 0).count() == 5)

    // SET TBLPROPERTIES via SQL
    g.sql("ALTER TABLE ac SET TBLPROPERTIES ('graft.custom'='42', 'x'='y')")
    val props = t.snapshot.metadata.get.properties
    assert(props("graft.custom") == "42" && props("x") == "y")
  }

  test("rename column is metadata-only; reads, pruning, writes bridge the mapping") {
    val t = GraftTable.create(spark, tmpDir("rename"), li.limit(200))
    val filesBefore = t.snapshot.activeFiles.map(_.path).toSet
    val vBefore = t.version
    t.renameColumn("l_quantity", "qty")
    assert(t.version == vBefore + 1)
    assert(t.snapshot.activeFiles.map(_.path).toSet == filesBefore,
      "rename must not rewrite any data file")
    val df = t.toDF
    assert(df.columns.contains("qty") && !df.columns.contains("l_quantity"))
    val expectedSum = li.limit(200).agg(sum("l_quantity")).head.getDouble(0)
    assert(math.abs(df.agg(sum("qty")).head.getDouble(0) - expectedSum) < 1e-6)

    // stats pruning works against the new logical name
    val (kept, total) = t.pruneFiles(col("qty") < -1.0)
    assert(kept == 0 && total > 0, s"expected full skip, kept $kept/$total")

    // appends written under the mapping read back seamlessly
    t.append(df.limit(10))
    assert(t.toDF.count() == 210)
    assert(t.toDF.filter(col("qty").isNotNull).count() == 210)

    // time travel to a pre-rename version reads the OLD logical schema
    val preRename = t.toDFAt(0)
    assert(preRename.columns.contains("l_quantity") && !preRename.columns.contains("qty"))
    assert(preRename.count() == 200)

    // rename back to the physical name drops the mapping entry
    t.renameColumn("qty", "l_quantity")
    assert(t.snapshot.colMap.isEmpty)
    assert(t.toDF.filter(col("l_quantity").isNotNull).count() == 210)
  }

  test("drop column is metadata-only; optimize physically purges it") {
    val t = GraftTable.create(spark, tmpDir("dropcol"), li.limit(100).repartition(4))
    val filesBefore = t.snapshot.activeFiles.map(_.path).toSet
    assert(filesBefore.size >= 2, "need multiple files for optimize to compact")
    t.dropColumn("l_tax")
    assert(t.snapshot.activeFiles.map(_.path).toSet == filesBefore)
    assert(!t.toDF.columns.contains("l_tax"))
    assert(t.toDF.count() == 100)
    intercept[IllegalArgumentException](t.dropColumn("l_returnflag_missing"))
    // re-adding the dropped name is blocked while stale bytes remain —
    // old files would resurrect pre-drop values as the "new" column
    intercept[IllegalArgumentException] {
      t.append(li.limit(5).withColumn("l_tax", lit(0.5)), mergeSchema = true)
    }
    t.optimize(targetBytes = 1024L * 1024 * 1024)
    val physical = spark.read.parquet(
      t.snapshot.activeFiles.map(f => s"${t.path}/${f.path}"): _*)
    assert(!physical.columns.contains("l_tax"),
      "optimize rewrite must purge dropped columns")
    assert(t.toDF.count() == 100)
  }

  test("rename re-keys bloom/stats sidecars; reusing the old name sees no stale bloom") {
    val t = GraftTable.create(spark, tmpDir("rename-bloom"),
      li.limit(4000).repartition(6, col("l_orderkey")))
    t.computeBloomFilter("l_returnflag")
    t.computeStats()
    t.renameColumn("l_returnflag", "flag")
    val props = t.snapshot.metadata.get.properties
    assert(props.contains("graft.bloom.flag") && !props.contains("graft.bloom.l_returnflag"),
      "bloom sidecar pointer must follow the rename")
    assert(props.contains("graft.stats.flag") && !props.contains("graft.stats.l_returnflag"))
    // the re-keyed bloom still skips: physical values are unchanged
    val (kept, total) = t.pruneFiles(col("flag") === "B")
    assert(kept == 0 && total > 0, s"re-keyed bloom should skip all, kept $kept/$total")

    // a LATER rename reusing the old name must NOT inherit the old
    // column's bloom — it was built from different values and could
    // wrongly skip files that DO contain matching rows
    t.renameColumn("l_linestatus", "l_returnflag")
    assert(!t.snapshot.metadata.get.properties.contains("graft.bloom.l_returnflag"))
    val expected = li.limit(4000).filter(col("l_linestatus") === "F").count()
    assert(expected > 0)
    assert(t.readWhere(col("l_returnflag") === "F").count() == expected,
      "no stale bloom may hide rows of the renamed-in column")

    // drop clears the sidecars too
    t.dropColumn("flag")
    val afterDrop = t.snapshot.metadata.get.properties
    assert(!afterDrop.contains("graft.bloom.flag") && !afterDrop.contains("graft.stats.flag"))
  }

  test("mergeSchema rejects a new column colliding with a renamed column's physical name") {
    val t = GraftTable.create(spark, tmpDir("physcollide"), li.limit(50))
    t.renameColumn("l_shipdate", "ship_ts")
    // logical "ship_ts" is physically stored as "l_shipdate"; a new
    // logical "l_shipdate" would bind two logical columns to one
    // parquet name
    val bad = t.toDF.limit(5).withColumn("l_shipdate", lit("x"))
    intercept[IllegalArgumentException](t.append(bad, mergeSchema = true))
    // a non-colliding new column still evolves fine
    t.append(t.toDF.limit(5).withColumn("extra", lit(1)), mergeSchema = true)
    assert(t.toDF.columns.contains("extra"))
  }

  test("generated columns compute on append, reject divergent explicit values, regenerate on update") {
    import org.apache.spark.sql.types.DateType
    val seed = li.limit(50)
      .withColumn("ship_date", col("l_shipdate").cast(DateType))
    val t = GraftTable.create(spark, tmpDir("gencol"), seed, Seq("ship_date"))
    t.setTableProperties(Map(
      "graft.generated.ship_date" -> "CAST(l_shipdate AS DATE)"))
    t.append(li.limit(30)) // no ship_date column: generated
    assert(t.toDF.count() == 80)
    assert(t.toDF.filter(col("ship_date") =!= col("l_shipdate").cast(DateType))
      .count() == 0)
    // matching explicit values are accepted
    t.append(li.limit(10).withColumn("ship_date", col("l_shipdate").cast(DateType)))
    assert(t.toDF.count() == 90)
    // DIVERGENT explicit values are rejected (Delta parity): allowing
    // them would break the generated-column invariant that pruning
    // derives partition bounds from — silently wrong pruned reads
    intercept[IllegalArgumentException] {
      t.append(li.limit(10)
        .withColumn("ship_date", lit("1990-01-01").cast(DateType)))
    }
    assert(t.toDF.count() == 90)
    // UPDATE of the SOURCE column regenerates the generated column, so
    // rows move to the partition their new source value implies
    val newTs = lit("1990-06-15").cast(t.toDF.schema("l_shipdate").dataType)
    t.update(col("l_orderkey") >= 0, Map("l_shipdate" -> newTs))
    assert(t.toDF.filter(col("ship_date") =!= col("l_shipdate").cast(DateType))
      .count() == 0, "update must regenerate ship_date from the new l_shipdate")
    assert(t.toDF.filter(col("ship_date") === "1990-06-15").count() == 90)
  }

  test("identity columns allocate unique values past the mark; ALWAYS semantics; rewrites preserve") {
    val src = li.limit(40).select("l_orderkey", "l_quantity")
    val t = GraftTable.create(spark, tmpDir("identity"), src,
      properties = Map("graft.identity.row_seq" -> "100,2"))
    def ids(): Set[Long] =
      t.toDF.select("row_seq").collect().map(_.getLong(0)).toSet
    val ids0 = ids()
    assert(ids0.size == 40, "every row gets a distinct identity value")
    assert(ids0.forall(v => v >= 100 && (v - 100) % 2 == 0),
      "values start at `start` and respect the step")
    // second append allocates strictly past everything already written
    t.append(li.limit(25).select("l_orderkey", "l_quantity"))
    val ids1 = ids()
    assert(ids1.size == 65 && ids0.subsetOf(ids1))
    assert((ids1 -- ids0).min > ids0.max)
    // GENERATED ALWAYS: explicit values are refused
    intercept[IllegalArgumentException] {
      t.append(li.limit(5).select("l_orderkey", "l_quantity")
        .withColumn("row_seq", lit(1L)))
    }
    // layout rewrites carry materialized values unchanged
    t.optimize()
    assert(ids() == ids1, "OPTIMIZE must not reassign identity values")
    t.delete(col("row_seq") === ids1.max)
    assert(ids() == ids1 - ids1.max, "CoW DELETE preserves surviving ids")
    // the mark survives checkpointing: cross the checkpoint interval,
    // then allocate from a FRESH handle (snapshot seeded from parquet)
    (1 to 10).foreach(_ => t.append(li.limit(2).select("l_orderkey", "l_quantity")))
    val t2 = GraftTable.forPath(spark, t.path)
    t2.append(li.limit(3).select("l_orderkey", "l_quantity"))
    val fin = t2.toDF.select("row_seq").collect().map(_.getLong(0))
    assert(fin.length == fin.distinct.length, "no identity value reused after checkpoint replay")
    // streaming micro-batch epochs allocate through the same shaping
    t2.appendStreamBatch("idstream", 0L, li.limit(2).select("l_orderkey", "l_quantity"))
    val fin2 = t2.toDF.select("row_seq").collect().map(_.getLong(0))
    assert(fin2.length == fin.length + 2 && fin2.length == fin2.distinct.length,
      "streaming epoch must allocate fresh identity values")
    // negative step descends
    val d = GraftTable.create(spark, tmpDir("identity-desc"),
      li.limit(10).select("l_orderkey"),
      properties = Map("graft.identity.neg_seq" -> "0,-3"))
    val neg0 = d.toDF.select("neg_seq").collect().map(_.getLong(0)).toSet
    assert(neg0.size == 10 && neg0.forall(v => v <= 0 && v % 3 == 0))
    d.append(li.limit(4).select("l_orderkey"))
    val neg1 = d.toDF.select("neg_seq").collect().map(_.getLong(0)).toSet
    assert(neg1.size == 14 && (neg1 -- neg0).max < neg0.min,
      "negative step allocates strictly below the previous minimum")
  }

  test("type widening is metadata-only; mixed-width files read, prune, and update") {
    import spark.implicits._
    val path = tmpDir("widen")
    val t = GraftTable.create(spark, path,
      Seq((1, 1.5f, "a"), (2, 2.5f, "b"), (3, 3.5f, "c")).toDF("k", "x", "s"))
    val filesBefore = t.snapshot.activeFiles.map(_.path).toSet
    // disallowed changes refuse loudly
    intercept[IllegalArgumentException](
      t.alterColumnType("k", org.apache.spark.sql.types.ShortType))
    intercept[IllegalArgumentException](
      t.alterColumnType("s", org.apache.spark.sql.types.LongType))
    val g = new GraftSql(spark)
    g.register("wd", path)
    g.sql("ALTER TABLE wd ALTER COLUMN k TYPE BIGINT")
    t.alterColumnType("x", org.apache.spark.sql.types.DoubleType)
    // metadata-only: no file rewritten, schema widened
    assert(t.snapshot.activeFiles.map(_.path).toSet == filesBefore)
    assert(t.snapshot.schema("k").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(t.snapshot.schema("x").dataType ==
      org.apache.spark.sql.types.DoubleType)
    // old int32/float files decode through the widened schema, and a
    // new append writes values only the wide type can hold
    t.append(Seq((7000000000L, 9.25, "d")).toDF("k", "x", "s"))
    assert(t.toDF.agg(sum("k")).head.getLong(0) == 7000000006L)
    assert(t.toDF.filter(col("x") === 2.5d).count() == 1)
    // stats pruning still skips on the widened column across mixed files
    assert(t.readWhere(col("k") === 7000000000L).count() == 1)
    // DML reads old-width files and rewrites them at the new width
    t.update(col("k") === 2L, Map("x" -> lit(20.5d)))
    assert(t.toDF.filter(col("k") === 2L).select("x").head.getDouble(0) == 20.5)
    assert(t.toDF.count() == 4)
  }

  test("column defaults fill omitted columns; explicit values win; DROP DEFAULT reverts") {
    val path = tmpDir("defaults")
    val t = GraftTable.create(spark, path,
      li.limit(20).select("l_orderkey", "l_quantity").withColumn("tier", lit("gold")))
    val g = new GraftSql(spark)
    g.register("dft", path)
    g.sql("ALTER TABLE dft ALTER COLUMN tier SET DEFAULT 'standard'")
    t.append(li.limit(5).select("l_orderkey", "l_quantity")) // omitted → default
    assert(t.toDF.filter(col("tier") === "standard").count() == 5)
    // unlike generated columns: explicit values win, nothing re-validates
    t.append(li.limit(3).select("l_orderkey", "l_quantity")
      .withColumn("tier", lit("silver")))
    assert(t.toDF.filter(col("tier") === "silver").count() == 3)
    g.sql("ALTER TABLE dft ALTER COLUMN tier DROP DEFAULT")
    intercept[Exception](t.append(li.limit(2).select("l_orderkey", "l_quantity")))
    intercept[IllegalArgumentException](
      g.sql("ALTER TABLE dft ALTER COLUMN nope SET DEFAULT 1"))
  }

  test("generated-column partition pruning: raw-timestamp filters prune date partitions") {
    import org.apache.spark.sql.types.DateType
    val seed = li.limit(3000)
      .withColumn("ship_date", col("l_shipdate").cast(DateType))
    val t = GraftTable.create(spark, tmpDir("gencol-prune"), seed, Seq("ship_date"),
      properties = Map("graft.generated.ship_date" -> "CAST(l_shipdate AS DATE)"))
    assert(t.snapshot.numFiles > 3, "need several date partitions to observe pruning")
    // predicate ONLY on the raw timestamp — pruning must derive the
    // ship_date partition bound through the generation expression
    val cutoff = lit("2003-01-01").cast("timestamp")
    val (kept, total) = t.pruneFiles(col("l_shipdate") >= cutoff)
    assert(kept < total, s"generated-column pruning must drop partitions ($kept/$total)")
    // correctness: pruned read returns exactly the unpruned rows
    assert(t.readWhere(col("l_shipdate") >= cutoff).count() ==
      t.toDF.filter(col("l_shipdate") >= cutoff).count())
    // equality derives an equality partition bound
    val tsType = t.toDF.schema("l_shipdate").dataType
    val someDay = lit(t.toDF.select(col("l_shipdate").cast("string"))
      .head.getString(0)).cast(tsType)
    val (k2, t2) = t.pruneFiles(col("l_shipdate") === someDay)
    assert(k2 <= 2 && k2 < t2, s"equality on the source column should hit ~1 partition ($k2/$t2)")
    assert(t.readWhere(col("l_shipdate") === someDay).count() ==
      t.toDF.filter(col("l_shipdate") === someDay).count())

    // year(src) generation also derives bounds
    val t3 = GraftTable.create(spark, tmpDir("gencol-prune-yr"),
      li.limit(3000).withColumn("ship_year", year(col("l_shipdate"))),
      Seq("ship_year"),
      properties = Map("graft.generated.ship_year" -> "year(l_shipdate)"))
    val (k3, t3n) = t3.pruneFiles(col("l_shipdate") < lit("2001-01-01").cast("timestamp"))
    assert(k3 < t3n, s"year() generation must prune year partitions ($k3/$t3n)")
    assert(t3.readWhere(col("l_shipdate") < lit("2001-01-01").cast("timestamp")).count() ==
      t3.toDF.filter(col("l_shipdate") < lit("2001-01-01").cast("timestamp")).count())
  }

  test("OPTIMIZE WHERE compacts only matching partitions") {
    val t = GraftTable.create(spark, tmpDir("optwhere"),
      li.limit(2000), Seq("l_returnflag"))
    (1 to 2).foreach(_ => t.append(li.limit(2000)))
    def filesFor(flag: String) = t.snapshot.activeFiles
      .count(_.partitionValues.get("l_returnflag").contains(flag))
    val rBefore = filesFor("R")
    val aBefore = filesFor("A")
    assert(rBefore >= 2 && aBefore >= 2)
    val g = new GraftSql(spark)
    g.register("tw", t.path)
    g.sql("OPTIMIZE tw WHERE l_returnflag = 'R'")
    assert(filesFor("R") == 1, s"R should compact, have ${filesFor("R")}")
    assert(filesFor("A") == aBefore, "A partition must be untouched")
    assert(t.toDF.count() == 3 * 2000)

    // scoped ZORDER: only the matching partition's files are rewritten
    val nBefore = filesFor("N")
    assert(nBefore >= 2)
    val aPathsBefore = t.snapshot.activeFiles
      .filter(_.partitionValues.get("l_returnflag").contains("A")).map(_.path).toSet
    g.sql("OPTIMIZE tw ZORDER BY (l_orderkey) WHERE l_returnflag = 'N'")
    val aPathsAfter = t.snapshot.activeFiles
      .filter(_.partitionValues.get("l_returnflag").contains("A")).map(_.path).toSet
    assert(aPathsAfter == aPathsBefore, "unscoped partitions must keep their files")
    assert(t.toDF.count() == 3 * 2000)
  }

  test("CHECK constraint rejects violating writes and bad constraint adds") {
    val t = GraftTable.create(spark, tmpDir("constr"), li.limit(100))
    t.addConstraint("positive_qty", "l_quantity > 0")
    // a violating batch is rejected atomically — no partial commit
    val vBefore = t.version
    val bad = li.limit(10).withColumn("l_quantity", lit(-5.0))
    intercept[IllegalArgumentException](t.append(bad))
    assert(t.version == vBefore)
    t.append(li.limit(10)) // valid rows still flow
    assert(t.toDF.count() == 110)
    // cannot add a constraint existing data violates
    intercept[IllegalArgumentException](
      t.addConstraint("impossible", "l_quantity > 1000000"))
  }

  test("changesBetween reports inserts and deletes across versions") {
    val t = GraftTable.create(spark, tmpDir("cdf"), li.limit(100))
    t.delete(col("l_linenumber") === 1)               // v1: deletes
    t.append(li.limit(10))                            // v2: inserts
    val changes = t.changesBetween(0, 2)
    val byType = changes.groupBy("_change_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val deleted = li.limit(100).filter(col("l_linenumber") === 1).count()
    // the 10 re-appended rows overlap rows already present; exceptAll
    // is multiset-aware so they surface as net inserts
    assert(byType.getOrElse("delete", 0L) >= deleted - 10)
    assert(byType.getOrElse("insert", 0L) >= 1)
    assert(t.toDFAt(0).count() - byType("delete") + byType("insert") == t.toDF.count())
  }

  test("DESCRIBE EXTENDED surfaces the VORDER property after OPTIMIZE VORDER") {
    val gsql = new GraftSql(spark)
    gsql.registerCreate("ext", tmpDir("ext"), li.limit(200).repartition(6))
    val before = gsql.sql("DESCRIBE EXTENDED ext")
      .collect().map(_.getString(0))
    assert(!before.contains("graft.vorder"))
    gsql.sql("OPTIMIZE ext VORDER")
    val after = gsql.sql("DESCRIBE EXTENDED ext")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(after.get("graft.vorder").contains("true"))
    assert(after.contains("l_orderkey")) // schema rows present too
  }

  test("stats collection caps at 32 columns, session conf overrides and gates") {
    // 40-column table: ANALYZE must scan only the first 32 (Fabric's
    // extended-stats cap), never all of a wide schema
    val wide = li.limit(50).select(
      (Seq(col("l_orderkey")) ++
        (1 to 39).map(i => (col("l_partkey") + i).as(s"c$i"))): _*)
    val t = GraftTable.create(spark, tmpDir("stats-cap"), wide)
    t.computeStats()
    def statCols = t.snapshot.metadata.get.properties.keys
      .filter(_.startsWith("graft.stats.")).toSeq
    assert(statCols.size == 32, s"expected 32 capped stat columns, got ${statCols.size}")

    // session override widens (or narrows) the cap
    spark.conf.set("spark.graft.stats.maxColumns", "5")
    try {
      val t2 = GraftTable.create(spark, tmpDir("stats-cap5"), wide)
      t2.computeStats()
      val n = t2.snapshot.metadata.get.properties.keys
        .count(_.startsWith("graft.stats."))
      assert(n == 5, s"expected 5 stat columns under the override, got $n")
    } finally spark.conf.unset("spark.graft.stats.maxColumns")

    // session kill-switch: auto-collect table property respected only
    // when the session allows it
    val t3 = GraftTable.create(spark, tmpDir("stats-gate"), li.limit(50),
      properties = Map("graft.stats.autoCollect" -> "true"))
    // NB: the autoCollect switch itself lives under the graft.stats.
    // prefix — exclude it when counting collected columns
    def collected = t3.snapshot.metadata.get.properties.keys
      .filter(k => k.startsWith("graft.stats.") && k != "graft.stats.autoCollect")
    spark.conf.set("spark.graft.stats.autoCollect.enabled", "false")
    try {
      t3.append(li.limit(10))
      assert(collected.isEmpty,
        "session-disabled auto-collect must not write stats")
    } finally spark.conf.unset("spark.graft.stats.autoCollect.enabled")
    t3.append(li.limit(10))
    assert(collected.nonEmpty, "re-enabled session collects on the next write")
  }

  test("history reads only retained commits and paginates") {
    val t = GraftTable.create(spark, tmpDir("hist-win"), li.limit(20))
    (1 to 24).foreach(_ => t.append(li.limit(1)))
    assert(t.version == 24)
    t.cleanupLogs()
    val kept = t.log.listVersions()
    assert(kept.head > 0, "cleanup must drop early commits")
    val h = t.history.select("version").collect().map(_.getLong(0)).sorted
    assert(h.sameElements(kept), "history rows = retained commit files")
    val page = t.history(3).select("version").collect().map(_.getLong(0)).sorted
    assert(page.sameElements(kept.takeRight(3)), "history(3) = newest 3 retained")
  }

  test("convert adopts an existing partitioned parquet dir without rewrite") {
    val dir = tmpDir("convert")
    li.write.partitionBy("l_returnflag").parquet(dir)
    val filesBefore = {
      import scala.jdk.CollectionConverters._
      val w = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      try w.iterator().asScala.count(p =>
        p.getFileName.toString.endsWith(".parquet")) finally w.close()
    }
    val t = GraftTable.convert(spark, dir, partitionColumns = Seq("l_returnflag"))
    assert(t.toDF.count() == li.count())
    assert(t.snapshot.numFiles == filesBefore) // adopted, not rewritten
    // converted table is fully operational: pruning + DML
    val (kept, total) = t.pruneFiles(col("l_returnflag") === "R")
    assert(kept < total)
    t.delete(col("l_returnflag") === "R")
    assert(t.toDF.filter(col("l_returnflag") === "R").count() == 0)
  }

  test("NOT NULL refuses a mergeSchema append that omits the column") {
    import spark.implicits._
    val t = GraftTable.create(spark, tmpDir("nn-omit"),
      (1 to 10).map(i => (i.toLong, i * 2L)).toDF("k", "c"))
    t.setNotNull("c")
    // a frame missing c would read back NULL in a NOT NULL column
    val e = intercept[IllegalArgumentException] {
      t.append((11 to 15).map(i => Tuple1(i.toLong)).toDF("k"),
        mergeSchema = true)
    }
    assert(e.getMessage.contains("omit the column"))
    assert(t.toDF.count() == 10, "the refused append must not commit")
    // with a column default declared, the omitted column fills -> fine
    t.setTableProperties(Map("graft.default.c" -> "0"))
    t.append((11 to 15).map(i => Tuple1(i.toLong)).toDF("k"), mergeSchema = true)
    assert(t.toDF.count() == 15)
    assert(t.toDF.filter(col("c").isNull).count() == 0)
  }

  test("SET NOT NULL after renames reads the RIGHT column's stats") {
    import spark.implicits._
    // v carries nulls, x does not; after v->w and x->v, the NAME v
    // denotes the clean column and w the nullful one — a logical-name
    // stats lookup would cross them
    val df = (1 to 30).map(i =>
      (i.toLong, if (i % 5 == 0) None else Some(i.toLong), i * 7L))
      .toDF("k", "v", "x")
    val t = GraftTable.create(spark, tmpDir("nn-rename"), df)
    t.renameColumn("v", "w")
    t.renameColumn("x", "v")
    t.setNotNull("v") // old x: no nulls -> must succeed
    val e = intercept[IllegalArgumentException](t.setNotNull("w"))
    assert(e.getMessage.contains("existing rows are NULL"),
      "the nullful renamed column must refuse")
  }

  test("informational PK/FK: metadata-only, PK feeds exact CBO selectivity") {
    import spark.implicits._
    val dim = GraftTable.create(spark, tmpDir("pk-dim"),
      (1L to 100L).map(k => (k, s"n$k")).toDF("k", "nm"))
    val fact = GraftTable.create(spark, tmpDir("pk-fact"),
      (1 to 400).map(i => (i.toLong % 100 + 1, i.toLong)).toDF("k", "v"))
    val gsql = new GraftSql(spark)
    gsql.register("pdim", dim.path); gsql.register("pfact", fact.path)
    gsql.sql("ALTER TABLE pdim ADD CONSTRAINT dim_pk PRIMARY KEY (k) NOT ENFORCED")
    gsql.sql("ALTER TABLE pfact ADD CONSTRAINT fact_fk FOREIGN KEY (k) " +
      "REFERENCES pdim (k) NOT ENFORCED")
    val dprops = dim.snapshot.metadata.get.properties
    assert(dprops("graft.pk") == "dim_pk:k")
    val fprops = fact.snapshot.metadata.get.properties
    assert(fprops("graft.fk.fact_fk") == s"k>${dim.path}:k")
    // PK selectivity is exact 1/rows with NO ANALYZE having run
    assert(Cbo.equalitySelectivity(dim, "k").contains(1.0 / 100),
      "a declared PK must yield exact selectivity from footer stats")
    // writes are NOT validated (informational contract)
    dim.append(Seq((1L, "dup")).toDF("k", "nm"))
    assert(dim.toDF.count() == 101)
    // a second PK refuses; DROP CONSTRAINT removes by name
    intercept[IllegalArgumentException](dim.addPrimaryKey("again", Seq("nm")))
    // SHOW CREATE renders both as re-runnable constraint clauses
    val ddl = gsql.sql("SHOW CREATE TABLE pfact").collect()(0).getString(0)
    assert(ddl.contains("CONSTRAINT fact_fk FOREIGN KEY (k) REFERENCES"),
      s"FK clause missing from: $ddl")
    val dimDdl = gsql.sql("SHOW CREATE TABLE pdim").collect()(0).getString(0)
    assert(dimDdl.contains("CONSTRAINT dim_pk PRIMARY KEY (k) NOT ENFORCED"))
    gsql.sql("ALTER TABLE pdim DROP CONSTRAINT dim_pk")
    assert(!dim.snapshot.metadata.get.properties.contains("graft.pk"))
    gsql.sql("ALTER TABLE pfact DROP CONSTRAINT fact_fk")
    assert(!fact.snapshot.metadata.get.properties.contains("graft.fk.fact_fk"))
  }
}
