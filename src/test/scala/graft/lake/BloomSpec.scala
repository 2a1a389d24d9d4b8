package graft.lake

import graft.{GraftSparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Bloom-filter file skipping: point lookups on a high-cardinality key
  * where min/max stats can't exclude anything (SURVEY §2.1 L30).
  */
class BloomSpec extends GraftSparkSpec {

  private def li = Tables(spark, sfDir, "lineitem")

  test("bloom skipping prunes files min/max can't, result stays exact") {
    // hash-distribute so every file's orderkey range overlaps fully:
    // min/max stats are useless, a specific key lives in ~1 file
    val t = GraftTable.create(spark, tmpDir("bloom"),
      li.repartition(8, col("l_orderkey")))
    assert(t.snapshot.numFiles >= 4)
    // mid-range key: every file's [min,max] covers it, only bloom helps
    val keys = li.select("l_orderkey").distinct().orderBy("l_orderkey")
      .collect().map(_.getLong(0))
    val key = keys(keys.length / 2)
    val pred = col("l_orderkey") === key

    val (keptBefore, total) = t.pruneFiles(pred)
    assert(keptBefore == total, "min/max alone must not prune hash-distributed files")

    t.computeBloomFilter("l_orderkey")
    val (keptAfter, _) = t.pruneFiles(pred)
    assert(keptAfter < total, s"bloom should skip files, kept $keptAfter/$total")

    val expected = li.filter(pred).count()
    assert(t.readWhere(pred).count() == expected)
    assert(expected > 0)

    // IN-lists prune too: a file survives if ANY value might be in it
    val key2 = keys(keys.length / 3)
    val inPred = col("l_orderkey").isin(key, key2)
    val (keptIn, totalIn) = t.pruneFiles(inPred)
    assert(keptIn < totalIn, s"IN-list bloom should skip, kept $keptIn/$totalIn")
    assert(t.readWhere(inPred).count() == li.filter(inPred).count())
  }

  test("bloom probes evaluate task-side, scoped to candidate files only") {
    val t = GraftTable.create(spark, tmpDir("bloom-scoped"),
      li.repartition(8, col("l_orderkey")))
    t.computeBloomFilter("l_orderkey")
    val rel = t.snapshot.metadata.map(_.properties).getOrElse(Map.empty)
      .apply("graft.bloom.l_orderkey")
    // Plant a sidecar row for a path that is NOT a read candidate whose
    // bytes are not a serialized bloom. The distributed read path scopes
    // to candidate files before deserializing, so this row is never
    // touched; the old driver path (collect the WHOLE sidecar into a
    // Map) would throw deserializing it — this is the regression guard
    // that the ~100 GB-at-design-point artifact stays out of the driver.
    import spark.implicits._
    Seq(("not-an-active-file.parquet", Array[Byte](1, 2, 3)))
      .toDF("file_path", "bloom")
      .write.mode("append").parquet(s"${t.path}/$rel")
    val keys = li.select("l_orderkey").distinct().orderBy("l_orderkey")
      .collect().map(_.getLong(0))
    val key = keys(keys.length / 2)
    val (kept, total) = t.pruneFiles(col("l_orderkey") === key)
    assert(kept < total, s"bloom should still skip files, kept $kept/$total")
    assert(t.readWhere(col("l_orderkey") === key).count() ==
      li.filter(col("l_orderkey") === key).count())
  }

  test("bloom on a string column; rewritten files fall back to kept") {
    val t = GraftTable.create(spark, tmpDir("bloom-str"),
      li.limit(4000).repartition(6, col("l_orderkey")))
    t.computeBloomFilter("l_returnflag") // low cardinality: every file has all values
    val (keptAll, totalAll) = t.pruneFiles(col("l_returnflag") === "R")
    assert(keptAll == totalAll, "value present everywhere must keep all files")

    // an absent value INSIDE the min/max range ("A".."R"): only the
    // bloom can prove exclusion
    val (keptNone, _) = t.pruneFiles(col("l_returnflag") === "B")
    assert(keptNone == 0, s"absent value should skip all files, kept $keptNone")

    // optimize rewrites files -> stale sidecar entries; files are kept
    t.optimize(targetBytes = 1024L * 1024 * 1024)
    val (keptStale, totalStale) = t.pruneFiles(col("l_returnflag") === "B")
    assert(keptStale == totalStale, "rewritten files without bloom entries stay kept")
    assert(t.readWhere(col("l_returnflag") === "R").count() ==
      li.limit(4000).filter(col("l_returnflag") === "R").count())

    // opt-in auto-recompute restores skipping right after a compaction
    t.setTableProperties(Map("graft.bloomAutoRecompute" -> "true"))
    t.append(li.limit(500))
    t.append(li.limit(500))
    t.optimize(targetBytes = 1024L * 1024 * 1024)
    val (keptFresh, totalFresh) = t.pruneFiles(col("l_returnflag") === "B")
    assert(keptFresh == 0, s"recomputed blooms should skip all, kept $keptFresh/$totalFresh")
    assert(t.readWhere(col("l_returnflag") === "R").count() ==
      li.limit(4000).unionAll(li.limit(500)).unionAll(li.limit(500))
        .filter(col("l_returnflag") === "R").count())
  }
}
