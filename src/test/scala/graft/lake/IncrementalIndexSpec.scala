package graft.lake

import graft.GraftSparkSpec
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental maintenance of the materialized ANN/dedup indexes:
  * a version-stamped sidecar catches up with the table through the
  * change feed instead of re-encoding the corpus —
  *  - append-only windows encode exactly the inserted rows (O(delta));
  *  - layout-only windows (OPTIMIZE/ZORDER compaction) restamp the
  *    fingerprint with zero data work, because index rows are keyed
  *    by id, not file;
  *  - delete/update windows re-derive the dirty ids from the current
  *    table and carry every untouched row over (exact under
  *    duplicate ids);
  *  - windows past the exact-diff fallback budget fall back to a
  *    full rebuild.
  * PQ codebooks and IVF centroids are FROZEN across incremental
  * refreshes (FAISS `add` semantics), so old artifacts stay valid
  * by construction.
  */
class IncrementalIndexSpec extends GraftSparkSpec {

  private def docsDf(spark: SparkSession, ids: Seq[Long]): DataFrame = {
    import spark.implicits._
    ids.map(i => (i, s"document body number $i with shared tail content " +
      s"and per-doc salt ${i * 31}")).toDF("doc_id", "text")
  }

  private def sessionSigs(t: GraftTable): Set[(Long, Seq[Long])] = {
    graft.functions.GraftFunctions.register(spark)
    t.toDF.select(col("doc_id").cast("long").as("id"),
        expr("graft_minhash32(text)").as("sig"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toSet
  }

  private def storedSigs(t: GraftTable): Set[(Long, Seq[Long])] =
    t.minhashSigs("text").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1))).toSet

  private def ops(t: GraftTable, op: String): Long =
    t.history.filter(col("operation") === op).count()

  test("minhash: append-only window encodes only the delta; reads union parts") {
    val t = GraftTable.create(spark, tmpDir("incidx-mh-append"),
      docsDf(spark, 0L until 40L),
      properties = Map("graft.minhash.index" -> "doc_id,text"))
    t.optimize()
    assert(ops(t, "BUILD MINHASH INDEX") == 1)
    t.append(docsDf(spark, 40L until 55L))
    t.optimize()
    assert(ops(t, "BUILD MINHASH INDEX") == 1, "append must not trigger a full rebuild")
    assert(ops(t, "REFRESH MINHASH INDEX") == 1)
    val refresh = t.history.filter(col("operation") === "REFRESH MINHASH INDEX")
      .select("metrics").head.getString(0)
    assert(refresh.contains("numInserted=15") && refresh.contains("numRemoved=0"))
    val props = t.snapshot.metadata.get.properties
    assert(props("graft.minhash.text.deltas").nonEmpty,
      "append refresh must record a delta part")
    assert(storedSigs(t) == sessionSigs(t),
      "union of base + delta parts must equal a fresh full signing")
    // settled: a further OPTIMIZE with no changes is a no-op
    t.optimize()
    assert(ops(t, "REFRESH MINHASH INDEX") == 1)
  }

  test("minhash: layout-only window restamps without touching sidecar parts") {
    val t = GraftTable.create(spark, tmpDir("incidx-mh-restamp"),
      docsDf(spark, 0L until 30L),
      properties = Map("graft.minhash.index" -> "doc_id,text"))
    t.optimize()
    val relBefore = t.snapshot.metadata.get.properties("graft.minhash.text.sidecar")
    // a pure layout rewrite: zorder rewrites files dataChange=false,
    // which invalidates the file-set fingerprint but moves no rows
    t.zorderBy(128L * 1024 * 1024, "doc_id")
    t.optimize()
    val props = t.snapshot.metadata.get.properties
    assert(props("graft.minhash.text.sidecar") == relBefore,
      "restamp must keep the existing base part")
    assert(props("graft.minhash.text.deltas").isEmpty,
      "restamp must not write a delta part")
    val refresh = t.history.filter(col("operation") === "REFRESH MINHASH INDEX")
      .select("parameters").head.getString(0)
    assert(refresh.contains("mode=restamp"),
      "compaction must not re-encode id-keyed index rows")
    assert(storedSigs(t) == sessionSigs(t))
  }

  test("minhash: delete and update windows consolidate dirty ids exactly") {
    val t = GraftTable.create(spark, tmpDir("incidx-mh-dml"),
      docsDf(spark, 0L until 30L),
      properties = Map("graft.minhash.index" -> "doc_id,text"))
    t.optimize()
    t.append(docsDf(spark, 30L until 35L))
    t.optimize() // delta part accumulates
    assert(t.snapshot.metadata.get.properties("graft.minhash.text.deltas").nonEmpty)
    t.delete(col("doc_id") % 5 === 0)
    t.update(col("doc_id") === 7,
      Map("text" -> lit("rewritten body for the updated doc")))
    t.optimize()
    assert(ops(t, "BUILD MINHASH INDEX") == 1,
      "a two-version DML window must stay incremental")
    val props = t.snapshot.metadata.get.properties
    assert(props("graft.minhash.text.deltas").isEmpty,
      "consolidation must fold delta parts back into one base")
    val stored = storedSigs(t)
    assert(stored == sessionSigs(t),
      "consolidated sigs must equal a fresh full signing of the current rows")
    assert(!stored.exists(_._1 % 5 == 0), "deleted ids must leave the index")
  }

  test("minhash: a CDF-enabled DML window catches up from CDC sidecars") {
    // with graft.cdf=true the update's pre/post images come from the
    // commit's CDC sidecar — O(delta), no per-version snapshot diff —
    // and update_preimage/update_postimage rows drive the dirty set
    val t = GraftTable.create(spark, tmpDir("incidx-mh-cdf"),
      docsDf(spark, 0L until 30L),
      properties = Map("graft.minhash.index" -> "doc_id,text",
        "graft.cdf" -> "true"))
    t.optimize()
    t.update(col("doc_id") === 11,
      Map("text" -> lit("cdf-rewritten body")))
    t.delete(col("doc_id") === 12)
    t.optimize()
    assert(ops(t, "BUILD MINHASH INDEX") == 1,
      "CDC windows must stay incremental")
    assert(ops(t, "REFRESH MINHASH INDEX") == 1)
    val stored = storedSigs(t)
    assert(stored == sessionSigs(t),
      "CDC-driven consolidation must equal a fresh full signing")
    assert(!stored.exists(_._1 == 12L))
  }

  test("minhash: windows past the diff-fallback budget take a full rebuild") {
    val t = GraftTable.create(spark, tmpDir("incidx-mh-budget"),
      docsDf(spark, 0L until 40L),
      properties = Map("graft.minhash.index" -> "doc_id,text"))
    t.optimize()
    // each CoW delete (no CDF) is one exact-diff fallback version;
    // MaxDiffFallbackVersions+1 of them tips the cost balance
    (0 until 5).foreach(i => t.delete(col("doc_id") === i))
    t.optimize()
    assert(ops(t, "BUILD MINHASH INDEX") == 2,
      "a long non-CDC DML window must fall back to a full rebuild")
    assert(storedSigs(t) == sessionSigs(t))
  }

  test("delta parts are capped: long ingest runs consolidate instead of accumulating") {
    val t = GraftTable.create(spark, tmpDir("incidx-mh-cap"),
      docsDf(spark, 0L until 10L),
      properties = Map("graft.minhash.index" -> "doc_id,text"))
    t.optimize()
    def deltaCount = t.snapshot.metadata.get.properties("graft.minhash.text.deltas")
      .split(",").count(_.nonEmpty)
    (0 until GraftTable.MaxIndexDeltaParts + 2).foreach { i =>
      t.append(docsDf(spark, 1000L + i * 2 until 1000L + i * 2 + 2))
      t.optimize()
      assert(deltaCount <= GraftTable.MaxIndexDeltaParts,
        "reader fan-in must stay bounded under micro-batch ingest")
    }
    assert(t.history.filter(col("operation") === "REFRESH MINHASH INDEX")
      .filter(col("parameters").contains("mode=consolidate")).count() >= 1,
      "the cap must have forced at least one consolidation")
    assert(ops(t, "BUILD MINHASH INDEX") == 1, "never a full re-sign")
    assert(storedSigs(t) == sessionSigs(t))
  }

  test("a log-cleaned catch-up window falls back to a full rebuild, not a crash") {
    val t = GraftTable.create(spark, tmpDir("incidx-mh-cleaned"),
      docsDf(spark, 0L until 30L),
      properties = Map("graft.minhash.index" -> "doc_id,text"))
    t.optimize()
    // enough commits to cross a checkpoint, then reclaim the window's
    // JSONs — the change feed can no longer replay (stamped, cur]
    (0 until 12).foreach(i => t.append(docsDf(spark, 100L + i * 10 until 100L + i * 10 + 5)))
    t.log.cleanupLogs()
    // the original BUILD's commit is itself cleaned: history now shows
    // only post-cleanup ops, so count NEW maintenance entries from zero
    assert(ops(t, "BUILD MINHASH INDEX") == 0)
    t.optimize()
    assert(ops(t, "BUILD MINHASH INDEX") == 1,
      "an unreadable window must take the full rebuild")
    assert(ops(t, "REFRESH MINHASH INDEX") == 0,
      "the change feed cannot catch up over reclaimed commits")
    assert(storedSigs(t) == sessionSigs(t))
  }

  test("vacuum spares delta parts; unreferenced part dirs are invisible to readers") {
    val t = GraftTable.create(spark, tmpDir("incidx-mh-vacuum"),
      docsDf(spark, 0L until 25L),
      properties = Map("graft.minhash.index" -> "doc_id,text"))
    t.optimize()
    t.append(docsDf(spark, 25L until 30L))
    t.optimize()
    val props = t.snapshot.metadata.get.properties
    val delta = props("graft.minhash.text.deltas")
    t.vacuum(0.0, dryRun = false)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(t.path, delta, "sigs")),
      "vacuum must spare live delta parts")
    // a part dir never referenced by properties (e.g. a crashed
    // refresh's leftovers) is invisible: readers union referenced
    // parts only
    val before = storedSigs(t)
    docsDf(spark, 900L until 905L)
      .select(col("doc_id").as("id"), expr("graft_minhash32(text)").as("sig"))
      .write.parquet(s"${t.path}/_graft_minhash/text-delta-orphan/sigs")
    assert(storedSigs(t) == before, "unreferenced parts must not be read")
  }

  private def embDf(spark: SparkSession, ids: Seq[Long]): DataFrame = {
    import spark.implicits._
    val dim = 64
    ids.map { i =>
      (i, (0 until dim).map(j => (math.sin(i * 0.7 + j * 1.3) * 2).toFloat).toArray)
    }.toDF("vec_id", "embedding")
  }

  test("pq: incremental append freezes the codebooks and encodes only new rows") {
    import org.apache.spark.sql.GraftSqlShims
    val t = GraftTable.create(spark, tmpDir("incidx-pq"),
      embDf(spark, 0L until 80L),
      properties = Map("graft.pq.index" -> "vec_id,embedding"))
    t.optimize()
    val propsBefore = t.snapshot.metadata.get.properties
    val booksBefore = propsBefore("graft.pq.embedding.books")
    val codesBefore = t.pqCodes("embedding").collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1).toSeq)).toMap
    t.append(embDf(spark, 80L until 95L))
    t.optimize()
    assert(ops(t, "BUILD PQ INDEX") == 1 && ops(t, "REFRESH PQ INDEX") == 1)
    val props = t.snapshot.metadata.get.properties
    assert(props("graft.pq.embedding.books") == booksBefore,
      "codebooks must stay frozen across an incremental refresh")
    val codes = t.pqCodes("embedding").collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1).toSeq)).toMap
    assert(codes.size == 95)
    codesBefore.foreach { case (id, c) =>
      assert(codes(id) == c, s"existing code for id=$id must be bit-unchanged")
    }
    // new rows encode against the STORED books — replay the encode
    val books = graft.operators.PqCodebook.decodeBooks(booksBefore)
    val expected = embDf(spark, 80L until 95L)
      .select(col("vec_id").cast("long").as("id"),
        GraftSqlShims.column(graft.functions.PqEncode(
          GraftSqlShims.expression(col("embedding")), books)).as("codes"))
      .collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1).toSeq)).toMap
    expected.foreach { case (id, c) => assert(codes(id) == c) }
  }

  test("sq: incremental append freezes the scales and encodes only new rows") {
    import org.apache.spark.sql.GraftSqlShims
    val t = GraftTable.create(spark, tmpDir("incidx-sq"),
      embDf(spark, 0L until 70L),
      properties = Map("graft.sq.index" -> "vec_id,embedding"))
    t.optimize()
    val scalesBefore = t.snapshot.metadata.get.properties("graft.sq.embedding.scales")
    val codesBefore = t.sqCodes("embedding").collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1).toSeq)).toMap
    t.append(embDf(spark, 70L until 82L))
    t.optimize()
    assert(ops(t, "BUILD SQ INDEX") == 1 && ops(t, "REFRESH SQ INDEX") == 1)
    val props = t.snapshot.metadata.get.properties
    assert(props("graft.sq.embedding.scales") == scalesBefore,
      "scales must stay frozen across an incremental refresh")
    val codes = t.sqCodes("embedding").collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1).toSeq)).toMap
    assert(codes.size == 82)
    codesBefore.foreach { case (id, c) => assert(codes(id) == c) }
    val smax = scalesBefore.split(",").map(_.toLong)
    val expected = embDf(spark, 70L until 82L)
      .select(col("vec_id").cast("long").as("id"),
        GraftSqlShims.column(graft.functions.SqEncode(
          GraftSqlShims.expression(col("embedding")), smax)).as("codes"))
      .collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1).toSeq)).toMap
    expected.foreach { case (id, c) => assert(codes(id) == c) }
  }

  test("ivf: incremental append assigns new rows against the frozen centroids") {
    val t = GraftTable.create(spark, tmpDir("incidx-ivf"),
      embDf(spark, 0L until 80L),
      properties = Map("graft.ivf.index" -> "vec_id,embedding"))
    t.optimize()
    val propsBefore = t.snapshot.metadata.get.properties
    val kBefore = propsBefore("graft.ivf.embedding.k")
    val baseRel = propsBefore("graft.ivf.embedding.sidecar")
    val assignBefore = t.ivfAssignments("embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    t.append(embDf(spark, 80L until 95L))
    t.optimize()
    assert(ops(t, "BUILD IVF INDEX") == 1 && ops(t, "REFRESH IVF INDEX") == 1)
    val props = t.snapshot.metadata.get.properties
    assert(props("graft.ivf.embedding.k") == kBefore,
      "the coarse quantizer must stay frozen across an incremental refresh")
    val assign = t.ivfAssignments("embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(assignBefore.subsetOf(assign), "existing assignments must be unchanged")
    val newIds = assign.diff(assignBefore).map(_._1)
    assert(newIds == (80L until 95L).toSet, "every appended row must be assigned")
    // assignments for new rows replay the kernel against the persisted
    // frozen centroids
    val cents = spark.read.parquet(s"${t.path}/$baseRel/centroids")
      .orderBy("cid_c").collect().map(_.getSeq[Double](1).toArray)
    val expected = embDf(spark, 80L until 95L)
      .select(col("vec_id").cast("long").as("id"),
        posexplode(graft.functions.VectorFunctions.topCentroidIds(
          col("embedding"), cents,
          math.min(graft.operators.IvfIndex.Probes, cents.length))))
      .select(col("id"), (col("pos") + 1).cast("int").as("rr"),
        col("col").as("cluster"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(assign.diff(assignBefore) == expected)
  }
}
