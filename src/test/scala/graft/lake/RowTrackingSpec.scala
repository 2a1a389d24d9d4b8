package graft.lake

import graft.GraftSparkSpec
import org.apache.spark.sql.functions._

/** Row tracking (Delta parity): stable row ids assigned at commit,
  * resolved at read (base + position, or the materialized column), and
  * PRESERVED across layout rewrites — the invariant incremental
  * downstream pipelines key on.
  */
class RowTrackingSpec extends GraftSparkSpec {

  private def rtCreate(name: String, n: Int, parts: Int): GraftTable = {
    val df = spark.range(n).select(col("id").as("k"), (col("id") * 3).as("v"))
    GraftTable.create(spark, tmpDir(name), df.repartition(parts),
      properties = Map("graft.rowTracking" -> "true"))
  }

  private def idMap(t: GraftTable): Map[Long, Long] =
    t.toDFWithRowIds.select("k", "row_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("fresh writes get dense unique ids; appends extend the range") {
    val t = rtCreate("rt-basic", 100, 4)
    val ids0 = idMap(t)
    assert(ids0.size == 100)
    assert(ids0.values.toSeq.sorted == (0L until 100L))
    t.append(spark.range(100, 150).select(col("id").as("k"), (col("id") * 3).as("v")))
    val ids1 = idMap(t)
    assert(ids1.size == 150)
    assert(ids1.values.toSeq.sorted == (0L until 150L))
    // old rows kept their ids
    ids0.foreach { case (k, id) => assert(ids1(k) == id) }
  }

  test("OPTIMIZE compaction preserves every row's id") {
    val t = rtCreate("rt-opt", 200, 8)
    val before = idMap(t)
    val m = t.optimize()
    assert(m("numRemovedFiles").toInt >= 2, "compaction must have happened")
    val after = idMap(t)
    assert(after == before, "layout rewrite changed row ids")
  }

  test("ZORDER rewrite preserves ids; later appends never reuse ranges") {
    val t = rtCreate("rt-z", 200, 4)
    val before = idMap(t)
    t.zorderBy(128L * 1024 * 1024, "v")
    assert(idMap(t) == before)
    // delete some rows (their ids retire with them), then append: the
    // high-water mark must prevent range reuse
    t.delete(col("k") < 50)
    t.append(spark.range(1000, 1040)
      .select(col("id").as("k"), (col("id") * 3).as("v")))
    val ids = idMap(t)
    assert(ids.size == 190)
    val fresh = ids.filter(_._1 >= 1000).values.toSet
    val surviving = before.filter(_._1 >= 50).values.toSet
    assert(ids.filter(_._1 < 1000).forall { case (k, id) => before(k) == id },
      "surviving rows must keep their ids across a CoW delete")
    assert(fresh.intersect(before.values.toSet).isEmpty,
      "fresh rows reused ids retired with deleted rows")
    assert(surviving.subsetOf(ids.values.toSet))
  }

  test("merge-on-read delete keeps surviving ids; purge materializes them") {
    val t = rtCreate("rt-mor", 120, 3)
    val before = idMap(t)
    t.deleteMergeOnRead(col("k") % 2 === 0)
    val afterDel = idMap(t)
    assert(afterDel.size == 60)
    afterDel.foreach { case (k, id) => assert(before(k) == id) }
    t.reorgPurge()
    val afterPurge = idMap(t)
    assert(afterPurge == afterDel, "REORG PURGE changed surviving row ids")
  }

  test("UPDATE keeps ids: the post-image is the same row") {
    val t = rtCreate("rt-upd", 80, 4)
    val before = idMap(t)
    t.update(col("k") < 10, Map("v" -> lit(-1L)))
    val after = idMap(t)
    assert(after == before, "UPDATE must not reassign ids (same logical row)")
    val updated = t.toDFWithRowIds.filter(col("v") === -1L).count()
    assert(updated == 10)
  }

  test("MERGE keeps ids for kept and updated rows; inserts get fresh ones") {
    val t = rtCreate("rt-merge", 60, 3)
    val before = idMap(t)
    // source: update keys 0..9 (replace v), insert keys 1000..1009
    val src = spark.range(10).select(col("id").as("k"), lit(-7L).as("v"))
      .unionByName(spark.range(1000, 1010)
        .select(col("id").as("k"), (col("id") * 3).as("v")))
    t.merge(src, "k")
    val after = idMap(t)
    assert(after.size == 70)
    // every pre-existing row — updated or untouched — kept its id
    before.foreach { case (k, id) => assert(after(k) == id,
      s"row $k changed id $id -> ${after(k)} across MERGE") }
    // inserted rows got ids disjoint from every pre-existing one
    val freshIds = after.filter(_._1 >= 1000).values.toSet
    assert(freshIds.size == 10)
    assert(freshIds.intersect(before.values.toSet).isEmpty)
    assert(t.toDFWithRowIds.filter(col("v") === -7L).count() == 10)
  }

  test("MERGE with explicit UPDATE SET keeps ids (CoW and MoR)") {
    // regression: assignAll used to drop the materialized id column,
    // crashing any row-tracked merge with a partial update clause
    Seq(false, true).foreach { mor =>
      val t = rtCreate(s"rt-set-merge-$mor", 40, 2)
      val before = idMap(t)
      val src = spark.range(8).select(col("id").as("k"), lit(0L).as("v"))
      val b = t.mergeBuilder(src, "k")
        .whenMatchedUpdate(Map("v" -> lit(-5L)))
        .whenNotMatchedIgnore()
      (if (mor) b.mergeOnRead() else b).execute()
      val after = idMap(t)
      assert(after == before, s"ids changed across UPDATE SET merge (mor=$mor)")
      assert(t.toDFWithRowIds.filter(col("v") === -5L).count() == 8)
    }
  }

  test("merge-on-read MERGE: post-images carry the masked original's id") {
    val t = rtCreate("rt-mor-merge", 60, 3)
    val before = idMap(t)
    val src = spark.range(10).select(col("id").as("k"), lit(-9L).as("v"))
      .unionByName(spark.range(2000, 2005)
        .select(col("id").as("k"), (col("id") * 3).as("v")))
    t.mergeBuilder(src, "k").mergeOnRead().execute()
    val after = idMap(t)
    assert(after.size == 65)
    // updated rows were masked + re-appended — same id rides the
    // materialized column into the post-image file
    before.foreach { case (k, id) => assert(after(k) == id,
      s"row $k changed id across MoR MERGE") }
    val freshIds = after.filter(_._1 >= 2000).values.toSet
    assert(freshIds.size == 5 && freshIds.intersect(before.values.toSet).isEmpty)
    assert(t.toDFWithRowIds.filter(col("v") === -9L).count() == 10)
  }

  test("high-water mark survives checkpoint + log cleanup") {
    val t = rtCreate("rt-ckpt", 20, 1)
    (1 to 12).foreach { i =>
      t.append(spark.range(20L * i, 20L * (i + 1))
        .select(col("id").as("k"), (col("id") * 3).as("v")))
    }
    val log = new TxnLog(t.path)
    assert(log.checkpointVersion.exists(_ >= 10), "checkpoint expected")
    log.cleanupLogs()
    val ids = idMap(t)
    assert(ids.size == 260)
    assert(ids.values.toSet.size == 260, "ids must stay unique through checkpoint")
    // ids are exactly the 260 reserved so far — hwm was not lost
    assert(ids.values.max == 259L)
  }

  test("replaceWhere keeps survivors' ids; replacements get fresh ones") {
    val t = rtCreate("rt-rw", 60, 2)
    val before = idMap(t)
    val repl = spark.range(3000, 3010)
      .select(col("id").as("k"), (col("id") * 3).as("v"))
    t.replaceWhere(col("k") < 20, repl)
    val after = idMap(t)
    assert(after.size == 50)
    after.filter(_._1 < 3000).foreach { case (k, id) =>
      assert(before(k) == id, s"survivor $k reassigned across replaceWhere") }
    val fresh = after.filter(_._1 >= 3000).values.toSet
    assert(fresh.size == 10 && fresh.intersect(before.values.toSet).isEmpty)
  }

  test("clones keep source ids; appends to the clone never reuse them") {
    val t = rtCreate("rt-clone-src", 100, 4)
    val srcIds = idMap(t)
    val clone = GraftTable.shallowClone(spark, t.path,
      tmpDir("rt-clone-dst"))
    val cloneIds = clone.toDFWithRowIds.select("k", "row_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cloneIds == srcIds, "clone must keep the source's row ids")
    // the clone's hwm must cover the inherited ranges
    clone.append(spark.range(5000, 5020)
      .select(col("id").as("k"), (col("id") * 3).as("v")))
    val after = clone.toDFWithRowIds.select("k", "row_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after.size == 120)
    assert(after.values.toSet.size == 120,
      "append to a clone reused inherited id ranges")
  }

  test("deep clone of a DV-masked table keeps every surviving row's id") {
    val t = rtCreate("rt-deep-src", 90, 3)
    t.deleteMergeOnRead(col("k") % 3 === 0)
    val srcIds = idMap(t)
    assert(srcIds.size == 60)
    val clone = GraftTable.deepClone(spark, t.path, tmpDir("rt-deep-dst"))
    val cloneIds = clone.toDFWithRowIds.select("k", "row_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cloneIds == srcIds,
      "deep clone's masked-file rewrite must carry row ids")
  }

  test("row ids survive column rename (column mapping) and DV masking together") {
    val t = rtCreate("rt-colmap", 50, 2)
    val before = idMap(t)
    t.renameColumn("v", "value") // metadata-only: physical name differs now
    t.deleteMergeOnRead(col("k") >= 40)
    val after = t.toDFWithRowIds.select("k", "row_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after.size == 40)
    after.foreach { case (k, id) => assert(before(k) == id) }
    assert(t.toDFWithRowIds.columns.contains("value"))
  }

  test("MERGE refuses duplicate source keys on a row-tracked table (CoW and MoR)") {
    // two source rows matching one target key would each inherit the
    // SAME stable id — Delta parity: error, don't duplicate ids
    val src = spark.range(5).select(col("id").as("k"), lit(-1L).as("v"))
      .unionByName(spark.range(3, 5).select(col("id").as("k"), lit(-2L).as("v")))
    val t1 = rtCreate("rt-dupsrc-cow", 20, 2)
    val e1 = intercept[IllegalArgumentException] { t1.merge(src, "k") }
    assert(e1.getMessage.contains("multiple source rows"))
    val t2 = rtCreate("rt-dupsrc-mor", 20, 2)
    val e2 = intercept[IllegalArgumentException] {
      t2.mergeBuilder(src, "k").whenMatchedUpdateAll()
        .whenNotMatchedInsertAll().mergeOnRead().execute()
    }
    assert(e2.getMessage.contains("multiple source rows"))
    // a duplicate-free source still merges fine
    t2.merge(spark.range(3).select(col("id").as("k"), lit(-9L).as("v")), "k")
    assert(t2.toDFWithRowIds.filter(col("v") === -9L).count() == 3)
  }

  test("row tracking / identity raise the writer protocol floor to 2") {
    val t = rtCreate("rt-proto", 10, 1)
    assert(t.snapshot.protocol.exists(_.minWriterVersion >= 2),
      "rowTracking table must reject pre-feature (v1) writers")
    // enabling the feature later via SET TBLPROPERTIES raises it too
    val plain = GraftTable.create(spark, tmpDir("rt-proto-late"),
      spark.range(5).select(col("id").as("k")))
    assert(plain.snapshot.protocol.forall(_.minWriterVersion < 2))
    plain.setTableProperties(Map("graft.identity.seq" -> "0,1"))
    assert(plain.snapshot.protocol.exists(_.minWriterVersion >= 2),
      "identity property must raise the writer floor in the same commit")
  }

  test("row tracking off -> reads refuse, commits stay untouched") {
    val df = spark.range(10).select(col("id").as("k"))
    val t = GraftTable.create(spark, tmpDir("rt-off"), df)
    intercept[IllegalArgumentException] { t.toDFWithRowIds }
    assert(t.snapshot.activeFiles.forall(_.baseRowId.isEmpty))
    assert(t.snapshot.rowIdHwm == -1L)
  }
}
