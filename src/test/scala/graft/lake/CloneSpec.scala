package graft.lake

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import graft.{GraftSparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Shallow clone: zero-copy metadata clone that evolves independently
  * of its source (SURVEY §2.1 L28).
  */
class CloneSpec extends GraftSparkSpec {

  private def li = Tables(spark, sfDir, "lineitem")

  private def parquetCount(dir: String): Int = {
    val p = Paths.get(dir)
    val w = Files.walk(p)
    try w.iterator().asScala.count(f =>
      f.getFileName.toString.endsWith(".parquet") &&
        !f.toString.contains("_graft_log") &&
        !f.toString.contains("_graft_dv"))
    finally w.close()
  }

  test("clone copies no data, reads the source snapshot, evolves independently") {
    val srcPath = tmpDir("clone-src")
    val src = GraftTable.create(spark, srcPath, li.limit(300), Seq("l_returnflag"))
    src.deleteMergeOnRead(col("l_quantity") < 5.0) // active DV in the snapshot
    val expected = src.toDF.count()

    val clonePath = tmpDir("clone-dst")
    val clone = GraftTable.shallowClone(spark, srcPath, clonePath)
    assert(parquetCount(clonePath) == 0, "shallow clone must copy no data files")
    assert(clone.toDF.count() == expected, "clone must see the source snapshot incl. DV masks")

    // clone writes stay local; source unaffected
    clone.append(src.toDF.limit(10))
    assert(clone.toDF.count() == expected + 10)
    assert(src.toDF.count() == expected)
    assert(parquetCount(clonePath) > 0)

    // CoW delete on the clone rewrites into the clone, source intact
    val srcFilesBefore = parquetCount(srcPath)
    clone.delete(col("l_returnflag") === "R")
    assert(clone.toDF.filter(col("l_returnflag") === "R").count() == 0)
    assert(src.toDF.filter(col("l_returnflag") === "R").count() > 0)
    assert(parquetCount(srcPath) == srcFilesBefore)

    // vacuum on the clone never reaches outside its root
    clone.vacuum(retentionHours = 0.0, dryRun = false)
    assert(parquetCount(srcPath) == srcFilesBefore)
    assert(src.toDF.count() == expected)
  }

  test("cloning a bloom-indexed table drops the stale sidecar pointers") {
    val srcPath = tmpDir("cloneb-src")
    val src = GraftTable.create(spark, srcPath,
      li.limit(1000).repartition(4, col("l_orderkey")))
    src.computeBloomFilter("l_orderkey")
    val clone = GraftTable.shallowClone(spark, srcPath, tmpDir("cloneb-dst"))
    assert(!clone.snapshot.metadata.get.properties.keys
      .exists(_.startsWith("graft.bloom.")))
    val key = li.select("l_orderkey").head.getLong(0)
    // must not crash resolving a sidecar that lives under the source
    assert(clone.readWhere(col("l_orderkey") === key).count() ==
      src.readWhere(col("l_orderkey") === key).count())
  }

  test("SQL surface: SHALLOW CLONE and COMPUTE BLOOM statements") {
    val srcPath = tmpDir("clonesql-src")
    val t = GraftTable.create(spark, srcPath,
      li.limit(1000).repartition(4, col("l_orderkey")))
    val g = new GraftSql(spark)
    g.register("src_t", srcPath)
    g.sql("COMPUTE BLOOM src_t (l_orderkey)")
    assert(t.snapshot.metadata.get.properties.keys
      .exists(_.startsWith("graft.bloom.l_orderkey")))
    val destPath = tmpDir("clonesql-dst")
    g.sql(s"CREATE TABLE cl SHALLOW CLONE src_t LOCATION '$destPath'")
    assert(g.table("cl").toDF.count() == 1000)
    assert(g.sql("SELECT COUNT(*) AS n FROM cl").head.getLong(0) == 1000)
  }

  test("deep clone copies data, materializes DV masks, fully detaches") {
    val srcPath = tmpDir("deep-src")
    val src = GraftTable.create(spark, srcPath,
      li.limit(300).repartition(4), Seq("l_returnflag"))
    src.deleteMergeOnRead(col("l_quantity") < 5.0)
    val expected = src.toDF.count()
    val expectedSum = src.toDF.agg(sum("l_extendedprice")).head.getDouble(0)

    val clonePath = tmpDir("deep-dst")
    val clone = GraftTable.deepClone(spark, srcPath, clonePath)
    assert(parquetCount(clonePath) > 0, "deep clone must copy data files")
    assert(clone.snapshot.dvFiles.isEmpty,
      "deep clone must materialize masks, not carry DVs")
    assert(clone.snapshot.activeFiles.forall(!_.path.startsWith("/")),
      "deep clone must hold no absolute refs into the source")
    assert(clone.toDF.count() == expected)
    assert(math.abs(clone.toDF.agg(sum("l_extendedprice")).head.getDouble(0)
      - expectedSum) < 1e-6)
    // unmasked files keep their footer stats without a recompute pass
    assert(clone.snapshot.activeFiles.exists(_.stats.isDefined))

    // full detachment: destroying the source leaves the clone readable
    val w = Files.walk(Paths.get(srcPath))
    try w.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    finally w.close()
    assert(clone.toDF.count() == expected,
      "clone must survive source deletion")
    // and the clone keeps evolving on its own
    clone.delete(col("l_returnflag") === "R")
    assert(clone.toDF.filter(col("l_returnflag") === "R").count() == 0)
  }

  test("SQL surface: DEEP CLONE pins a version and detaches") {
    val srcPath = tmpDir("deepsql-src")
    val src = GraftTable.create(spark, srcPath, li.limit(100))
    val v0 = src.version
    src.append(li.limit(50))
    val g = new GraftSql(spark)
    g.register("dsrc", srcPath)
    val destPath = tmpDir("deepsql-dst")
    g.sql(s"CREATE TABLE dcl DEEP CLONE dsrc LOCATION '$destPath' VERSION AS OF $v0")
    assert(g.table("dcl").toDF.count() == 100)
    assert(g.table("dcl").snapshot.activeFiles.forall(!_.path.startsWith("/")))
  }

  test("clone at an older version pins that snapshot") {
    val srcPath = tmpDir("clonev-src")
    val src = GraftTable.create(spark, srcPath, li.limit(100))
    val v0 = src.version
    src.append(li.limit(50))
    val clone = GraftTable.shallowClone(spark, srcPath,
      tmpDir("clonev-dst"), Some(v0))
    assert(clone.toDF.count() == 100)
    assert(src.toDF.count() == 150)
  }

  test("SQL clone TIMESTAMP AS OF pins through the commit-time index") {
    val srcPath = tmpDir("clonets-src")
    val src = GraftTable.create(spark, srcPath, li.limit(100))
    val tsAfterSeed = src.history.filter(col("version") === src.version)
      .collect()(0).getLong(1)
    src.append(li.limit(50))
    val g = new GraftSql(spark)
    g.register("tsrc", srcPath)
    val destPath = tmpDir("clonets-dst")
    val tsStr = new java.sql.Timestamp(tsAfterSeed).toString
    g.sql(s"CREATE TABLE tcl SHALLOW CLONE tsrc LOCATION '$destPath' " +
      s"TIMESTAMP AS OF '$tsStr'")
    assert(g.table("tcl").toDF.count() == 100,
      "the timestamp must resolve to the pre-append snapshot")
    assert(src.toDF.count() == 150)
  }
}
