package graft.lake

import graft.{GraftSparkSpec, Tables}
import org.apache.spark.sql.functions._

class MergeBuilderSpec extends GraftSparkSpec {

  private def freshOrders(name: String) = {
    val o = Tables(spark, sfDir, "orders")
    (o, GraftTable.create(spark, tmpDir(name), o))
  }

  test("whenMatchedDelete removes matching target rows") {
    val (o, t) = freshOrders("mb-del")
    val src = o.filter(col("o_orderkey") < 50)
    t.mergeBuilder(src, "o_orderkey")
      .whenMatchedDelete(col("o_orderstatus") === "F")
      .whenMatchedKeep()
      .whenNotMatchedIgnore()
      .execute()
    val expected = o.filter(!(col("o_orderkey") < 50 && col("o_orderstatus") === "F")).count()
    assert(t.toDF.count() == expected)
  }

  test("conditional update only replaces rows meeting the condition") {
    val (o, t) = freshOrders("mb-cond")
    val src = o.filter(col("o_orderkey") < 100).withColumn("o_totalprice", lit(-1.0))
    t.mergeBuilder(src, "o_orderkey")
      .whenMatchedUpdateAll(condition = Some(col("o_orderstatus") === "O"))
      .whenNotMatchedIgnore()
      .execute()
    val updated = t.toDF.filter(col("o_totalprice") === -1.0).count()
    val expected = o.filter(col("o_orderkey") < 100 && col("o_orderstatus") === "O").count()
    assert(updated == expected, s"updated $updated expected $expected")
    assert(t.toDF.count() == o.count())
  }

  test("insert-only merge appends just the unmatched source rows") {
    val (o, t) = freshOrders("mb-ins")
    val src = o.filter(col("o_orderkey") < 30)
      .withColumn("o_orderkey", col("o_orderkey") + 9000000L)
      .unionByName(o.filter(col("o_orderkey") < 10))
    t.mergeBuilder(src, "o_orderkey")
      .whenMatchedKeep()
      .whenNotMatchedInsertAll()
      .execute()
    assert(t.toDF.count() == o.count() + 30)
  }

  test("SQL TIMESTAMP AS OF reads the snapshot at a wall-clock instant") {
    val gsql = new GraftSql(spark)
    val o = Tables(spark, sfDir, "orders")
    gsql.registerCreate("mo", tmpDir("mb-ts"), o.limit(40))
    Thread.sleep(10)
    val mid = java.time.Instant.now()
    Thread.sleep(10)
    gsql.table("mo").append(o.limit(15))
    val midStr = java.time.LocalDateTime.ofInstant(mid, java.time.ZoneOffset.UTC)
      .toString.replace('T', ' ')
    val n = gsql.sql(s"SELECT COUNT(*) AS n FROM mo TIMESTAMP AS OF '$midStr'")
      .head().getLong(0)
    assert(n == 40)
    assert(gsql.sql("SELECT COUNT(*) AS n FROM mo").head().getLong(0) == 55)
  }
}
