package graft.operators

import graft.{GraftSparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import org.apache.spark.sql.types._

/** Reference §G (cache/persist) and §H (schema vs inferSchema)
  * behaviors (reference docs/02-lab-optimizations.md:402-583).
  */
class CachingAndSchemaSpec extends GraftSparkSpec {

  test("cache() and persist(level) return identical results and release cleanly") {
    val df = Tables(spark, sfDir, "lineitem")
      .filter(col("l_returnflag") === "R")
      .withColumn("total", col("l_extendedprice") * col("l_quantity"))
    val uncached = df.count()
    df.cache()
    assert(df.count() == uncached)   // materializes the cache
    assert(df.count() == uncached)   // served from cache
    assert(df.storageLevel.useMemory)
    df.unpersist(blocking = true)
    assert(df.storageLevel == StorageLevel.NONE)

    df.persist(StorageLevel.DISK_ONLY)
    assert(df.count() == uncached)
    assert(df.storageLevel == StorageLevel.DISK_ONLY)
    df.unpersist(blocking = true)
  }

  test("explicit schema CSV read matches inferSchema but skips the inference scan") {
    val dir = tmpDir("csv")
    Tables(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("o_orderstatus"))
      .coalesce(1).write.option("header", "true").mode("overwrite").csv(dir)

    val schema = StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_custkey", LongType),
      StructField("o_totalprice", DoubleType),
      StructField("o_orderstatus", StringType)))
    val explicit = spark.read.schema(schema).option("header", "true").csv(dir)
    val inferred = spark.read.option("header", "true")
      .option("inferSchema", "true").csv(dir)
    // explicit schema is authoritative; inference may narrow types
    // (e.g. Long → Int on small samples) — exactly the §H pitfall
    assert(explicit.schema == schema)
    assert(explicit.count() == inferred.count())
    assert(explicit.exceptAll(
      inferred.select(schema.map(f => col(f.name).cast(f.dataType)): _*)).isEmpty)
  }
}
