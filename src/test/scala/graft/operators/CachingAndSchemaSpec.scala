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

  /** §H on the lab's OWN file: /root/reference/docs/files/
    * orders_dataset.csv (50k orders) read with the lab's explicit
    * StructType (02-lab:495-505) vs inferSchema (02-lab:526-539).
    */
  test("reference orders_dataset.csv: lab's explicit schema vs inferSchema") {
    val csv = "/root/reference/docs/files/orders_dataset.csv"
    assume(new java.io.File(csv).isFile, "reference CSV not present")
    val ordersSchema = StructType(Seq(
      StructField("order_id", LongType),
      StructField("order_ts", TimestampType),
      StructField("country", StringType),
      StructField("category", StringType),
      StructField("price", DoubleType),
      StructField("quantity", IntegerType)))
    val explicit = spark.read.schema(ordersSchema)
      .option("header", "true").csv(csv)
    val inferred = spark.read.option("header", "true")
      .option("inferSchema", "true").csv(csv)
    assert(explicit.schema == ordersSchema)
    assert(explicit.count() == 50000 && inferred.count() == 50000)
    // date-only strings infer as DATE, the lab's declared type is
    // TIMESTAMP — the silent type drift §H warns about; values agree
    // once the inferred frame is cast to the declared schema
    assert(explicit.exceptAll(inferred.select(
      ordersSchema.map(f => col(f.name).cast(f.dataType)): _*)).isEmpty)
    // the lab's §B baseline filter runs identically on the lab data
    assert(explicit.filter(col("country") === "US" &&
      col("category") === "electronics").count() > 0)
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
