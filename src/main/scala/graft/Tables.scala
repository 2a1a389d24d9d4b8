package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  * Explicit paths, no schema inference cost beyond parquet footers —
  * mirrors the reference's "define schema, don't infer" guidance
  * (reference docs/02-lab-optimizations.md:485-507).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.parquet carries TIMESTAMP(NANOS) which Spark 4 refuses
      // natively; read the raw int64 nanos and convert (values are
      // µs-precision, so the cast is lossless).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    } else spark.read.parquet(s"$dir/$name.parquet")
}
