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
      // events.parquet's `ts` physical type has varied across driver
      // testdata generations: TIMESTAMP(NANOS) (which Spark 4 refuses
      // natively — read as int64 nanos and convert; µs precision makes
      // it lossless), timestamp[us] without UTC adjustment (read as
      // TIMESTAMP_NTZ), or a plain UTC timestamp. Normalize every
      // variant to the same TimestampType µs values (sessions run UTC)
      // so downstream operators and oracles are generation-agnostic.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      import org.apache.spark.sql.functions.{col, expr}
      import org.apache.spark.sql.types.{LongType, TimestampNTZType}
      raw.schema("ts").dataType match {
        case LongType =>
          raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case TimestampNTZType =>
          raw.withColumn("ts", col("ts").cast("timestamp"))
        case _ => raw
      }
    } else spark.read.parquet(s"$dir/$name.parquet")
}
