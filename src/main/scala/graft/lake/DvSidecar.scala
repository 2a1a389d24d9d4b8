package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Deletion-vector sidecar access (r16 optimization round, guide
  * §1.2/§5): the sidecar schema is fixed at write time —
  * `(file_path STRING, row_index BIGINT)` — so reads PIN it instead of
  * paying parquet schema inference per read, and the KB–MB-scale
  * metadata questions the engine asks of sidecars ("which files carry
  * masks", "how many marks per file") answer on the driver via
  * parquet-hadoop instead of running a read+shuffle+collect Spark job
  * per question. Size-gated and parameterised
  * (`spark.graft.dv.driverReadMaxBytes`, default 64 MB): a 100 TB
  * table's DV debt can be GBs, and above the gate every helper keeps
  * the distributed path. The driver-side answers are exactly the
  * distinct/count the Spark job computed — callers already held the
  * DISTINCT set on the driver either way.
  */
object DvSidecar {
  /** The sidecar schema as written by every DV producer (MoR
    * delete/update/merge, Iceberg position-delete attach).
    */
  val Schema: StructType = StructType(Seq(
    StructField("file_path", StringType),
    StructField("row_index", LongType)))

  private val DefaultGateBytes = 64L * 1024 * 1024

  private def gateBytes(spark: SparkSession): Long =
    scala.util.Try(spark.conf.get(
      "spark.graft.dv.driverReadMaxBytes",
      DefaultGateBytes.toString).toLong).getOrElse(DefaultGateBytes)

  /** Distributed read with the pinned schema — no footer inference,
    * no schema-merge job, byte-identical rows.
    */
  def read(spark: SparkSession, paths: Seq[String]): DataFrame =
    spark.read.schema(Schema).parquet(paths: _*)

  private def underGate(spark: SparkSession, paths: Seq[String]): Boolean = {
    val gate = gateBytes(spark)
    var total = 0L
    paths.forall { p =>
      val f = java.nio.file.Paths.get(p)
      java.nio.file.Files.isRegularFile(f) && {
        total += java.nio.file.Files.size(f); total <= gate
      }
    }
  }

  /** Stream `file_path` cells of the sidecar parts through `f`,
    * driver-side (column-projected — row_index pages are never read).
    */
  private def foreachFilePath(paths: Seq[String])(f: String => Unit): Unit = {
    val conf = new org.apache.hadoop.conf.Configuration()
    conf.set(org.apache.parquet.hadoop.api.ReadSupport.PARQUET_READ_SCHEMA,
      "message dv { optional binary file_path (UTF8); }")
    paths.foreach { p =>
      val reader = org.apache.parquet.hadoop.ParquetReader
        .builder(new org.apache.parquet.hadoop.example.GroupReadSupport(),
          new org.apache.hadoop.fs.Path(p))
        .withConf(conf)
        .build()
      try {
        var g = reader.read()
        while (g != null) {
          if (g.getFieldRepetitionCount("file_path") > 0)
            f(g.getString("file_path", 0))
          g = reader.read()
        }
      } finally reader.close()
    }
  }

  /** Distinct masked file paths across the sidecars. Driver-side under
    * the gate; identical Spark job above it.
    */
  def distinctFilePaths(spark: SparkSession, paths: Seq[String]): Seq[String] =
    if (paths.isEmpty) Nil
    else if (underGate(spark, paths)) {
      val set = new scala.collection.mutable.LinkedHashSet[String]
      foreachFilePath(paths)(set += _)
      set.toSeq
    } else read(spark, paths).select("file_path").distinct()
      .collect().map(_.getString(0)).toIndexedSeq

  /** Distinct (masked file path, sidecar part path) pairs — the
    * DV-coverage bridge exports fingerprint on. Driver-side under the
    * gate (each part trivially knows its own path); identical
    * `_metadata.file_path` Spark job above it.
    */
  def refsBySidecar(spark: SparkSession,
      paths: Seq[String]): Seq[(String, String)] =
    if (paths.isEmpty) Nil
    else if (underGate(spark, paths)) {
      val set = new scala.collection.mutable.LinkedHashSet[(String, String)]
      paths.foreach { p =>
        foreachFilePath(Seq(p))(fp => set += (fp -> p))
      }
      set.toSeq
    } else {
      import org.apache.spark.sql.functions.col
      read(spark, paths)
        .select(col("file_path"), col("_metadata.file_path").as("__sidecar"))
        .distinct().collect()
        .map(r => (r.getString(0), r.getString(1))).toIndexedSeq
    }

  /** Mark count per masked file path across the sidecars. */
  def countsByFile(spark: SparkSession, paths: Seq[String]): Seq[(String, Long)] =
    if (paths.isEmpty) Nil
    else if (underGate(spark, paths)) {
      val m = new scala.collection.mutable.LinkedHashMap[String, Long]
      foreachFilePath(paths)(fp => m.update(fp, m.getOrElse(fp, 0L) + 1L))
      m.toSeq
    } else {
      import org.apache.spark.sql.functions._
      read(spark, paths).groupBy("file_path").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toIndexedSeq
    }
}
