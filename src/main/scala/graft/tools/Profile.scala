package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc timing harness: runs named SparkEntry queries N times and
  * prints per-run wall seconds — for isolating bench regressions.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names =
      if (args.isEmpty) Seq("lake_roundtrip")
      else if (args.sameElements(Array("ALL_LAKE")))
        graft.SparkEntry.queries.keys.toSeq.filter(_.startsWith("lake")).sorted
      else args.toSeq
    names.foreach { n =>
      (1 to 2).foreach { i =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        println(f"[profile] $n run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
