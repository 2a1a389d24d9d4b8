package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit main: dumps `explain("formatted")` for selected queries
  * so pushdown (PushedFilters), broadcast joins, and WholeStageCodegen
  * spans can be inspected per round. Usage:
  *   runMain graft.Explain <sfDir> [queryName ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq
      else Seq("q1_pricing_summary", "q2_selective_filter", "q5_region_volume",
        "q7_topn_per_brand", "text_token_count", "sim_bruteforce_topk",
        "q26_skew_join", "q28_range_join", "dedup_clusters",
        "q35_solo_supplier", "q44_market_share", "mm_phash_dedup",
        "pipe_curriculum", "text_search", "sim_pagerank",
        "pipe_token_budget", "q55_gap_fill", "q59_basket",
        "dedup_semantic_materialized", "sim_filtered_ivf")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
