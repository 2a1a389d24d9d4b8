package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan-audit harness: prints the formatted physical plan of named
  * SparkEntry queries (args; default a small smoke set) against
  * SPARK_GRAFT_SF_DIR — for checking pushdown, broadcast choice, and
  * WholeStageCodegen coverage without writing a throwaway main.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else Seq("q1_pricing_summary")
    names.foreach { n =>
      println(s"=== $n ===")
      graft.SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
