package graft.lake

import scala.jdk.CollectionConverters._
import scala.util.Try

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName

import org.apache.spark.sql.SparkSession

/** File-level column statistics straight from parquet footers —
  * metadata-only reads (no data scan), distributed across executors,
  * so stats collection stays O(#files) footer fetches even at 100 TB.
  * Powers the data-skipping path the reference gets from Delta's
  * per-file stats (reference docs/02-lab-optimizations.md:591-599).
  */
object Stats {

  // one Configuration per JVM, not per file: its XML resource parse is
  // milliseconds — visible when the driver collects stats for ≤4 files
  // inline after every small commit (r16). Hadoop Configuration is
  // thread-safe for reads; nothing here mutates it.
  @transient private lazy val sharedConf = new Configuration()

  /** Footer stats for one local/hadoop-visible parquet file. */
  def statsForFile(absPath: String): FileStats = {
    val in = HadoopInputFile.fromPath(new HPath(absPath), sharedConf)
    val reader = ParquetFileReader.open(in)
    try {
      val footer = reader.getFooter
      var numRecords = 0L
      val mins = scala.collection.mutable.Map[String, Any]()
      val maxs = scala.collection.mutable.Map[String, Any]()
      val nulls = scala.collection.mutable.Map[String, Long]()
      val types = scala.collection.mutable.Map[String, PrimitiveTypeName]()
      footer.getBlocks.asScala.foreach { block =>
        numRecords += block.getRowCount
        block.getColumns.asScala.foreach { cc =>
          val name = cc.getPath.toDotString
          val st = cc.getStatistics
          if (st != null && !st.isEmpty) {
            nulls(name) = nulls.getOrElse(name, 0L) + st.getNumNulls
            if (st.hasNonNullValue) {
              val tpe = cc.getPrimitiveType.getPrimitiveTypeName
              types(name) = tpe
              val (mn, mx) = (st.genericGetMin, st.genericGetMax)
              val cmp = st.comparator.asInstanceOf[java.util.Comparator[Any]]
              mins(name) = mins.get(name).map(m => if (cmp.compare(mn, m) < 0) mn else m).getOrElse(mn)
              maxs(name) = maxs.get(name).map(m => if (cmp.compare(mx, m) > 0) mx else m).getOrElse(mx)
            }
          }
        }
      }
      def render(v: Any, t: PrimitiveTypeName): String = t match {
        case PrimitiveTypeName.BINARY =>
          new String(v.asInstanceOf[org.apache.parquet.io.api.Binary].getBytes,
            java.nio.charset.StandardCharsets.UTF_8)
        case _ => String.valueOf(v)
      }
      FileStats(
        numRecords,
        mins.map { case (k, v) => k -> render(v, types(k)) }.toMap,
        maxs.map { case (k, v) => k -> render(v, types(k)) }.toMap,
        nulls.toMap)
    } finally reader.close()
  }

  /** Distributed footer-stats for a batch of files (abs paths). */
  def collect(spark: SparkSession, absPaths: Seq[String]): Map[String, FileStats] =
    if (absPaths.isEmpty) Map.empty
    else if (absPaths.size <= 4) absPaths.map(p => p -> statsForFile(p)).toMap
    else {
      val slices = math.min(absPaths.size, spark.sparkContext.defaultParallelism)
      spark.sparkContext.parallelize(absPaths, slices)
        .map(p => p -> Try(statsForFile(p)).toOption)
        .collect().collect { case (p, Some(s)) => p -> s }.toMap
    }
}
