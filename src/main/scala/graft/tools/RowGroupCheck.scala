package graft.tools
import scala.jdk.CollectionConverters._
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.hadoop.conf.Configuration
/** Dev tool: print row-group layout of the testdata parquet files. */
object RowGroupCheck {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    Seq("lineitem", "orders", "documents", "embeddings", "events").foreach { t =>
      val in = HadoopInputFile.fromPath(new HPath(s"$dir/$t.parquet"), new Configuration())
      val r = ParquetFileReader.open(in)
      val blocks = r.getFooter.getBlocks.asScala
      println(s"ROWGROUPS $t: n=${blocks.size} rows=${blocks.map(_.getRowCount).sum} " +
        s"sizes=${blocks.map(_.getTotalByteSize).mkString(",")}")
      r.close()
    }
  }
}
