package graft.lake

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Z-order (Morton) clustering: quantile-bucket each clustering
  * column, interleave the bucket bits into a single rank, then
  * range-partition + sort by that rank so each output file covers a
  * tight hyper-rectangle of the clustered columns — min/max file
  * stats become selective for filters on ANY clustered column
  * (reference docs/02-lab-optimizations.md:118-163, Z-Order).
  *
  * Quantile cuts come from `approxQuantile` (driver gets only the
  * cut points — KB-scale); bucketing is a codegen'd array scan.
  * String columns fall back to hash buckets (no meaningful order).
  */
object ZOrder {

  val BitsPerCol = 6 // 64 buckets per column
  private val NBuckets = 1 << BitsPerCol

  /** Numeric view of a column for quantile bucketing (timestamps →
    * epoch seconds, dates → days).
    */
  private def numeric(c: Column, dt: DataType): Column = dt match {
    case TimestampType => c.cast("double")
    case TimestampNTZType => c.cast(TimestampType).cast("double")
    case DateType => datediff(c, lit("1970-01-01").cast("date")).cast("double")
    case _ => c.cast("double")
  }

  private def bucketCol(df: DataFrame, c: String): Column = {
    df.schema(c).dataType match {
      case StringType | BinaryType | BooleanType =>
        pmod(xxhash64(col(c)), lit(NBuckets.toLong)).cast("long")
      case dt =>
        val probs = (1 until NBuckets).map(_.toDouble / NBuckets).toArray
        val cast = df.select(numeric(col(c), dt).as("__zq"))
        val cuts = cast.stat.approxQuantile("__zq", probs, 0.01)
          .distinct.sorted
        val cutsArr = array(cuts.map(lit): _*)
        // bucket = #cuts <= value (codegen'd array scan, ≤63 cmp/row)
        size(filter(cutsArr, cut => cut <= numeric(col(c), dt)))
          .cast("long")
    }
  }

  /** Morton-interleave the per-column bucket bits. */
  def zvalue(df: DataFrame, cols: Seq[String]): Column = {
    val buckets = cols.map(c => bucketCol(df, c))
    val n = cols.size
    (0 until BitsPerCol).foldLeft(lit(0L)) { (acc, b) =>
      buckets.zipWithIndex.foldLeft(acc) { case (a, (bk, i)) =>
        a.bitwiseOR(shiftleft(
          shiftright(bk, b).bitwiseAND(lit(1L)), b * n + i))
      }
    }
  }
}
