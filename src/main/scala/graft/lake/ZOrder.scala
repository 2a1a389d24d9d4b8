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

  private def isOrdered(dt: DataType): Boolean = dt match {
    case StringType | BinaryType | BooleanType => false
    case _ => true
  }

  /** Clustering rank: Morton bit-interleave by default, or the
    * d-dimensional Hilbert index (`curve = "hilbert"`) whose adjacent
    * cells are spatially adjacent — tighter per-file bounding boxes
    * for multi-column predicates at the cost of a slightly heavier
    * per-row kernel (still one codegen'd static call).
    * All ordered columns' quantile cuts come from ONE `approxQuantile`
    * pass.
    */
  def zvalue(df: DataFrame, cols: Seq[String], curve: String = "morton"): Column = {
    val probs = (1 until NBuckets).map(_.toDouble / NBuckets).toArray
    val ordered = cols.filter(c => isOrdered(df.schema(c).dataType))
    val cutsByCol: Map[String, Array[Double]] =
      if (ordered.isEmpty) Map.empty
      else {
        val casted = df.select(ordered.map(c =>
          numeric(col(c), df.schema(c).dataType).as(c)): _*)
        ordered.zip(casted.stat.approxQuantile(ordered.toArray, probs, 0.01))
          .map { case (c, cuts) => c -> cuts.distinct.sorted }.toMap
      }
    val buckets = cols.map { c =>
      df.schema(c).dataType match {
        case dt if isOrdered(dt) =>
          val cutsArr = array(cutsByCol(c).map(lit).toIndexedSeq: _*)
          // bucket = #cuts <= value (codegen'd array scan, ≤63 cmp/row)
          size(filter(cutsArr, cut => cut <= numeric(col(c), dt))).cast("long")
        case _ =>
          pmod(xxhash64(col(c)), lit(NBuckets.toLong)).cast("long")
      }
    }
    val n = cols.size
    curve match {
      case "hilbert" =>
        require(n * BitsPerCol <= 63,
          s"hilbert index for $n columns x $BitsPerCol bits exceeds a long")
        GraftExpr.column(graft.functions.HilbertIndex(
          GraftExpr.expression(array(buckets: _*)), BitsPerCol))
      case _ =>
        (0 until BitsPerCol).foldLeft(lit(0L)) { (acc, b) =>
          buckets.zipWithIndex.foldLeft(acc) { case (a, (bk, i)) =>
            a.bitwiseOR(shiftleft(
              shiftright(bk, b).bitwiseAND(lit(1L)), b * n + i))
          }
        }
    }
  }
}
