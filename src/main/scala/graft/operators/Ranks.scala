package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Two-phase global ordinals — the distributed replacement for
  * `row_number().over(Window.orderBy(...))` with no partition key.
  *
  * A partition-less Window funnels EVERY row through one reducer: at
  * the 100 TB design point that single task holds the whole data set.
  * The two-phase shape computes the identical total-order ordinal
  * distributed: a cluster-wide range sort on the key (phase 1), then
  * `zipWithIndex` (phase 2 — per-partition counts plus contiguous
  * offsets, the textbook parallel rank). Works for any total order;
  * callers must pass a tie-free sort key so ordinals are
  * deterministic. Same values, same hashes as the window by
  * construction. First shipped for the vocabulary rank
  * ([[TextOps.textVocab]]); rank-derived statistics (NTILE,
  * percent_rank, cume_dist, cumulative sums) are arithmetic over
  * (ordinal, n) downstream.
  */
object Ranks {

  /** Append a 1-based `long` ordinal column under the given total
    * order. One extra job versus the single-reducer window
    * (zipWithIndex's partition-size count), each job fully parallel.
    */
  def withGlobalOrdinal(df: DataFrame, name: String,
      sortCols: Column*): DataFrame = {
    val sorted = df.sort(sortCols: _*)
    val schema = StructType(sorted.schema.fields :+
      StructField(name, LongType, nullable = false))
    val indexed = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    sorted.sparkSession.createDataFrame(indexed, schema)
  }

  /** NTILE as arithmetic over a 1-based global ordinal: with q = n/k
    * and r = n%k, the first r buckets hold q+1 rows — the exact SQL
    * NTILE contract, so results hash-match the window form. Shared by
    * every quantile-bucketing query (decile segmentation, RFM scores)
    * so the contract lives in one place.
    */
  def ntileBucket(ord: Column, n: Long, k: Long): Column = {
    import org.apache.spark.sql.functions.{floor, lit, when}
    val q = n / k
    val r = n % k
    val cut = r * (q + 1) // ordinals ≤ cut fall in the q+1-sized buckets
    (when(ord <= cut, floor((ord - 1) / lit(q + 1)))
      .otherwise(lit(r) + floor((ord - 1 - cut) / lit(math.max(q, 1L)))) + 1)
      .cast("long")
  }
}
