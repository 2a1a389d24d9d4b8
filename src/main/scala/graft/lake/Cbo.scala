package graft.lake

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Stats→planner injection (reference docs/02-lab-optimizations.md
  * §I, :587-785): the reference computes per-column statistics and
  * feeds them to the engine's cost-based optimizer. The Spark-side
  * decision points we drive from GraftLake's persisted
  * `graft.stats.*` properties (written by [[GraftTable.computeStats]])
  * are join-side selection — broadcast the side whose *statistics*
  * (not on-disk file size, which lies for compressed/columnar data)
  * say it's small — and shuffle width sizing.
  *
  * At 100 TB the point of stats-driven broadcast is that a pruned or
  * filtered dimension can be broadcastable even when its raw footprint
  * is not; and conversely a 10 MB parquet file of high-cardinality
  * wide rows can explode 20× decompressed, where row-count stats say
  * "don't".
  */
object Cbo {

  final case class ColumnStats(rows: Long, distinct: Long, nulls: Long,
                               min: String, max: String)

  /** Parsed `graft.stats.<column>` table properties. Non-stat keys in
    * the namespace (e.g. `graft.stats.autoCollect=true`) are skipped,
    * not parse errors.
    */
  def tableStats(t: GraftTable): Map[String, ColumnStats] = {
    val props = t.snapshot.metadata.map(_.properties).getOrElse(Map.empty)
    props.collect { case (k, v)
        if k.startsWith("graft.stats.") && v.contains("rows=") =>
      val fields = v.split(";", -1).collect {
        case kv if kv.contains("=") =>
          val Array(a, b) = kv.split("=", 2); a -> b
      }.toMap
      k.stripPrefix("graft.stats.") -> ColumnStats(
        fields("rows").toLong, fields("distinct").toLong,
        fields("nulls").toLong, fields.getOrElse("min", ""),
        fields.getOrElse("max", ""))
    }
  }

  /** Analyzed row count, if computeStats has run. */
  def rowCount(t: GraftTable): Option[Long] =
    tableStats(t).values.headOption.map(_.rows)

  /** Single-column informational PRIMARY KEY, if declared. */
  def primaryKeyColumn(t: GraftTable): Option[String] =
    t.snapshot.metadata.map(_.properties).getOrElse(Map.empty)
      .get("graft.pk").map(_.split(":", 2)(1).split(",").toSeq)
      .collect { case Seq(one) => one }

  /** Estimated selectivity of `column = const` via 1/NDV — the
    * classic uniform-distribution CBO estimate. A declared
    * single-column PRIMARY KEY is definitionally unique, so its NDV
    * is the footer-stats row count with no ANALYZE pass — exact where
    * the sampled NDV is approximate.
    */
  def equalitySelectivity(t: GraftTable, column: String): Option[Double] = {
    if (primaryKeyColumn(t).contains(column)) {
      val s = t.snapshot
      // the fast path is only exact when EVERY active file carries
      // footer stats (a stats-less file would silently undercount) and
      // after subtracting deletion-vector-masked rows — a MoR-deleted
      // table otherwise overstates rows and skews selectivity low
      if (s.activeFiles.forall(_.stats.isDefined)) {
        // DV entries are write-output directories; numRecords comes
        // from the part files' footers — metadata-only, no data scan
        val masked =
          if (s.dvFiles.isEmpty) 0L
          else {
            val parts = s.dvFiles.map(t.dataPath).flatMap { p =>
              val f = new java.io.File(p)
              if (f.isDirectory)
                f.listFiles().toSeq.map(_.getAbsolutePath)
                  .filter(_.endsWith(".parquet"))
              else Seq(p)
            }
            Stats.collect(t.spark, parts).values.map(_.numRecords).sum
          }
        val rows = s.activeFiles.flatMap(_.stats.map(_.numRecords)).sum - masked
        if (rows > 0) return Some(1.0 / rows)
      }
    }
    tableStats(t).get(column).map(s => 1.0 / math.max(1L, s.distinct))
  }

  /** Estimated surviving rows of an equality filter on `column`. */
  def estimatedRowsAfterEquality(t: GraftTable, column: String): Option[Long] =
    for {
      s <- tableStats(t).get(column)
      sel <- equalitySelectivity(t, column)
    } yield math.max(1L, math.round(s.rows * sel))

  // ------------------------------------------------ equi-height histograms

  final case class Histogram(rows: Long, buckets: Int,
                             bounds: Array[Double], ndv: Array[Long]) {
    /** Rows per bucket — the equi-height invariant. */
    def height: Double = rows.toDouble / buckets
  }

  /** Parsed `graft.hist.<column>` property, written by
    * [[GraftTable.computeHistogram]] / `ANALYZE ... FOR COLUMNS`.
    */
  def histogram(t: GraftTable, column: String): Option[Histogram] =
    t.snapshot.metadata.map(_.properties).getOrElse(Map.empty)
      .get(s"graft.hist.$column").map { v =>
        val f = v.split(";", -1).map { kv =>
          val Array(a, b) = kv.split("=", 2); a -> b
        }.toMap
        Histogram(f("rows").toLong, f("buckets").toInt,
          f("bounds").split(",").map(_.toDouble),
          f("ndv").split(",").map(_.toLong))
      }

  /** Histogram-aware equality selectivity for `column = value` — what
    * flips the 1/NDV estimate on a SKEWED key: a heavy hitter holding
    * ≥1/b of the rows shows up as REPEATED quantile boundaries, and
    * its true mass reads straight off the boundary multiplicity
    * ((k−1)/b of all rows for k equal boundaries — the equi-height
    * invariant). A light value falls inside one bucket and estimates
    * as that bucket's height/NDV — sharper than global 1/NDV whenever
    * the distinct values cluster unevenly across the range. Falls back
    * to the NDV estimate when no histogram was analyzed, and to the
    * histogram edge buckets for out-of-range probes (0 mass).
    */
  def equalitySelectivity(t: GraftTable, column: String,
      value: Double): Option[Double] =
    histogram(t, column) match {
      case None => equalitySelectivity(t, column)
      case Some(h) =>
        if (value < h.bounds.head || value > h.bounds.last) return Some(0.0)
        val k = h.bounds.count(_ == value)
        if (k >= 2) Some((k - 1).toDouble / h.buckets)
        else {
          // first bucket whose range contains the value
          val i = h.bounds.indexWhere(_ >= value) match {
            case 0 => 0
            case j if j > 0 => j - 1
            case _ => h.buckets - 1
          }
          val ndv = math.max(1L, h.ndv(math.min(i, h.buckets - 1)))
          Some(1.0 / (h.buckets.toDouble * ndv))
        }
    }

  /** Estimated surviving rows of `column = value`, histogram-first. */
  def estimatedRowsAfterEquality(t: GraftTable, column: String,
      value: Double): Option[Long] = {
    val rows = histogram(t, column).map(_.rows)
      .orElse(tableStats(t).get(column).map(_.rows))
    for {
      r <- rows
      sel <- equalitySelectivity(t, column, value)
    } yield math.round(r * sel)
  }

  /** Histogram-aware RANGE selectivity for `lo ≤ column ≤ hi` (either
    * bound open via -∞/+∞): each bucket contributes its full 1/b when
    * the range covers it and a linear-interpolated fraction when the
    * range cuts it — the textbook equi-height estimate. Uniform min/max
    * interpolation (what the footer-stats fallback would do) is wrong
    * in exactly the skewed case: a heavy value drags many boundaries to
    * one point, and the bucket-counting estimate follows the mass while
    * (hi−lo)/(max−min) follows the RANGE. Falls back to None without a
    * histogram — callers keep their existing uniform heuristics.
    */
  def rangeSelectivity(t: GraftTable, column: String,
      lo: Double, hi: Double): Option[Double] =
    histogram(t, column).map { h =>
      if (hi < lo || hi < h.bounds.head || lo > h.bounds.last) 0.0
      else {
        val frac = (0 until h.buckets).map { i =>
          val (bLo, bHi) = (h.bounds(i), h.bounds(i + 1))
          if (bHi < lo || bLo > hi) 0.0
          else if (bLo >= lo && bHi <= hi) 1.0
          else if (bHi == bLo) 1.0 // singleton bucket inside the range
          else {
            val cutLo = math.max(lo, bLo); val cutHi = math.min(hi, bHi)
            math.max(0.0, (cutHi - cutLo) / (bHi - bLo))
          }
        }.sum
        math.min(1.0, frac / h.buckets)
      }
    }

  /** Estimated surviving rows of a range filter, histogram-based. */
  def estimatedRowsAfterRange(t: GraftTable, column: String,
      lo: Double, hi: Double): Option[Long] =
    for {
      h <- histogram(t, column)
      sel <- rangeSelectivity(t, column, lo, hi)
    } yield math.round(h.rows * sel)

  /** Distinct values under `lo ≤ column ≤ hi`, from the same
    * per-bucket NDV array the histogram carries: covered buckets
    * contribute their full NDV, cut buckets a linearly-interpolated
    * share (≥1 while any overlap remains). The denominator the
    * runtime-filter decision needs — "how many distinct fact keys
    * could the dim's range even touch".
    */
  def rangeNdv(t: GraftTable, column: String,
      lo: Double, hi: Double): Option[Long] =
    histogram(t, column).map { h =>
      if (hi < lo || hi < h.bounds.head || lo > h.bounds.last) 0L
      else math.max(1L, math.round((0 until h.buckets).map { i =>
        val (bLo, bHi) = (h.bounds(i), h.bounds(i + 1))
        if (bHi < lo || bLo > hi) 0.0
        else if (bLo >= lo && bHi <= hi) h.ndv(i).toDouble
        else if (bHi == bLo) h.ndv(i).toDouble
        else {
          val cutLo = math.max(lo, bLo); val cutHi = math.min(hi, bHi)
          math.max(1.0, h.ndv(i) * (cutHi - cutLo) / (bHi - bLo))
        }
      }.sum))
    }

  /** Histogram-cost-based RUNTIME-FILTER decision (the §I stats story
    * extended from join SIDES to SCAN planning): given a fact column
    * and a dim key set summarized as (count, min, max), choose between
    *
    *  - `dfp-exact`  — few enough keys: enumerate them into the stats
    *    stack (file-level prune + exact row IN-filter), always best;
    *  - `bloom`      — many keys but the filter still cuts: pay the
    *    dim-side distinct + treeAggregate bloom build;
    *  - `plain`      — the filter would NOT cut: the dim range lands
    *    on the fact key's mass, so the bloom keeps ~everything and
    *    its build cost (plus a probe on every fact row) is pure waste.
    *
    * The kept-fraction estimate is where the histogram earns its keep:
    * mass(range) × min(1, nKeys / ndv(range)). Uniform min/max
    * reasoning gets exactly the skewed case wrong — a narrow dim range
    * sitting on a heavy value looks tiny by width but keeps most of
    * the table, and a wide range over a light tail looks huge by width
    * but keeps almost nothing. Without a histogram the decision falls
    * back to `bloom` (the previous static behavior — advisory filters
    * never affect correctness, only cost). Returns
    * (decision, estimatedKeptFraction).
    */
  def runtimeFilterDecision(t: GraftTable, column: String, nKeys: Long,
      dimLo: Double, dimHi: Double, maxKeys: Long = 10000L,
      minCutFraction: Double = 0.5): (String, Double) = {
    if (nKeys <= maxKeys) {
      val kept = rangeSelectivity(t, column, dimLo, dimHi).getOrElse(1.0)
      ("dfp-exact", kept)
    } else {
      (for {
        mass <- rangeSelectivity(t, column, dimLo, dimHi)
        ndvR <- rangeNdv(t, column, dimLo, dimHi)
      } yield {
        val kept = mass * math.min(1.0, nKeys.toDouble / math.max(1L, ndvR))
        (if (kept >= minCutFraction) "plain" else "bloom", kept)
      }).getOrElse(("bloom", 1.0))
    }
  }

  /** Read `column = value` of a table for use as a join side: the
    * HISTOGRAM estimate (not 1/NDV, not on-disk bytes) decides whether
    * the filtered side broadcasts. This is the decision a skewed key
    * breaks under 1/NDV: filtering on the heavy value keeps most of
    * the table — force-broadcasting it floods every executor — while
    * filtering on a light value keeps a handful of rows that SHOULD
    * broadcast even when the table's raw footprint says no.
    */
  def readForJoinEquality(t: GraftTable, column: String, value: Double,
      maxBroadcastRows: Long = 1000000L): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val df = t.toDF.filter(col(column) === lit(value))
    if (estimatedRowsAfterEquality(t, column, value).exists(_ <= maxBroadcastRows))
      broadcast(df)
    else df
  }

  /** Read a table for use as a join side: when the analyzed row count
    * is at or under `maxBroadcastRows`, attach an explicit broadcast
    * hint so the planner picks BroadcastHashJoin regardless of what
    * its size-in-bytes heuristic would conclude.
    */
  def readForJoin(t: GraftTable, maxBroadcastRows: Long = 1000000L): DataFrame = {
    val df = t.toDF
    if (rowCount(t).exists(_ <= maxBroadcastRows)) broadcast(df) else df
  }

  /** Shuffle width sized from snapshot bytes: enough partitions that
    * each holds ~`targetBytes` of (on-disk-compressed) input.
    */
  def suggestedShufflePartitions(t: GraftTable,
                                 targetBytes: Long = 64L * 1024 * 1024): Int =
    math.max(1, math.ceil(t.snapshot.sizeInBytes.toDouble / targetBytes).toInt)
}
