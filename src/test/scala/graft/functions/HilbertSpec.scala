package graft.functions

import graft.{GraftSparkSpec, Tables}
import graft.lake.GraftTable
import org.apache.spark.sql.functions._

/** Hilbert-curve clustering: kernel invariants (bijection + unit-step
  * adjacency — the property that distinguishes Hilbert from Morton)
  * and the table-layout integration behind `graft.layout.curve`.
  */
class HilbertSpec extends GraftSparkSpec {

  test("2-D Hilbert index is a bijection whose consecutive cells are adjacent") {
    val bits = 4
    val side = 1 << bits
    val pts = for (xx <- 0 until side; yy <- 0 until side)
      yield (HilbertIndex.kernel(Array(xx.toLong, yy.toLong), bits), (xx, yy))
    val byIdx = pts.sortBy(_._1)
    assert(byIdx.map(_._1) == (0L until (side.toLong * side)).toSeq,
      "indices must cover [0, 4^bits) exactly once")
    byIdx.sliding(2).foreach { case Seq((_, (x1, y1)), (_, (x2, y2))) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"curve jumped from ($x1,$y1) to ($x2,$y2)")
    }
  }

  test("3-D Hilbert index keeps bijection + adjacency") {
    val bits = 3
    val side = 1 << bits
    val pts = for {
      xx <- 0 until side; yy <- 0 until side; zz <- 0 until side
    } yield (HilbertIndex.kernel(Array(xx.toLong, yy.toLong, zz.toLong), bits),
      (xx, yy, zz))
    val byIdx = pts.sortBy(_._1)
    assert(byIdx.map(_._1) == (0L until math.pow(side, 3).toLong).toSeq)
    byIdx.sliding(2).foreach { case Seq((_, (x1, y1, z1)), (_, (x2, y2, z2))) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) + math.abs(z1 - z2) == 1)
    }
  }

  test("graft.layout.curve=hilbert clusters for skipping and preserves content") {
    val li = Tables(spark, sfDir, "lineitem")
    val t = GraftTable.create(spark, tmpDir("hilbert"), li.repartition(8),
      properties = Map("graft.layout.curve" -> "hilbert"))
    val before = li.count()
    t.zorderBy(32L * 1024, "l_partkey", "l_suppkey")
    val (kept, total) = t.pruneFiles(col("l_partkey") <= 10L)
    assert(total > 1)
    assert(kept < total, s"hilbert layout should make l_partkey skippable: $kept/$total")
    assert(t.toDF.count() == before, "layout rewrite must preserve every row")
  }
}
