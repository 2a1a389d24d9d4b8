package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** d-dimensional Hilbert-curve index of bucketed coordinates (child:
  * array<long> of per-column bucket ids, each < 2^bits). Adjacent
  * cells on the curve are adjacent in space (unlike Morton order,
  * whose bit-interleave takes long diagonal jumps), so files cut from
  * a Hilbert-sorted layout cover tighter hyper-rectangles — the
  * clustering Delta's liquid clustering uses for the same reason.
  * Skilling's public-domain transpose algorithm ("Programming the
  * Hilbert curve", AIP Conf. Proc. 707, 2004), codegen'd via a static
  * kernel call so layout jobs stay inside whole-stage codegen.
  */
case class HilbertIndex(child: Expression, bits: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    java.lang.Long.valueOf(
      HilbertIndex.kernel(v.asInstanceOf[ArrayData].toLongArray(), bits))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HilbertIndex.kernel($c.toLongArray(), $bits)")
  override protected def withNewChildInternal(c: Expression): HilbertIndex = copy(c)
}

object HilbertIndex {

  /** Hilbert index of point `coords` on the d-dim curve of order
    * `bits`. Requires d * bits <= 63 (the caller sizes buckets so the
    * index fits a long). Coordinates clamp into [0, 2^bits).
    */
  def kernel(coords: Array[Long], bits: Int): Long = {
    val n = coords.length
    val max = (1L << bits) - 1
    val x = new Array[Long](n)
    var i = 0
    while (i < n) {
      x(i) = math.min(max, math.max(0L, coords(i)))
      i += 1
    }
    // Skilling AxesToTranspose: inverse-undo excess work, then Gray
    val m = 1L << (bits - 1)
    var q = m
    while (q > 1) {
      val p = q - 1
      i = 0
      while (i < n) {
        if ((x(i) & q) != 0) x(0) ^= p
        else { val t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    i = 1
    while (i < n) { x(i) ^= x(i - 1); i += 1 }
    var t = 0L
    q = m
    while (q > 1) { if ((x(n - 1) & q) != 0) t ^= q - 1; q >>= 1 }
    i = 0
    while (i < n) { x(i) ^= t; i += 1 }
    // interleave the transpose MSB-first: bit b of x(i) lands at
    // position (b * n) + (n - 1 - i) of the index
    var h = 0L
    var b = bits - 1
    while (b >= 0) {
      i = 0
      while (i < n) { h = (h << 1) | ((x(i) >>> b) & 1L); i += 1 }
      b -= 1
    }
    h
  }
}
