package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, LongType, FloatType, StructField, StructType}

/** Product-quantization ADC scan (Jégou et al. 2011, "Product
  * Quantization for Nearest Neighbor Search", IEEE TPAMI): one
  * codegen'd pass per corpus vector that (a) encodes the vector —
  * per-subspace argmin against the codebook — and (b) emits the
  * asymmetric-distance-computation value for every query via table
  * lookups. At scale the codes are what you'd materialize at OPTIMIZE
  * time (a 32× memory compression of float32 embeddings); here the
  * encode fuses into the scan because the corpus streams through
  * anyway.
  *
  * ALL arithmetic is exact int64: coordinates quantize to units of
  * 1e-4 via floor(x·10⁴ + 0.5) — the one rounding both this kernel
  * and DuckDB's FLOOR express identically for negative values, unlike
  * ROUND's half-away-from-zero — and L2² distances are integer sums,
  * associative in any order. No float-summation-order hazard exists
  * anywhere in the operator, so the DuckDB oracle matches bit-for-bit.
  */
case class PqAdcDistances(child: Expression,
    codebooks: Array[Array[Array[Long]]], // m × ks × sub quantized coords
    qtables: Array[Array[Array[Long]]])   // nq × m × ks integer L2² tables
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any =
    PqAdcDistances.kernel(v.asInstanceOf[ArrayData], codebooks, qtables, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val b = ctx.addReferenceObj("books", codebooks, "long[][][]")
    val t = ctx.addReferenceObj("qtables", qtables, "long[][][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PqAdcDistances.kernel($c, $b, $t, $isFloat);")
  }

  override protected def withNewChildInternal(c: Expression): PqAdcDistances =
    copy(child = c)
}

object PqAdcDistances {
  final val Scale = 10000.0

  /** floor(x·10⁴ + 0.5) — Math.round(double)'s definition, chosen
    * because DuckDB's FLOOR(x*10000 + 0.5) is the same IEEE op chain.
    */
  def quantize(x: Double): Long = Math.round(x * Scale)

  def kernel(v: ArrayData, books: Array[Array[Array[Long]]],
             qtables: Array[Array[Array[Long]]], isFloat: Boolean): GenericArrayData = {
    val codes = PqEncode.kernel(v, books, isFloat)
    PqAdcFromCodes.kernel(codes, qtables)
  }
}

/** Encode one vector to its PQ codes: per-subspace argmin against the
  * codebook, one byte per subspace (requires ks ≤ 256 codewords). This
  * is the kernel OPTIMIZE runs when materializing a PQ index — codes
  * are m bytes/vector, an 8× compression of the float32 embedding at
  * m = dim/2, and later ANN queries scan codes instead of vectors.
  * Same exact-int64 arithmetic as [[PqAdcDistances]] (ties → lowest
  * codeword), so codes match the DuckDB replica bit-for-bit.
  */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Long]]])
  extends UnaryExpression {
  require(codebooks(0).length <= 256, "PQ codes are one byte: ks must be <= 256")

  override def dataType: DataType = BinaryType

  private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any =
    PqEncode.kernel(v.asInstanceOf[ArrayData], codebooks, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val b = ctx.addReferenceObj("books", codebooks, "long[][][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PqEncode.kernel($c, $b, $isFloat);")
  }

  override protected def withNewChildInternal(c: Expression): PqEncode =
    copy(child = c)
}

object PqEncode {
  def kernel(v: ArrayData, books: Array[Array[Array[Long]]],
             isFloat: Boolean): Array[Byte] = {
    import PqAdcDistances.quantize
    val m = books.length
    val sub = books(0)(0).length
    val codes = new Array[Byte](m)
    var j = 0
    while (j < m) {
      val base = j * sub
      val cws = books(j)
      var best = 0
      var bestD = Long.MaxValue
      var cidx = 0
      while (cidx < cws.length) {
        val cw = cws(cidx)
        var d = 0L
        var i = 0
        while (i < sub) {
          val x = quantize(
            if (isFloat) v.getFloat(base + i).toDouble else v.getDouble(base + i))
          val diff = x - cw(i)
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; best = cidx } // tie → lowest cid
        cidx += 1
      }
      codes(j) = best.toByte
      j += 1
    }
    codes
  }
}

/** ADC distances from MATERIALIZED codes: the m-byte code column
  * (written at OPTIMIZE by [[PqEncode]]) turns into the per-query
  * integer L2² sums via pure table lookups — no embedding read, no
  * encode argmin, just m additions per (row, query). This is the
  * 100 TB query path: the scan is memory-bound over m bytes/vector.
  */
case class PqAdcFromCodes(child: Expression, qtables: Array[Array[Array[Long]]])
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    PqAdcFromCodes.kernel(v.asInstanceOf[Array[Byte]], qtables)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val t = ctx.addReferenceObj("qtables", qtables, "long[][][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PqAdcFromCodes.kernel($c, $t);")
  }

  override protected def withNewChildInternal(c: Expression): PqAdcFromCodes =
    copy(child = c)
}

object PqAdcFromCodes {
  def kernel(codes: Array[Byte], qtables: Array[Array[Array[Long]]]): GenericArrayData = {
    val m = codes.length
    val out = new Array[Any](qtables.length)
    var qi = 0
    while (qi < qtables.length) {
      val qt = qtables(qi)
      var s = 0L
      var j = 0
      while (j < m) { s += qt(j)(codes(j) & 0xFF); j += 1 }
      out(qi) = java.lang.Long.valueOf(s)
      qi += 1
    }
    new GenericArrayData(out)
  }
}

/** Bounded top-k-per-query aggregate over the ADC scan's output: input
  * rows are (cid, array of nq ADC distances); the buffer holds nq
  * sorted (adc, cid) lists capped at k pairs each. This is the shape
  * that survives 100 TB: PQ scores EVERY corpus row, so a window-rank
  * top-k would shuffle n·nq scored rows to nq partitions — this
  * aggregate instead combines map-side (each task ships ≤ nq·k pairs,
  * KBs) and the final merge touches #partitions·nq·k pairs total.
  * Ties break toward the lowest cid, matching the DuckDB oracle's
  * `ORDER BY adc, cid`.
  */
case class PqTopK(cid: Expression, adcs: Expression, nq: Int, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Array[Long]]] with BinaryLike[Expression] {

  override def left: Expression = cid
  override def right: Expression = adcs
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("qid", LongType, nullable = false),
    StructField("cid", LongType, nullable = false),
    StructField("adc", LongType, nullable = false),
    StructField("rn", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): Array[Array[Long]] =
    Array.fill(nq)(Array.emptyLongArray)

  override def update(b: Array[Array[Long]], input: InternalRow): Array[Array[Long]] = {
    val c = cid.eval(input)
    val a = adcs.eval(input)
    if (c != null && a != null) {
      val id = c.asInstanceOf[Long]
      val arr = a.asInstanceOf[ArrayData]
      var qi = 0
      while (qi < nq) { b(qi) = insert(b(qi), arr.getLong(qi), id); qi += 1 }
    }
    b
  }

  override def merge(b: Array[Array[Long]], o: Array[Array[Long]]): Array[Array[Long]] = {
    var qi = 0
    while (qi < nq) {
      val ob = o(qi)
      var i = 0
      while (i < ob.length) { b(qi) = insert(b(qi), ob(i), ob(i + 1)); i += 2 }
      qi += 1
    }
    b
  }

  /** Insert one (adc, cid) pair into a flat [adc0,cid0,adc1,cid1,…]
    * array kept ascending by (adc, cid) and capped at k pairs. k is
    * single-digit, so an O(k) copy beats heap bookkeeping.
    */
  private def insert(arr: Array[Long], adc: Long, id: Long): Array[Long] = {
    val np = arr.length / 2
    var pos = 0
    while (pos < np &&
      (arr(2 * pos) < adc || (arr(2 * pos) == adc && arr(2 * pos + 1) < id))) pos += 1
    if (pos >= k) return arr
    val newNp = math.min(k, np + 1)
    val out = new Array[Long](newNp * 2)
    System.arraycopy(arr, 0, out, 0, pos * 2)
    out(2 * pos) = adc
    out(2 * pos + 1) = id
    val tailPairs = math.min(np - pos, newNp - pos - 1)
    if (tailPairs > 0) System.arraycopy(arr, pos * 2, out, (pos + 1) * 2, tailPairs * 2)
    out
  }

  override def eval(b: Array[Array[Long]]): Any = {
    val rows = Array.newBuilder[Any]
    var qi = 0
    while (qi < nq) {
      val a = b(qi)
      var i = 0
      while (i < a.length) {
        rows += new GenericInternalRow(
          Array[Any](qi.toLong, a(i + 1), a(i), (i / 2 + 1).toLong))
        i += 2
      }
      qi += 1
    }
    new GenericArrayData(rows.result())
  }

  override def serialize(b: Array[Array[Long]]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + b.map(a => 4 + a.length * 8).sum)
    bb.putInt(b.length)
    b.foreach { a => bb.putInt(a.length); a.foreach(bb.putLong) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Array[Long]] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bb.getInt()) { Array.fill(bb.getInt())(bb.getLong()) }
  }

  override def withNewMutableAggBufferOffset(o: Int): PqTopK = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): PqTopK = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqTopK =
    copy(cid = l, adcs = r)
  override def prettyName: String = "pq_topk"
}

/** [[PqTopK]] generalized to double scores, DESCENDING (similarity,
  * not distance): input rows are (cid, array of nq cosine scores); the
  * buffer keeps nq sorted lists of ≤k (score, cid) pairs, score bits
  * stored via `doubleToLongBits` so the flat-long-array buffer layout
  * and serializer carry over unchanged. Comparison uses
  * `java.lang.Double.compare` — a total order whose NaN-is-largest
  * convention matches Spark's `desc` window sort, so this aggregate is
  * a drop-in for the `row_number() over (partition by qid order by cos
  * desc, cid)` shape without the n·nq-rows-into-nq-reducers shuffle:
  * each map task ships ≤ nq·k pairs and the final merge touches
  * #partitions·nq·k pairs total. Ties break toward the lowest cid,
  * matching the oracle's `ORDER BY cos DESC, cid`.
  */
case class ScoreTopK(cid: Expression, scores: Expression, nq: Int, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Array[Long]]] with BinaryLike[Expression] {

  override def left: Expression = cid
  override def right: Expression = scores
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("qid", LongType, nullable = false),
    StructField("cid", LongType, nullable = false),
    StructField("cos", DoubleType, nullable = false),
    StructField("rn", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): Array[Array[Long]] =
    Array.fill(nq)(Array.emptyLongArray)

  override def update(b: Array[Array[Long]], input: InternalRow): Array[Array[Long]] = {
    val c = cid.eval(input)
    val a = scores.eval(input)
    if (c != null && a != null) {
      val id = c.asInstanceOf[Long]
      val arr = a.asInstanceOf[ArrayData]
      var qi = 0
      while (qi < nq) {
        b(qi) = insert(b(qi), java.lang.Double.doubleToLongBits(arr.getDouble(qi)), id)
        qi += 1
      }
    }
    b
  }

  override def merge(b: Array[Array[Long]], o: Array[Array[Long]]): Array[Array[Long]] = {
    var qi = 0
    while (qi < nq) {
      val ob = o(qi)
      var i = 0
      while (i < ob.length) { b(qi) = insert(b(qi), ob(i), ob(i + 1)); i += 2 }
      qi += 1
    }
    b
  }

  /** Insert one (scoreBits, cid) pair into a flat array kept DESCENDING
    * by score (ties ascending by cid) and capped at k pairs.
    */
  private def insert(arr: Array[Long], sBits: Long, id: Long): Array[Long] = {
    val s = java.lang.Double.longBitsToDouble(sBits)
    val np = arr.length / 2
    var pos = 0
    var advance = true
    while (pos < np && advance) {
      val cmp = java.lang.Double.compare(java.lang.Double.longBitsToDouble(arr(2 * pos)), s)
      if (cmp > 0 || (cmp == 0 && arr(2 * pos + 1) < id)) pos += 1 else advance = false
    }
    if (pos >= k) return arr
    val newNp = math.min(k, np + 1)
    val out = new Array[Long](newNp * 2)
    System.arraycopy(arr, 0, out, 0, pos * 2)
    out(2 * pos) = sBits
    out(2 * pos + 1) = id
    val tailPairs = math.min(np - pos, newNp - pos - 1)
    if (tailPairs > 0) System.arraycopy(arr, pos * 2, out, (pos + 1) * 2, tailPairs * 2)
    out
  }

  override def eval(b: Array[Array[Long]]): Any = {
    val rows = Array.newBuilder[Any]
    var qi = 0
    while (qi < nq) {
      val a = b(qi)
      var i = 0
      while (i < a.length) {
        rows += new GenericInternalRow(Array[Any](qi.toLong, a(i + 1),
          java.lang.Double.longBitsToDouble(a(i)), (i / 2 + 1).toLong))
        i += 2
      }
      qi += 1
    }
    new GenericArrayData(rows.result())
  }

  override def serialize(b: Array[Array[Long]]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + b.map(a => 4 + a.length * 8).sum)
    bb.putInt(b.length)
    b.foreach { a => bb.putInt(a.length); a.foreach(bb.putLong) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Array[Long]] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bb.getInt()) { Array.fill(bb.getInt())(bb.getLong()) }
  }

  override def withNewMutableAggBufferOffset(o: Int): ScoreTopK = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ScoreTopK = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ScoreTopK =
    copy(cid = l, scores = r)
  override def prettyName: String = "score_topk"
}
