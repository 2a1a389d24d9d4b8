package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native dot product over two numeric arrays (float or double
  * elements), accumulating left-to-right in double — bit-identical to
  * the `aggregate(zip_with(...))` composition it replaces, but a
  * single tight loop per row instead of interpreted per-element
  * lambda dispatch. Generates an inline loop in whole-stage codegen.
  */
case class DotProd(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  private def getter(arr: String, t: DataType, i: String): String = t match {
    case FloatType => s"(double) $arr.getFloat($i)"
    case DoubleType => s"$arr.getDouble($i)"
    case LongType => s"(double) $arr.getLong($i)"
    case IntegerType => s"(double) $arr.getInt($i)"
    case other => throw new IllegalArgumentException(s"unsupported element type $other")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (ta, tb) = (elemType(left), elemType(right))
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = ta match {
        case FloatType => a.getFloat(i).toDouble
        case DoubleType => a.getDouble(i)
        case LongType => a.getLong(i).toDouble
        case IntegerType => a.getInt(i).toDouble
        case _ => throw new IllegalArgumentException(s"unsupported element type $ta")
      }
      val y = tb match {
        case FloatType => b.getFloat(i).toDouble
        case DoubleType => b.getDouble(i)
        case LongType => b.getLong(i).toDouble
        case IntegerType => b.getInt(i).toDouble
        case _ => throw new IllegalArgumentException(s"unsupported element type $tb")
      }
      acc += x * y
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (${getter(a, elemType(left), i)}) * (${getter(b, elemType(right), i)});
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProd =
    copy(left = l, right = r)
}

/** Indices of the `p` nearest centroids (by cosine) for a vector, in
  * descending-similarity order (ties broken by lower index). The
  * centroid matrix rides along as a plan *reference object* — one
  * broadcast-style constant shared by the whole stage — instead of a
  * k×dim literal expression tree, so planning/codegen cost is O(1) in
  * k and the per-row cost is a single tight O(k·dim) loop. This is
  * what makes IVF coarse quantization viable at large k (k≈8√n): at
  * k=256, the literal-tree formulation was 16k+ expression nodes and
  * dominated the round-2 bench.
  */
case class TopCentroidIds(child: Expression, cents: Array[Array[Double]], p: Int)
    extends UnaryExpression {
  require(p >= 1 && p <= cents.length, s"p must be in [1, ${cents.length}], got $p")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any =
    TopCentroidIds.kernel(v.asInstanceOf[ArrayData], cents, p, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cents", cents, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TopCentroidIds.kernel($c, $ref, $p, $isFloat);")
  }

  override protected def withNewChildInternal(c: Expression): TopCentroidIds =
    copy(child = c)
}

object TopCentroidIds {
  /** Static kernel — also the codegen call target. Cosine reduces to
    * dot(v, c)/|c| argmax since |v| is constant across candidates.
    */
  /** Per-centroid inverse norms are plan constants — compute once per
    * centroid matrix identity, not once per row per centroid.
    */
  private val invNormCache =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[Array[Array[Double]], Array[Double]]())

  private def invNorms(cents: Array[Array[Double]]): Array[Double] = {
    val cached = invNormCache.get(cents)
    if (cached != null) return cached
    val out = new Array[Double](cents.length)
    var j = 0
    while (j < cents.length) {
      var nc = 0.0
      var i = 0
      val ct = cents(j)
      while (i < ct.length) { nc += ct(i) * ct(i); i += 1 }
      out(j) = if (nc > 0) 1.0 / math.sqrt(nc) else 0.0
      j += 1
    }
    invNormCache.put(cents, out)
    out
  }

  def kernel(v: ArrayData, cents: Array[Array[Double]], p: Int,
             isFloat: Boolean): ArrayData = {
    val k = cents.length
    val inv = invNorms(cents)
    val scores = new Array[Double](k)
    var j = 0
    while (j < k) {
      val ct = cents(j)
      val n = math.min(v.numElements(), ct.length)
      var dot = 0.0
      var i = 0
      while (i < n) {
        val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        dot += x * ct(i)
        i += 1
      }
      val s = dot * inv(j)
      // NaN (e.g. NaN element in the input vector) must not poison the
      // greedy selection below — map it to -Inf so ordering stays total.
      scores(j) = if (java.lang.Double.isNaN(s)) Double.NegativeInfinity else s
      j += 1
    }
    val out = new Array[Any](p)
    val taken = new Array[Boolean](k)
    var r = 0
    while (r < p) {
      var best = -1
      var bestScore = Double.NegativeInfinity
      var jj = 0
      while (jj < k) {
        if (!taken(jj) && scores(jj) > bestScore) { best = jj; bestScore = scores(jj) }
        jj += 1
      }
      if (best < 0) {
        // All remaining scores are -Inf (zero-norm centroids / NaN input):
        // fall back to the first un-taken index so output stays total and
        // deterministic.
        var f = 0
        while (taken(f)) f += 1
        best = f
      }
      taken(best) = true
      out(r) = best
      r += 1
    }
    new GenericArrayData(out)
  }
}

/** Cosine similarity of one corpus vector against ALL query vectors in
  * a single pass: returns an nq-element double array. The query matrix
  * rides along as a plan reference object (same trick as
  * [[TopCentroidIds]]); query norms are computed once per matrix
  * identity, so the per-row cost is nq fused dot products plus one
  * corpus-norm — no join, no shuffle, no n·nq intermediate rows.
  * Arithmetic is the exact chain the former
  * `DotProd(q,c)/(sqrt(DotProd(q,q))*sqrt(DotProd(c,c)))` composition
  * produced (left-to-right double accumulation), so the DuckDB
  * `list_cosine_similarity` oracle keeps matching at 4 dp.
  */
case class CosineScores(child: Expression, qvs: Array[Array[Double]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any =
    CosineScores.kernel(v.asInstanceOf[ArrayData], qvs, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("qvs", qvs, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CosineScores.kernel($c, $ref, $isFloat);")
  }

  override protected def withNewChildInternal(c: Expression): CosineScores =
    copy(child = c)
}

object CosineScores {
  private val normCache =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[Array[Array[Double]], Array[Double]]())

  private def norms(qvs: Array[Array[Double]]): Array[Double] = {
    val cached = normCache.get(qvs)
    if (cached != null) return cached
    val out = new Array[Double](qvs.length)
    var q = 0
    while (q < qvs.length) {
      var acc = 0.0
      var i = 0
      val qv = qvs(q)
      while (i < qv.length) { acc += qv(i) * qv(i); i += 1 }
      out(q) = math.sqrt(acc)
      q += 1
    }
    normCache.put(qvs, out)
    out
  }

  def kernel(v: ArrayData, qvs: Array[Array[Double]], isFloat: Boolean): ArrayData = {
    val qn = norms(qvs)
    val ne = v.numElements()
    var cc = 0.0
    var i = 0
    while (i < ne) {
      val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      cc += x * x
      i += 1
    }
    val cn = math.sqrt(cc)
    val out = new Array[Any](qvs.length)
    var q = 0
    while (q < qvs.length) {
      val qv = qvs(q)
      val n = math.min(ne, qv.length)
      var dot = 0.0
      i = 0
      while (i < n) {
        val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        dot += qv(i) * x
        i += 1
      }
      out(q) = java.lang.Double.valueOf(dot / (qn(q) * cn))
      q += 1
    }
    new GenericArrayData(out)
  }
}

/** Fused Euclidean-distance kernel, [[CosineScores]]'s L2 sibling:
  * one corpus row against every plan-constant query vector in a
  * single pass, returning NEGATED distances (−√Σ(vᵢ−qᵢ)²) so the
  * shared max-keeping [[ScoreTopK]] aggregate keeps the NEAREST
  * neighbors — one bounded top-k path serves every metric.
  */
case class L2Scores(child: Expression, qvs: Array[Array[Double]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any =
    L2Scores.kernel(v.asInstanceOf[ArrayData], qvs, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("qvs", qvs, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.L2Scores.kernel($c, $ref, $isFloat);")
  }

  override protected def withNewChildInternal(c: Expression): L2Scores =
    copy(child = c)
}

object L2Scores {
  def kernel(v: ArrayData, qvs: Array[Array[Double]], isFloat: Boolean): ArrayData = {
    val ne = v.numElements()
    val out = new Array[Any](qvs.length)
    var q = 0
    while (q < qvs.length) {
      val qv = qvs(q)
      val n = math.min(ne, qv.length)
      var acc = 0.0
      var i = 0
      while (i < n) {
        val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        val d = x - qv(i)
        acc += d * d
        i += 1
      }
      out(q) = java.lang.Double.valueOf(-math.sqrt(acc))
      q += 1
    }
    new GenericArrayData(out)
  }
}

/** Fused inner-product kernel (MIPS — maximum-inner-product search,
  * the metric recommendation/retrieval models train for): raw dot of
  * one corpus row against every plan-constant query vector. Largest
  * IS best, so [[ScoreTopK]] consumes the scores unmodified.
  */
case class InnerScores(child: Expression, qvs: Array[Array[Double]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any =
    InnerScores.kernel(v.asInstanceOf[ArrayData], qvs, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("qvs", qvs, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.InnerScores.kernel($c, $ref, $isFloat);")
  }

  override protected def withNewChildInternal(c: Expression): InnerScores =
    copy(child = c)
}

object InnerScores {
  def kernel(v: ArrayData, qvs: Array[Array[Double]], isFloat: Boolean): ArrayData = {
    val ne = v.numElements()
    val out = new Array[Any](qvs.length)
    var q = 0
    while (q < qvs.length) {
      val qv = qvs(q)
      val n = math.min(ne, qv.length)
      var dot = 0.0
      var i = 0
      while (i < n) {
        val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        dot += qv(i) * x
        i += 1
      }
      out(q) = java.lang.Double.valueOf(dot)
      q += 1
    }
    new GenericArrayData(out)
  }
}

/** Signed random-hyperplane LSH signature, one bit per plane packed
  * into a long (≤64 planes). Same reference-object trick as
  * [[TopCentroidIds]]: the plane matrix is a plan constant, not a
  * planes×dim literal tree, so 64-plane signatures (4 bands × 16 bits
  * = 65,536 buckets per band — bucket count ≥ O(√n) up to n≈4×10⁹)
  * cost the same to plan as 16-plane ones did.
  */
case class HyperplaneSigExpr(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression {
  require(planes.length <= 64, s"at most 64 planes fit a long, got ${planes.length}")

  override def dataType: DataType = LongType

  private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any =
    java.lang.Long.valueOf(
      HyperplaneSigExpr.kernel(v.asInstanceOf[ArrayData], planes, isFloat))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("planes", planes, "double[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HyperplaneSigExpr.kernel($c, $ref, $isFloat)")
  }

  override protected def withNewChildInternal(c: Expression): HyperplaneSigExpr =
    copy(child = c)
}

object HyperplaneSigExpr {
  def kernel(v: ArrayData, planes: Array[Array[Double]], isFloat: Boolean): Long = {
    var sig = 0L
    var j = 0
    while (j < planes.length) {
      val pl = planes(j)
      val n = math.min(v.numElements(), pl.length)
      var dot = 0.0
      var i = 0
      while (i < n) {
        val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        dot += x * pl(i)
        i += 1
      }
      if (dot > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }
}

/** SQ8 scalar-quantization scoring kernel (FAISS `SQ8` family): the
  * corpus row is quantized on the fly to one signed byte per
  * dimension against per-dimension int64 scales (`smax`, trained from
  * a deterministic strided sample), then scored against every
  * pre-quantized query in EXACT int64 — `num = Σ qq_d·c_d·smax_d`,
  * `norm² = Σ (c_d·smax_d)²` — with one double division at the edge.
  * Byte codes mean 4× less state than float32 when materialized; the
  * integer arithmetic means a DuckDB oracle can replay every code and
  * score bit-for-bit (quantize = FLOOR(x·10⁴+0.5); code =
  * sign-preserving truncating `(|q|·127)/smax`, the exact op chain
  * DuckDB's `//` floor-division matches on non-negatives).
  */
case class SqScores(child: Expression, smax: Array[Long],
    qqs: Array[Array[Long]]) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any =
    SqScores.kernel(v.asInstanceOf[ArrayData], smax, qqs, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sref = ctx.addReferenceObj("smax", smax, "long[]")
    val qref = ctx.addReferenceObj("qqs", qqs, "long[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SqScores.kernel($c, $sref, $qref, $isFloat);")
  }

  override protected def withNewChildInternal(c: Expression): SqScores =
    copy(child = c)
}

object SqScores {
  private val qnormCache =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[Array[Array[Long]], Array[Double]]())

  /** √(Σ qq_d²) per query — the int sum is exact, the sqrt is the one
    * shared double op (same value on both engines).
    */
  private def qnorms(qqs: Array[Array[Long]]): Array[Double] = {
    val cached = qnormCache.get(qqs)
    if (cached != null) return cached
    val out = new Array[Double](qqs.length)
    var q = 0
    while (q < qqs.length) {
      var acc = 0L
      var i = 0
      val qq = qqs(q)
      while (i < qq.length) { acc += qq(i) * qq(i); i += 1 }
      out(q) = math.sqrt(acc.toDouble)
      q += 1
    }
    qnormCache.put(qqs, out)
    out
  }

  /** Sign-preserving truncating code with the FAISS clamp: scales are
    * trained on a sample, so an unsampled outlier can exceed them —
    * its code saturates at ±127 instead of overflowing the byte range.
    */
  def quantizeToCode(q: Long, s: Long): Long =
    if (q < 0) -math.min(127L, ((-q) * 127L) / s)
    else math.min(127L, (q * 127L) / s)

  def kernel(v: ArrayData, smax: Array[Long], qqs: Array[Array[Long]],
      isFloat: Boolean): ArrayData = {
    val ne = math.min(v.numElements(), smax.length)
    // dequantized-code coordinates cs_d = c_d·smax_d and their exact
    // int64 norm² — the 127·10⁴ scale cancels between num and norm
    val cs = new Array[Long](ne)
    var norm2 = 0L
    var i = 0
    while (i < ne) {
      val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      val q = Math.round(x * 10000.0)
      val c = quantizeToCode(q, smax(i))
      val csd = c * smax(i)
      cs(i) = csd
      norm2 += csd * csd
      i += 1
    }
    scoreAgainst(cs, norm2, qqs)
  }

  /** Shared scoring tail: exact int64 dot of the dequantized-code
    * coordinates against every pre-quantized query, one double
    * division each — used by both the fused path and the
    * persisted-codes path so their scores are bit-identical.
    */
  def scoreAgainst(cs: Array[Long], norm2: Long,
      qqs: Array[Array[Long]]): ArrayData = {
    val qn = qnorms(qqs)
    val cn = math.sqrt(norm2.toDouble)
    val out = new Array[Any](qqs.length)
    var q = 0
    while (q < qqs.length) {
      val qq = qqs(q)
      val n = math.min(cs.length, qq.length)
      var num = 0L
      var i = 0
      while (i < n) { num += qq(i) * cs(i); i += 1 }
      out(q) = java.lang.Double.valueOf(
        if (norm2 > 0L && qn(q) > 0.0) num.toDouble / (cn * qn(q)) else 0.0)
      q += 1
    }
    new GenericArrayData(out)
  }
}

/** SQ8 encode: one signed byte per dimension against the trained
  * per-dimension scales — the materializable half of [[SqScores]]
  * (codes persist as a 4×-smaller sidecar at OPTIMIZE; scales are
  * KB-scale table metadata). Same quantize/clamp arithmetic, so a
  * stored code equals what the fused kernel derives on the fly.
  */
case class SqEncode(child: Expression, smax: Array[Long])
    extends UnaryExpression {

  override def dataType: DataType = BinaryType

  private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any =
    SqEncode.kernel(v.asInstanceOf[ArrayData], smax, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sref = ctx.addReferenceObj("smax", smax, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SqEncode.kernel($c, $sref, $isFloat);")
  }

  override protected def withNewChildInternal(c: Expression): SqEncode =
    copy(child = c)
}

object SqEncode {
  def kernel(v: ArrayData, smax: Array[Long], isFloat: Boolean): Array[Byte] = {
    val ne = math.min(v.numElements(), smax.length)
    val out = new Array[Byte](ne)
    var i = 0
    while (i < ne) {
      val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      out(i) = SqScores.quantizeToCode(Math.round(x * 10000.0), smax(i)).toByte
      i += 1
    }
    out
  }
}

/** [[SqScores]] over PERSISTED codes: reconstructs cs_d = code_d·smax_d
  * from the byte sidecar and runs the identical exact-int64 scoring —
  * reads 1 byte/dim instead of 4 (float32) with zero re-quantize work.
  */
case class SqScoresFromCodes(child: Expression, smax: Array[Long],
    qqs: Array[Array[Long]]) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    SqScoresFromCodes.kernel(v.asInstanceOf[Array[Byte]], smax, qqs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sref = ctx.addReferenceObj("smax", smax, "long[]")
    val qref = ctx.addReferenceObj("qqs", qqs, "long[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SqScoresFromCodes.kernel($c, $sref, $qref);")
  }

  override protected def withNewChildInternal(c: Expression): SqScoresFromCodes =
    copy(child = c)
}

object SqScoresFromCodes {
  def kernel(codes: Array[Byte], smax: Array[Long],
      qqs: Array[Array[Long]]): ArrayData = {
    val ne = math.min(codes.length, smax.length)
    val cs = new Array[Long](ne)
    var norm2 = 0L
    var i = 0
    while (i < ne) {
      val csd = codes(i).toLong * smax(i)
      cs(i) = csd
      norm2 += csd * csd
      i += 1
    }
    SqScores.scoreAgainst(cs, norm2, qqs)
  }
}

/** Greedy Maximal-Marginal-Relevance selection (S19): given ONE
  * query's candidate pool — an array of (cid, relevance, embedding)
  * structs, constant-bounded by the upstream top-k — repeatedly pick
  * argmax of λ·rel(i) − (1−λ)·max_{j∈S} sim(i, j), the Carbonell &
  * Goldstein '98 diversified re-rank every production RAG stack runs
  * after dense retrieval. λ = 0.5 keeps every multiply a power-of-two
  * scale (exact in IEEE double), so score comparisons cannot drift
  * against the DuckDB oracle's unrolled replay. Pairwise cosine uses
  * the [[CosineScores]] arithmetic (left-to-right double dot,
  * separately-rooted norms — the `list_cosine_similarity` form).
  * Runs once per query row (nq rows total): the selection is O(k·n)
  * with an O(k·n·dim) similarity bill, all inside one expression
  * eval — nothing here scales with the corpus.
  */
case class MmrSelect(child: Expression, lambda: Double, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("cid", LongType, nullable = false),
    StructField("mmr", DoubleType, nullable = false),
    StructField("rn", LongType, nullable = false))), containsNull = false)

  override def nullSafeEval(v: Any): Any =
    MmrSelect.kernel(v.asInstanceOf[ArrayData], lambda, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MmrSelect.kernel($c, $lambda, $k);")

  override protected def withNewChildInternal(c: Expression): MmrSelect =
    copy(child = c)
  override def prettyName: String = "mmr_select"
}

object MmrSelect {
  def kernel(cands: ArrayData, lambda: Double, k: Int): ArrayData = {
    val n = cands.numElements()
    val cid = new Array[Long](n)
    val rel = new Array[Double](n)
    val emb = new Array[Array[Double]](n)
    val norm = new Array[Double](n)
    var i = 0
    while (i < n) {
      val row = cands.getStruct(i, 3)
      cid(i) = row.getLong(0)
      rel(i) = row.getDouble(1)
      val a = row.getArray(2)
      val d = new Array[Double](a.numElements())
      var j = 0
      var acc = 0.0
      while (j < d.length) {
        d(j) = a.getFloat(j).toDouble; acc += d(j) * d(j); j += 1
      }
      emb(i) = d
      norm(i) = math.sqrt(acc)
      i += 1
    }
    def sim(a: Int, b: Int): Double = {
      val x = emb(a); val y = emb(b)
      val m = math.min(x.length, y.length)
      var dot = 0.0
      var j = 0
      while (j < m) { dot += x(j) * y(j); j += 1 }
      dot / (norm(a) * norm(b))
    }
    val selected = new Array[Boolean](n)
    // true max-sim to the selected set — cosine can be NEGATIVE, so a
    // zero-floored running max would silently inflate the penalty;
    // -inf until the first selection, 0 (empty-set max) at step 1
    val pen = Array.fill(n)(Double.NegativeInfinity)
    val out = Array.newBuilder[Any]
    val take = math.min(k, n)
    var s = 0
    while (s < take) {
      var best = -1
      var bestScore = 0.0
      i = 0
      while (i < n) {
        if (!selected(i)) {
          val p = if (s == 0) 0.0 else pen(i)
          val sc = lambda * rel(i) - (1.0 - lambda) * p
          if (best < 0 || sc > bestScore ||
              (sc == bestScore && cid(i) < cid(best))) {
            best = i; bestScore = sc
          }
        }
        i += 1
      }
      selected(best) = true
      out += new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](cid(best), bestScore, (s + 1).toLong))
      i = 0
      while (i < n) {
        if (!selected(i)) {
          val sv = sim(i, best)
          if (sv > pen(i)) pen(i) = sv
        }
        i += 1
      }
      s += 1
    }
    new GenericArrayData(out.result())
  }
}
