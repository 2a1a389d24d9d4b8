package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters summary (Misra & Gries 1982; merge rule
  * from Agarwal et al. 2013, "Mergeable Summaries", PODS): at most
  * k−1 counters, updated map-side and merged by summing counters then
  * subtracting the k-th largest count — the summary stays O(k) at
  * every stage, so a 100 TB scan ships k counters per partition
  * instead of a full distinct aggregate. Guarantees after any merge
  * tree: every item with true frequency > n/k survives, and each
  * surviving estimate e(x) satisfies f(x) − n/k ≤ e(x) ≤ f(x). Those
  * bounds — not the engine-specific counter values — are the oracle
  * contract (same pattern as q13's sketch-error rows).
  *
  * Output is the summary as (item, est) rows sorted (est desc, item)
  * for a deterministic explode order.
  */
case class MisraGries(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with UnaryLike[Expression] {

  require(k >= 2, "Misra-Gries needs k >= 2")

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(b: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String].toString
      b.get(item) match {
        case Some(c) => b.update(item, c + 1)
        case None if b.size < k - 1 => b.update(item, 1L)
        case None =>
          // decrement-all step: drops one "vote" from every counter
          val dead = b.iterator.collect { case (i, 1L) => i }.toList
          b.mapValuesInPlace((_, c) => c - 1)
          dead.foreach(b.remove)
      }
    }
    b
  }

  override def merge(b: mutable.HashMap[String, Long],
      o: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    o.foreach { case (i, c) => b.update(i, b.getOrElse(i, 0L) + c) }
    if (b.size > k - 1) {
      // subtract the k-th largest counter, keep strictly positive —
      // the Mergeable Summaries rule that preserves the n/k error
      // bound under arbitrary merge trees
      val kth = b.values.toArray.sorted(Ordering[Long].reverse).apply(k - 1)
      val dead = b.iterator.collect { case (i, c) if c <= kth => i }.toList
      b.mapValuesInPlace((_, c) => c - kth)
      dead.foreach(b.remove)
    }
    b
  }

  override def eval(b: mutable.HashMap[String, Long]): Any = {
    val rows = b.toArray.sortBy { case (i, c) => (-c, i) }.map { case (i, c) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(i), c))
    }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(b: mutable.HashMap[String, Long]): Array[Byte] = {
    val entries = b.toArray
    val payload = entries.map { case (i, _) =>
      i.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    }
    val bb = java.nio.ByteBuffer.allocate(
      4 + payload.map(p => 4 + p.length + 8).sum)
    bb.putInt(entries.length)
    entries.zip(payload).foreach { case ((_, c), p) =>
      bb.putInt(p.length); bb.put(p); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val out = mutable.HashMap.empty[String, Long]
    (0 until bb.getInt()).foreach { _ =>
      val p = new Array[Byte](bb.getInt())
      bb.get(p)
      out.update(new String(p, java.nio.charset.StandardCharsets.UTF_8),
        bb.getLong())
    }
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): MisraGries =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGries =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): MisraGries =
    copy(child = c)
  override def prettyName: String = "misra_gries"
}
