package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Row-level bloom membership test as a native codegen'd predicate —
  * the runtime half of a bloom semi-join (Spark's own
  * `runtime.bloomFilter` rewrite, surfaced as a table-API primitive).
  *
  * The serialized filter rides the expression into the task closure
  * once per executor and deserializes lazily; per row the test is a
  * few hash probes into a local bitset, inside whole-stage codegen.
  * False positives only widen the scan — the join that follows
  * applies the exact key equality, so correctness never depends on
  * the filter. Key hashing matches `GraftTable.computeBloomFilter`'s
  * convention (putLong for integrals, putString for strings) so the
  * same sidecar bytes are testable here.
  */
case class BloomMightContain(child: Expression, bloomBytes: Array[Byte])
  extends UnaryExpression with Predicate {

  @transient private lazy val bf: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bloomBytes))

  private def isIntegral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (isIntegral(child.dataType) || child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bloom membership supports integral/string keys, not ${child.dataType}")

  def testLong(v: Long): Boolean = bf.mightContainLong(v)
  def testString(v: UTF8String): Boolean = bf.mightContainString(v.toString)

  override def nullSafeEval(v: Any): Any =
    if (isIntegral(child.dataType))
      java.lang.Boolean.valueOf(testLong(v.asInstanceOf[Number].longValue()))
    else java.lang.Boolean.valueOf(testString(v.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomMc", this, classOf[BloomMightContain].getName)
    if (isIntegral(child.dataType))
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.testLong((long)($c));")
    else
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.testString($c);")
  }

  override protected def withNewChildInternal(c: Expression): BloomMightContain =
    copy(child = c)
}
