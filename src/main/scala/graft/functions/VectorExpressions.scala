package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
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
