package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Custom Catalyst expressions for vector math.
  *
  * The higher-order-function form (`aggregate(zip_with(...))`) evaluates an
  * interpreted expression tree per element — fine for occasional use,
  * ~50× too slow in an all-pairs similarity join. This expression is a
  * single JVM while-loop over the two ArrayData buffers: one virtual call
  * per ROW instead of several per ELEMENT, and the summation stays
  * sequential left-to-right, so results are bit-identical to both the HOF
  * fold and DuckDB's `list_dot_product` oracle.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  import org.apache.spark.sql.GraftBridge.{column, expression}

  /** Fast sequential dot product of two `array<double>` columns. */
  def dotFast(a: Column, b: Column): Column =
    column(DotProduct(expression(a), expression(b)))
}
