package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Custom Catalyst expressions for vector math.
  *
  * The higher-order-function form (`aggregate(zip_with(...))`) evaluates an
  * interpreted expression tree per element — fine for occasional use,
  * ~50× too slow in an all-pairs similarity join. This expression emits a
  * tight Java loop over the two ArrayData buffers via `doGenCode`, so it
  * stays INSIDE whole-stage codegen (no interpreted boundary in the
  * similarity scan). The summation is sequential left-to-right, so
  * results are bit-identical to both the HOF fold and DuckDB's
  * `list_dot_product` oracle.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // interpreted path (non-codegen contexts, e.g. inside some aggregates)
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  import org.apache.spark.sql.GraftBridge.{column, expression}

  /** Cast to the 8-byte layout [[DotProduct]]'s buffer readers assume.
    * The expression itself cannot declare input types (Spark 4's
    * `AbstractDataType` is `private[sql]`), and an undeclared
    * `array<float>` input — the embeddings table's PHYSICAL type — would
    * silently read garbage through the 8-byte-stride getters. A trivial
    * cast on an already-`array<double>` column is erased by the
    * optimizer, so the guard is free where it isn't needed.
    */
  private def asDoubles(c: Expression): Expression =
    org.apache.spark.sql.catalyst.expressions.Cast(c, ArrayType(DoubleType))

  /** Fast sequential dot product of two array-of-numeric columns
    * (coerced to `array<double>`).
    */
  def dotFast(a: Column, b: Column): Column =
    column(DotProduct(expression(a.cast(ArrayType(DoubleType))),
      expression(b.cast(ArrayType(DoubleType)))))

  /** SQL-builder form: coerce both operands, then dot. */
  def dotFastExpr(a: Expression, b: Expression): Expression =
    DotProduct(asDoubles(a), asDoubles(b))
}
