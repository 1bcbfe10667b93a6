package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Order-preserving reinterpretation of a double as a signed long:
  * `x < y  ⟺  sortableBits(x) < sortableBits(y)` for all non-NaN
  * doubles (NaN maps above +∞, matching Spark's own sort order; -0.0
  * and +0.0 map to adjacent but distinct longs, which is irrelevant
  * after any grouping since Spark normalizes -0.0 to 0.0 in keys).
  *
  * This is the IEEE-754 total-order trick: the raw bits of non-negative
  * doubles already ascend with the value, and flipping the low 63 bits
  * of negative doubles (whose raw bits descend as the value ascends)
  * reverses them in place while keeping them below every non-negative —
  * one xor with a sign-propagated mask, branch-free.
  *
  * Why it exists: range-sharded prefix-sum kernels (e.g.
  * [[graft.functions.Stats.ks2Samp]]) need a shard index that is
  * MONOTONE in a double sort key, taken from the key's top bits the same
  * way [[graft.operators.Sampling]]'s sharded tiers take it from a long
  * key. There is no built-in SQL surface for `doubleToRawLongBits`, and
  * a Scala UDF would break whole-stage codegen in the hot scan, so this
  * is a native expression with `doGenCode`.
  */
case class DoubleSortableBits(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(x: Any): Any = {
    val b = java.lang.Double.doubleToRawLongBits(x.asInstanceOf[Double])
    b ^ ((b >> 63) & 0x7fffffffffffffffL)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => {
      val b = ctx.freshName("b")
      s"""
         |long $b = java.lang.Double.doubleToRawLongBits($d);
         |${ev.value} = $b ^ (($b >> 63) & 0x7fffffffffffffffL);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ScalarExpressions {
  import org.apache.spark.sql.GraftBridge.{column, expression}

  /** Monotone long view of a double column (see [[DoubleSortableBits]]). */
  def sortableBits(x: Column): Column = column(DoubleSortableBits(expression(x)))
}
