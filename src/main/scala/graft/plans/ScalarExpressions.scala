package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Order-preserving reinterpretation of a double as a signed long:
  * `x < y  ⟺  sortableBits(x) < sortableBits(y)` for all non-NaN
  * doubles (EVERY NaN maps above +∞ — `doubleToLongBits` canonicalizes
  * all NaN payloads, including sign-bit-set NaNs readable from
  * externally written parquet, to the one positive quiet-NaN pattern —
  * matching Spark's own sort order; -0.0 and +0.0 map to adjacent but
  * distinct longs, which is irrelevant after any grouping since Spark
  * normalizes -0.0 to 0.0 in keys).
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
    val b = java.lang.Double.doubleToLongBits(x.asInstanceOf[Double])
    b ^ ((b >> 63) & 0x7fffffffffffffffL)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => {
      val b = ctx.freshName("b")
      s"""
         |long $b = java.lang.Double.doubleToLongBits($d);
         |${ev.value} = $b ^ (($b >> 63) & 0x7fffffffffffffffL);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ScalarExpressions {
  import org.apache.spark.sql.GraftBridge.{column, expression}
  import org.apache.spark.sql.functions.{coalesce, lit}

  /** Monotone long view of a double column (see [[DoubleSortableBits]]). */
  def sortableBits(x: Column): Column = column(DoubleSortableBits(expression(x)))

  /** Key for a DELIBERATE single-partition window over a bounded (≤ a few
    * thousand rows by construction) relation: provably non-null and
    * non-foldable. `c * 0` alone silently splits the window into TWO
    * partitions (0 and null) if `c` is ever null, corrupting
    * row_number/lag/prefix sums; a bare literal is folded by
    * ConstantFolding back to the empty partition spec, which re-triggers
    * WindowExec's single-partition hazard warning. `coalesce(c·0, 0)`
    * is both: the outer coalesce absorbs nulls, the inner attribute
    * reference keeps it non-foldable. Use this at EVERY constant-key
    * window site — never inline the idiom.
    */
  def singlePartitionKey(c: Column): Column = coalesce(c * lit(0L), lit(0L))
}
