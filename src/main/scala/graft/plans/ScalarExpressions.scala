package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

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

/** Unicode NFC normalization of a string column — the text-cleaning
  * primitive (composed form: `e` + COMBINING ACUTE → `é`) that makes
  * dedup fingerprints, shingles, and equality joins insensitive to how a
  * crawler happened to encode the same glyphs. Spark has no built-in
  * normalizer and a Scala UDF would break whole-stage codegen in the
  * cleaning scan, so this is a native expression whose generated code
  * calls the same static helper as the interpreted path. The helper
  * fast-paths already-normalized input (the overwhelmingly common case:
  * `Normalizer.isNormalized` is a cheap scan) and returns the INPUT
  * UTF8String untouched, allocating only when composition actually
  * rewrites bytes. DuckDB's `nfc_normalize` implements the same Unicode
  * algorithm, so results are oracle-comparable byte-for-byte.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def nullSafeEval(s: Any): Any =
    StringNormalize.nfc(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.StringNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Static normalization helper shared by [[NfcNormalize]]'s interpreted
  * and generated paths (codegen references it by fully-qualified name).
  */
object StringNormalize {
  def nfc(s: UTF8String): UTF8String = {
    val j = s.toString
    if (java.text.Normalizer.isNormalized(j, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(j, java.text.Normalizer.Form.NFC))
  }
}

object ScalarExpressions {
  import org.apache.spark.sql.GraftBridge.{column, expression}
  import org.apache.spark.sql.functions.{coalesce, lit}

  /** Monotone long view of a double column (see [[DoubleSortableBits]]). */
  def sortableBits(x: Column): Column = column(DoubleSortableBits(expression(x)))

  /** Unicode-NFC-normalized view of a string column (see [[NfcNormalize]]). */
  def nfc(s: Column): Column = column(NfcNormalize(expression(s)))

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
