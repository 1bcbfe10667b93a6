package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registration of graft's custom Catalyst expressions as SQL functions —
  * both the `SparkSessionExtensions` injector form (for
  * `spark.sql.extensions=graft.plans.GraftExtensions` /
  * `builder.withExtensions`) and a direct per-session registrar for
  * sessions that already exist.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.dotFastDescriptor)
  }
}

object GraftExtensions {

  private def build(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "dot_fast(arrayA, arrayB) takes two arguments")
    DotProduct(exprs.head, exprs(1))
  }

  val dotFastDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("dot_fast"),
    new ExpressionInfo(classOf[DotProduct].getName, "dot_fast"),
    build _)

  /** Register `dot_fast` on an existing session (SQL surface:
    * `SELECT dot_fast(a, b)`).
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_fast", build, "scala_udf")
}
