package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.parser.CatalystSqlParser

/** Registration of graft's SQL function surface — both the
  * `SparkSessionExtensions` injector form (for
  * `spark.sql.extensions=graft.plans.GraftExtensions` /
  * `builder.withExtensions`) and a direct per-session registrar for
  * sessions that already exist.
  *
  * Functions are Catalyst EXPRESSION TREES, not UDFs: `dot_fast` /
  * `cosine_sim` expand to [[DotProduct]] nodes, and the text functions
  * expand parse-templates (md5/regexp/filter/CASE compositions that
  * mirror [[graft.functions.TextFunctions]] exactly) with the argument
  * substituted for the `x0` placeholder — so everything resolves through
  * the analyzer and stays inside whole-stage codegen like any built-in.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.descriptors.foreach(ext.injectFunction)
}

object GraftExtensions {

  /** Parse `template` and substitute the single `x0` placeholder with the
    * caller's argument. Nested unresolved functions resolve in the
    * analyzer's fixed point like any parsed SQL.
    */
  private def template(sql: String)(args: Seq[Expression]): Expression =
    CatalystSqlParser.parseExpression(sql).transformUp {
      case a: UnresolvedAttribute if a.nameParts == Seq("x0") => args.head
    }

  private val fingerprintSql =
    "md5(CAST(regexp_replace(lower(trim(x0)), '\\\\s+', ' ') AS BINARY))"
  private val tokenCountSql = "size(split(trim(x0), '\\\\s+'))"

  private val langIdSql: String = {
    val scores = graft.functions.TextFunctions.LangStopwords.map { case (l, ws) =>
      l -> s"size(filter(split(trim(x0), '\\\\s+'), t -> t IN (${ws.map(w => s"'$w'").mkString(", ")})))"
    } :+ ("zh" -> s"size(regexp_extract_all(x0, '[一-鿿]', 0))")
    val cases = scores.init.zipWithIndex.map { case ((l, s), i) =>
      val rest = scores.drop(i + 1).map(_._2)
      s"WHEN ${rest.map(r => s"$s >= $r").mkString(" AND ")} THEN '$l'"
    }
    s"CASE ${cases.mkString(" ")} ELSE '${scores.last._1}' END"
  }

  private def arity(name: String, n: Int)(f: Seq[Expression] => Expression)
    : Seq[Expression] => Expression =
    exprs => {
      require(exprs.length == n, s"$name takes $n argument(s)")
      f(exprs)
    }

  /** Typed Aggregator → Catalyst aggregate expression, the same
    * construction Spark's `udf.register(udaf(...))` path uses — so
    * Aggregators are injectable through `injectFunction` like any
    * expression builder (not only registrable per-session).
    */
  private def aggBuilder[IN, BUF, OUT](
      agg: org.apache.spark.sql.expressions.Aggregator[IN, BUF, OUT],
      enc: org.apache.spark.sql.Encoder[IN])(e: Seq[Expression]): Expression =
    org.apache.spark.sql.GraftBridge.scalaAggregator(agg, enc, e)

  private val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "dot_fast" -> arity("dot_fast", 2)(e => VectorExpressions.dotFastExpr(e.head, e(1))),
    "sortable_bits" -> arity("sortable_bits", 1)(e => DoubleSortableBits(e.head)),
    "mad_std" -> arity("mad_std", 1)(
      aggBuilder(new graft.functions.Stats.MadStdAgg(), org.apache.spark.sql.Encoders.DOUBLE)),
    "tdigest_quartiles" -> arity("tdigest_quartiles", 1)(
      aggBuilder(
        new graft.functions.TDigest.Agg(100.0, Seq(0.25, 0.5, 0.75)),
        org.apache.spark.sql.Encoders.DOUBLE)),
    "cosine_sim" -> arity("cosine_sim", 2) { e =>
      import org.apache.spark.sql.catalyst.expressions.{Divide, Multiply, Sqrt}
      val dot = VectorExpressions.dotFastExpr _
      Divide(
        dot(e.head, e(1)),
        Multiply(Sqrt(dot(e.head, e.head)), Sqrt(dot(e(1), e(1)))))
    },
    "graft_fingerprint" -> arity("graft_fingerprint", 1)(template(fingerprintSql)),
    "graft_token_count" -> arity("graft_token_count", 1)(template(tokenCountSql)),
    "graft_lang_id" -> arity("graft_lang_id", 1)(template(langIdSql)),
    // Acklam inverse-normal CDF (shared text with the n3_erf_probit
    // oracle); the argument subtree is substituted at each placeholder
    // occurrence, so pass a column, not an expensive expression
    "graft_probit" -> arity("graft_probit", 1)(
      template(graft.fit.ClosedForm.probitText("x0"))))

  val descriptors: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    builders.map { case (name, b) =>
      (FunctionIdentifier(name), new ExpressionInfo("graft.plans.GraftExtensions", name), b)
    }

  /** Register every graft SQL function (aggregates included — they share
    * the expression-builder form via [[aggBuilder]]) on an existing
    * session.
    */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, b, "scala_udf")
    }
}
