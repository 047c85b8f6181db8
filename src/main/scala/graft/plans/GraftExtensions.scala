package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DotProduct, WholeWordContains}

/** Session extensions exposing graft's native expressions to SQL:
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  * // or: --conf spark.sql.extensions=graft.plans.GraftExtensions
  * spark.sql("SELECT graft_dot(a.embedding, b.embedding) ...")
  * }}}
  *
  * For a session that already exists (e.g. a notebook), use
  * `GraftSqlShim.registerFunction` instead. No optimizer Rule or planner
  * Strategy is injected on purpose: every graft operator resolves to
  * built-in plans Catalyst already optimizes (SURVEY.md §4.2); the
  * custom surface is expression-level only.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getCanonicalName, "graft_dot"),
      (exprs: Seq[Expression]) => DotProduct(exprs.head, exprs(1))))
    e.injectFunction((
      FunctionIdentifier("graft_word_match"),
      new ExpressionInfo(classOf[WholeWordContains].getCanonicalName,
        "graft_word_match"),
      (exprs: Seq[Expression]) => WholeWordContains(exprs.head, exprs(1))))
  }
}
