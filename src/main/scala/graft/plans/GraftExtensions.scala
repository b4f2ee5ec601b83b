package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistryBase
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.CosineSimilarity

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions into the session FunctionRegistry, so plain SQL can call
  * them (`SELECT cosine_sim(a.embedding, b.embedding) ...`).
  *
  * Enable with:
  * {{{
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.plans.GraftExtensions")
  * }}}
  * The DataFrame API path (graft.functions.cosineSim) does not require the
  * extension — it builds the expression directly.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    val (info: ExpressionInfo, builder) =
      FunctionRegistryBase.build[CosineSimilarity]("cosine_sim", since = None)
    ext.injectFunction((FunctionIdentifier("cosine_sim"), info,
      (children: Seq[Expression]) => builder(children)))
  }
}
