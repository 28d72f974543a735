package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Deployment-path registration of every graft extension point in one
  * `spark.sql.extensions` injector:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * Injects the native vector/sketch functions
  * ([[graft.functions.VectorFunctions.builders]]), the surfaced Bloom
  * pair ([[graft.functions.VectorFunctions.bloomBuilders]]), the
  * partial-aggregating top-k heap (`graft_topk`,
  * [[graft.functions.TopKAggregate]]), and the as-of join planner
  * strategy ([[graft.plans.AsOfJoinStrategy]]) — so an interactive
  * user gets `SELECT graft_dot(a, b)` and as-of plans without calling
  * any per-session `register` (those remain for programmatic use; both
  * paths share the same builder lists, so the surfaces cannot drift).
  *
  * Functions are injected as built-in-style persistent registrations:
  * every session derived from the extended SparkSession sees them, the
  * same visibility Spark's own registry entries have.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    val fns: Seq[(String, Seq[Expression] => Expression)] =
      graft.functions.VectorFunctions.builders ++
        graft.functions.VectorFunctions.bloomBuilders ++
        Seq("graft_topk" -> ((exprs: Seq[Expression]) => {
          // arity-check before indexing: a bare-SQL caller's
          // graft_topk(x, y) should read as a wrong-argument-count
          // error, not an IndexOutOfBoundsException
          if (exprs.length != 3)
            throw new IllegalArgumentException(
              s"Invalid number of arguments for function graft_topk: " +
                s"expected 3 (score, id, k), found ${exprs.length}")
          graft.functions.TopKAgg(exprs(0), exprs(1), exprs(2))
        }))
    fns.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        builder))
    }
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
