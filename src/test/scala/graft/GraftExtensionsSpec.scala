package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The `spark.sql.extensions=graft.GraftExtensions` deployment path:
  * a session built with the injector must expose every graft function
  * by bare SQL name (no per-session register calls) and plan as-of
  * joins through the injected strategy. Built over the SAME
  * SparkContext as the shared test session — extensions bind to the
  * SparkSession, not the context.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("an extended session exposes graft functions and the as-of strategy") {
    val base = TestSpark.spark // ensure the shared context exists first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // `spark.sql.extensions` is a STATIC conf — it only takes effect
    // on a fresh SparkContext, which a shared-JVM test can't build. So
    // exercise the injector through builder.withExtensions, which runs
    // the exact same GraftExtensions.apply the conf path invokes.
    val ext =
      try SparkSession.builder()
        .master("local[4]")
        .withExtensions(new graft.GraftExtensions())
        .getOrCreate()
      finally {
        SparkSession.setDefaultSession(base)
        SparkSession.setActiveSession(base)
      }
    assert(ext ne base) // a genuinely new session, same context

    // native functions resolve by bare SQL name and compute
    val dot = ext.sql("SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .collect()(0).getDouble(0)
    assert(dot === 11.0)
    val topk = ext.sql(
      "SELECT graft_topk(CAST(id AS DOUBLE), id, 3) AS t FROM range(10)")
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
    assert(topk.map(_.getLong(1)) === Seq(9L, 8L, 7L))

    // every injected name is resolvable (bloom pair included)
    val names = (graft.functions.VectorFunctions.builders ++
      graft.functions.VectorFunctions.bloomBuilders).map(_._1) :+ "graft_topk"
    names.foreach { n =>
      assert(ext.sessionState.functionRegistry
        .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(n)), n)
    }

    // the as-of planner strategy rode in with the extensions
    assert(ext.sessionState.planner.extraPlanningStrategies
      .contains(graft.plans.AsOfJoinStrategy))
  }
}
