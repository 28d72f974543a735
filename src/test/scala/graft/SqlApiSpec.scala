package graft

import org.scalatest.funsuite.AnyFunSuite

class SqlApiSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("spark.sql over registered views matches the DataFrame API plan results") {
    val viaSql = SqlApi.sql(spark, TestSpark.sf,
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin)
    val viaDf = graft.operators.Analytics.q1Agg(spark, TestSpark.sf)
      .select("l_returnflag", "l_linestatus", "sum_qty", "count_order")
    assert(viaSql.exceptAll(viaDf).count() === 0)
    assert(viaDf.exceptAll(viaSql).count() === 0)
  }

  test("the interactions ratings view is SQL-visible") {
    val n = SqlApi.sql(spark, TestSpark.sf,
      "SELECT count(*) AS n FROM interactions WHERE NOT is_implicit").head().getLong(0)
    assert(n > 0)
  }
}
