package graft

import graft.operators.Analytics
import graft.streaming.{Event, EventStream}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ApproxStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("approx distinct counts land within the configured error of exact") {
    val approx = Analytics.approxStats(spark, sf)
      .select(col("event_type"), col("approx_users"))
    val exact = Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
    val joined = approx.join(exact, Seq("event_type")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val a = r.getAs[Long]("approx_users").toDouble
      val e = r.getAs[Long]("exact_users").toDouble
      assert(math.abs(a - e) / e < 0.1, s"${r.getAs[String]("event_type")}: approx $a vs exact $e")
    }
  }

  test("approx quantiles bracket the exact median") {
    val row = Analytics.approxStats(spark, sf)
      .filter(col("event_type") === "click").head()
    val exact = Tables.events(spark, sf)
      .filter(col("event_type") === "click")
      .stat.approxQuantile("value", Array(0.5), 0.0)(0) // rel err 0 = exact
    assert(math.abs(row.getAs[Double]("p50_value") - exact) < exact * 0.05)
    assert(row.getAs[Double]("p99_value") >= row.getAs[Double]("p50_value"))
  }

  test("streaming session_window closes gap-separated sessions per user") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def ev(id: Long, t: String, u: Long, v: Double) =
      Event(id, java.sql.Timestamp.valueOf(t), u, "click", v)
    val input = MemoryStream[Event]
    input.addData(
      ev(1, "2024-01-01 10:00:00", 1, 1.0),
      ev(2, "2024-01-01 10:10:00", 1, 2.0),  // same session (10 min gap)
      ev(3, "2024-01-01 11:30:00", 1, 3.0),  // > 30 min later: new session
      ev(4, "2024-01-01 10:05:00", 2, 4.0))
    val q = EventStream.sessionStats(input.toDF())
      .writeStream.outputMode("complete").format("memory").queryName("ss_test").start()
    q.processAllAvailable(); q.stop()
    val out = spark.table("ss_test").collect()
    val u1 = out.filter(_.getAs[Long]("user_id") == 1L)
    assert(u1.length === 2, u1.mkString(";"))
    assert(u1.map(_.getAs[Long]("n_events")).sorted.toSeq === Seq(1L, 2L))
  }
}
