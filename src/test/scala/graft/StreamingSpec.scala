package graft

import graft.streaming.{Event, EventStream}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(minute: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("windowedStats aggregates a micro-batch like the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    input.addData(
      Event(1, ts(5), 1, "click", 1.0),
      Event(2, ts(10), 2, "click", 2.0),
      Event(3, ts(59), 1, "view", 3.0))
    val q = EventStream.startMemorySink(
      EventStream.windowedStats(input.toDF()), "ws_test")
    q.processAllAvailable(); q.stop()
    val out = spark.table("ws_test").collect()
    val clicks = out.find(_.getAs[String]("event_type") == "click").get
    assert(clicks.getAs[Long]("n_events") === 2)
    assert(clicks.getAs[Double]("sum_value") === 3.0)
  }

  test("streaming dedup admits each content once across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[graft.streaming.Doc]
    val q = graft.streaming.DocStream.dedup(input.toDF())
      .writeStream.outputMode("append").format("memory").queryName("sd_test").start()
    input.addData(
      graft.streaming.Doc(1, ts(1), "hello world"),
      graft.streaming.Doc(2, ts(2), "something else"))
    q.processAllAvailable()
    // second batch: one exact duplicate (dropped), one fresh doc
    input.addData(
      graft.streaming.Doc(3, ts(3), "hello world"),
      graft.streaming.Doc(4, ts(4), "fresh content"))
    q.processAllAvailable(); q.stop()
    val ids = spark.table("sd_test").collect().map(_.getAs[Long]("doc_id")).toSet
    assert(ids === Set(1L, 2L, 4L))
  }

  test("userRatingCounters carries state across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = EventStream.userRatingCounters(input.toDS())
      .writeStream.outputMode("update").format("memory").queryName("urc_test").start()
    input.addData(Event(1, ts(1), 7, "click", 1.5))
    q.processAllAvailable()
    input.addData(Event(2, ts(2), 7, "click", 2.5))
    q.processAllAvailable(); q.stop()
    val last = spark.table("urc_test")
      .orderBy(col("n_events").desc).head()
    assert(last.getAs[Long]("user_id") === 7)
    assert(last.getAs[Long]("n_events") === 2)
    assert(last.getAs[Double]("sum_value") === 4.0)
  }
}
