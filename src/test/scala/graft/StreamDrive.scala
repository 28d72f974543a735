package graft

import graft.streaming._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Manual smoke drive for the streaming module (run with
  * `sbt "Test/runMain graft.StreamDrive"`): feeds two micro-batches
  * through both streaming pipelines and prints the sink tables.
  */
object StreamDrive {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    def ev(id: Long, t: String, u: Long, et: String, v: Double) =
      Event(id, java.sql.Timestamp.valueOf(t), u, et, v)

    val input = MemoryStream[Event]
    input.addData(
      ev(1, "2024-01-01 10:05:00", 1, "click", 1.0),
      ev(2, "2024-01-01 10:40:00", 2, "click", 2.5))
    val q = EventStream.startMemorySink(EventStream.windowedStats(input.toDF()), "drive_ws")
    q.processAllAvailable()
    input.addData(ev(3, "2024-01-01 11:05:00", 1, "view", 9.0))
    q.processAllAvailable(); q.stop()
    println("=== windowedStats sink ===")
    spark.table("drive_ws").orderBy("window_start", "event_type").show(false)

    val input2 = MemoryStream[Event]
    val q2 = EventStream.userRatingCounters(input2.toDS())
      .writeStream.outputMode("update").format("memory").queryName("drive_urc").start()
    input2.addData(ev(10, "2024-01-01 10:00:00", 7, "click", 1.5))
    q2.processAllAvailable()
    input2.addData(ev(11, "2024-01-01 10:01:00", 7, "click", 2.5),
                   ev(12, "2024-01-01 10:02:00", 8, "view", 4.0))
    q2.processAllAvailable(); q2.stop()
    println("=== userRatingCounters sink (update mode) ===")
    spark.table("drive_urc").orderBy("user_id", "n_events").show(false)
    spark.stop()
  }
}
