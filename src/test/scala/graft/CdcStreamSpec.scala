package graft

import graft.streaming.EventStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

case class RatingUpdate(user_id: Long, item_id: Long, rating: Double,
                        is_implicit: Boolean, ts: java.sql.Timestamp, op: String)

class CdcStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("streamed mutations merge into the snapshot across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cdc_snap").toString + "/ratings"
    Seq(
      (1L, 10L, 4.0, false, ts("2024-01-01 00:00:00")),
      (2L, 10L, 5.0, false, ts("2024-01-01 00:00:00")))
      .toDF("user_id", "item_id", "rating", "is_implicit", "ts")
      .write.parquet(dir)

    val input = MemoryStream[RatingUpdate]
    val q = EventStream.startCdcApply(input.toDF(), dir)

    // batch 1: re-rate and add
    input.addData(
      RatingUpdate(1L, 10L, 2.2, false, ts("2024-01-02 00:00:00"), "upsert"),
      RatingUpdate(3L, 11L, 4.5, false, ts("2024-01-02 00:00:00"), "upsert"))
    q.processAllAvailable()
    // batch 2: delete one
    input.addData(RatingUpdate(2L, 10L, 0.0, false, ts("2024-01-03 00:00:00"), "delete"))
    q.processAllAvailable()
    q.stop()

    val snap = spark.read.parquet(dir)
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("item_id")) -> r.getAs[Double]("rating")).toMap
    assert(snap((1L, 10L)) === 2.0)   // 2.2 normalized to half-star
    assert(snap((3L, 11L)) === 4.5)
    assert(!snap.contains((2L, 10L))) // deleted in batch 2
    assert(snap.size === 2)
  }
}
