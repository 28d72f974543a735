package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the schema-vintage tolerance of the events loader: the SAME
  * logical timestamps encoded three ways — ns-since-epoch long (how
  * Spark surfaces parquet TIMESTAMP(NANOS) under nanosAsLong),
  * TIMESTAMP_NTZ (µs, zone-less), and zoned TIMESTAMP — must all
  * normalize to one canonical type with identical epoch-millis values.
  * Round 7 shipped the counterexample: the testdata regenerated from
  * NANOS to NTZ and six oracle queries crashed at analysis time.
  */
class EventsVintageSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // Distinct instants incl. a sub-millisecond µs component (truncation
  // direction must match across encodings) and one pre-1970 value.
  private val micros: Seq[Long] =
    Seq(0L, 1L, 999L, 1000L, 1696118400123456L, 1696118400123999L, -5000001L)

  private def millisOf(df: org.apache.spark.sql.DataFrame): Seq[Long] = {
    assert(df.schema("ts").dataType === TimestampType)
    df.select(unix_millis(col("ts"))).as[Long].collect().toSeq.sorted
  }

  test("ns-long, NTZ, and zoned vintages normalize to identical millis") {
    val nsLong = micros.map(_ * 1000L).toDF("ts") // TIMESTAMP(NANOS) read shape
    val ntz = micros.toDF("us")
      .select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
    val zoned = micros.toDF("us").select(timestamp_micros(col("us")).as("ts"))
    assert(ntz.schema("ts").dataType === TimestampNTZType)

    val expected = micros.map(us => math.floorDiv(us, 1000L)).sorted
    assert(millisOf(Tables.normalizeEventTs(nsLong)) === expected)
    assert(millisOf(Tables.normalizeEventTs(ntz)) === expected)
    assert(millisOf(Tables.normalizeEventTs(zoned)) === expected)
  }

  test("NTZ survives a real parquet round-trip through the loader path") {
    val dir = java.nio.file.Files.createTempDirectory("graft-vintage").toString
    micros.toDF("us")
      .select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val read = spark.read.parquet(s"$dir/events.parquet")
    assert(read.schema("ts").dataType === TimestampNTZType)
    assert(millisOf(Tables.normalizeEventTs(read)) ===
      micros.map(us => math.floorDiv(us, 1000L)).sorted)
  }

  test("unknown ts types fail loudly at the loader, not downstream") {
    val bad = Seq("2023-10-01").toDF("ts")
    val e = intercept[IllegalArgumentException](Tables.normalizeEventTs(bad))
    assert(e.getMessage.contains("unsupported type"))
    assert(e.getMessage.contains("events.ts"))
  }

  test("the shipped testdata loads and yields a usable epoch-millis column") {
    val ev = Tables.events(spark, TestSpark.sf)
    assert(ev.schema("ts").dataType === TimestampType)
    assert(ev.select(unix_millis(col("ts"))).filter(col("unix_millis(ts)").isNotNull).count() > 0)
  }
}
