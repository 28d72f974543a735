package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RatingsGenSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def gen(rows: Long, partitions: Int, seed: Long = 42L) =
    spark.read.format("graft.sources.v2.RatingsGenSource")
      .option("rows", rows).option("partitions", partitions)
      .option("users", 500).option("items", 100).option("seed", seed)
      .load()

  test("generates exactly the requested rows across partitions") {
    val df = gen(100000, 8)
    assert(df.count() === 100000)
    assert(df.rdd.getNumPartitions === 8)
  }

  test("same seed is bit-identical regardless of parallelism; seeds differ") {
    val agg = (p: Int, s: Long) => gen(10000, p, s)
      .agg(sum(hash(col("user_id"), col("item_id"), col("rating"), col("ts")).cast("long")))
      .head().getLong(0)
    assert(agg(2, 42L) === agg(16, 42L)) // parallelism-independent
    assert(agg(4, 42L) !== agg(4, 7L))   // seed actually matters
  }

  test("generated ratings live on the half-star lattice and ids in range") {
    val df = gen(20000, 4).cache()
    assert(df.filter(col("rating") < 0.5 || col("rating") > 5.0).count() === 0)
    assert(df.filter((col("rating") * 2) =!= round(col("rating") * 2)).count() === 0)
    assert(df.filter(col("user_id") >= 500 || col("item_id") >= 100).count() === 0)
    assert(df.select(year(col("ts"))).distinct().collect().map(_.getInt(0)).forall(y => y == 2024 || y == 2025))
    df.unpersist()
  }

  test("downstream operators run unchanged on the generated source") {
    val stats = gen(50000, 8)
      .groupBy(col("item_id"))
      .agg(count(col("user_id")).as("count_users"), round(avg(col("rating")), 4).as("avg_rating"))
      .filter(col("count_users") > 5)
    assert(stats.count() === 100) // every item is hot at this density
  }
}
