package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("salted join returns exactly the rows of the plain join under heavy skew") {
    import spark.implicits._
    // 50k rows, 90% on one hot key
    val fact = spark.range(50000)
      .select(
        when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id") % 100).as("k"),
        col("id").as("payload"))
    val dim = spark.range(100).select(col("id").as("k"), concat(lit("d"), col("id")).as("label"))

    val plain = fact.join(dim, "k")
    val salted = Skew.saltedJoin(fact, dim, "k", salts = 8, factSaltSource = Seq("payload"))

    assert(salted.count() === plain.count())
    assert(salted.join(plain, Seq("k", "payload", "label"), "left_anti").count() === 0)
    assert(plain.join(salted, Seq("k", "payload", "label"), "left_anti").count() === 0)
  }

  test("salt is deterministic across evaluations (no rand())") {
    import spark.implicits._
    val df = spark.range(1000).select(col("id"), Skew.salt(16, col("id")).as("s"))
    val a = df.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b = df.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a === b)
    assert(a.values.toSet.size > 8) // actually spreads across salt buckets
  }

  test("hot key actually spreads across salt partitions") {
    import spark.implicits._
    val fact = spark.range(10000).select(lit(7L).as("k"), col("id").as("payload"))
    val spread = fact.select(Skew.salt(8, col("payload")).as("s"))
      .groupBy("s").count().collect()
    assert(spread.length === 8)
    val counts = spread.map(_.getLong(1))
    assert(counts.max < counts.sum / 2, s"spread: ${counts.mkString(",")}")
  }
}
