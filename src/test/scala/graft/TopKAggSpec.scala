package graft

import graft.operators.Relational
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("heap aggregate matches the window formulation row for row") {
    val sf = TestSpark.sf
    val viaAgg = Relational.userTopKAgg(spark, sf, k = 5)
    // same ordering contract: rating desc, item_id asc
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("rating").desc, col("item_id").asc)
    val viaWindow = Tables.interactions(spark, sf)
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select(col("user_id"), col("item_id"), col("rating"), col("rn"))
    assert(viaAgg.count() === viaWindow.count())
    assert(viaAgg.exceptAll(viaWindow).count() === 0)
    assert(viaWindow.exceptAll(viaAgg).count() === 0)
  }

  test("heap keeps exactly k with deterministic tie-breaks") {
    import spark.implicits._
    graft.functions.TopKAgg.register(spark)
    // 6 rows, scores tie at 2.0 → ids 3 and 4 tie-break: smaller id wins
    val df = Seq((1L, 5.0, 1L), (1L, 2.0, 4L), (1L, 2.0, 3L),
                 (1L, 1.0, 9L), (1L, 3.0, 2L), (1L, 0.5, 8L))
      .toDF("g", "s", "i")
    val out = df.groupBy("g").agg(expr("graft_topk(s, i, 4)").as("t"))
      .select(explode(col("t")).as("e"))
      .select(col("e.score"), col("e.id")).collect()
      .map(r => (r.getDouble(0), r.getLong(1)))
    assert(out.toSeq === Seq((5.0, 1L), (3.0, 2L), (2.0, 3L), (2.0, 4L)))
  }

  test("NaN scores rank largest (the window's NaN placement) and never block evictions") {
    import spark.implicits._
    graft.functions.TopKAgg.register(spark)
    // a NaN score (0/0 from a zero-norm vector) arrives EARLY, then
    // better finite rows must still evict the finite occupants — the
    // primitive-comparator bug was NaN lodging at the root and
    // freezing the heap; the fix ranks NaN as largest, exactly how
    // Spark's window sort ordered it (NaN first under desc)
    val df = Seq((1L, Double.NaN, 7L), (1L, 1.0, 1L), (1L, 2.0, 2L),
                 (1L, 3.0, 3L), (1L, 4.0, 4L), (1L, 5.0, 5L))
      .toDF("g", "s", "i")
    val out = df.repartition(1).groupBy("g").agg(expr("graft_topk(s, i, 3)").as("t"))
      .select(explode(col("t")).as("e"))
      .select(col("e.score"), col("e.id")).collect()
      .map(r => (r.getDouble(0), r.getLong(1)))
    assert(out.length === 3)
    assert(out(0)._1.isNaN && out(0)._2 === 7L)
    assert(out(1) === ((5.0, 5L)))
    assert(out(2) === ((4.0, 4L)))
    // two NaNs tie-break by id asc, like any equal pair
    val twoNaN = Seq((1L, Double.NaN, 9L), (1L, Double.NaN, 2L), (1L, 8.0, 1L))
      .toDF("g", "s", "i")
      .groupBy("g").agg(expr("graft_topk(s, i, 2)").as("t"))
      .select(explode(col("t")).as("e")).select(col("e.id")).collect().map(_.getLong(0))
    assert(twoNaN.toSeq === Seq(2L, 9L))
  }

  test("k larger than group size returns the whole group sorted") {
    import spark.implicits._
    graft.functions.TopKAgg.register(spark)
    val out = Seq((1L, 1.0, 10L), (1L, 2.0, 20L))
      .toDF("g", "s", "i")
      .groupBy("g").agg(expr("graft_topk(s, i, 100)").as("t"))
      .select(size(col("t"))).head().getInt(0)
    assert(out === 2)
  }
}
