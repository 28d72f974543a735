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

  test("packed-key heap rank ≡ the window formulation on randomized scored frames (ties + NaN)") {
    import spark.implicits._
    // searchIvfStore's rank stage: the (vec_id << 16 | cluster)
    // packing must reproduce the window's (cos desc, vec_id asc)
    // total order EXACTLY — randomized frames with heavy tie mass
    // (scores drawn from 4 distinct values), one NaN row per query,
    // and clusters spanning the 16-bit range's edges
    val rnd = new scala.util.Random(99)
    val rows = (for (q <- 0L until 7L; i <- 0 until 200) yield {
      val vecId = rnd.nextInt(1 << 20).toLong
      val cos = if (i == 0) Double.NaN else Seq(0.1, 0.5, 0.5, 0.9)(rnd.nextInt(4))
      val cluster = Seq(0, 1, 7, 65535)(rnd.nextInt(4))
      (q, vecId, cos, cluster)
    }).distinct
    // dedupe on (query, vec_id): the store invariant (one posting per
    // vector) that makes packed-id-asc ≡ vec_id-asc
    val df = rows.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
      .toDF("query_id", "vec_id", "cos", "cluster")
    val k = 9
    val viaHeap = graft.operators.Similarity.heapRankWithCluster(spark, df, k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3), r.getInt(4)))
      .map { case (q, n, c, rn, cl) =>
        (q, n, if (c.isNaN) "NaN" else c.toString, rn, cl) }.toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id").asc)
    val viaWindow = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cos"),
        col("rn"), col("cluster"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3), r.getInt(4)))
      .map { case (q, n, c, rn, cl) =>
        (q, n, if (c.isNaN) "NaN" else c.toString, rn, cl) }.toSet
    assert(viaHeap === viaWindow)
    assert(viaHeap.size === 7 * k)
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
