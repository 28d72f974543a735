package graft

import graft.plans.AsOf
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("as-of join picks the latest right row at or before each left time") {
    import spark.implicits._
    val trades = Seq(
      (1L, ts("2024-01-01 10:00:05"), "t1"),
      (1L, ts("2024-01-01 10:00:20"), "t2"),
      (2L, ts("2024-01-01 10:00:10"), "t3"),
      (3L, ts("2024-01-01 10:00:01"), "t4")) // key with no quotes at all
      .toDF("key", "t", "trade")
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 10:00:05"), 101.0), // equal ts → inclusive
      (1L, ts("2024-01-01 10:00:15"), 102.0),
      (2L, ts("2024-01-01 10:00:30"), 200.0)) // only AFTER the trade
      .toDF("qkey", "qt", "price")

    val out = AsOf.join(spark, trades, quotes, Seq("key" -> "qkey"), "t", "qt")
      .select(col("trade"), col("price"))
      .collect().map(r => r.getString(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap

    assert(out("t1") === 101.0) // equal-timestamp quote wins over older
    assert(out("t2") === 102.0) // latest ≤ t, not first
    assert(out("t3") === null)  // quote exists but only in the future
    assert(out("t4") === null)  // no quotes for key at all
  }

  test("null timestamps match nothing instead of reading as epoch 0") {
    import spark.implicits._
    val trades = Seq(
      (1L, Option(ts("2024-01-01 10:00:05")), "t1"),
      (1L, Option.empty[java.sql.Timestamp], "t_null")) // null left ts
      .toDF("key", "t", "trade")
    val quotes = Seq(
      (1L, Option.empty[java.sql.Timestamp], 99.0), // null right ts: never a match
      (1L, Option(ts("2024-01-01 10:00:00")), 100.0))
      .toDF("qkey", "qt", "price")
    val out = AsOf.join(spark, trades, quotes, Seq("key" -> "qkey"), "t", "qt")
      .select(col("trade"), col("price"))
      .collect().map(r => r.getString(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(out("t1") === 100.0)   // the real quote, not the null-ts one
    assert(out("t_null") === null) // null left time → null-extended
  }

  test("physical plan uses the custom exec, not a cartesian fallback") {
    import spark.implicits._
    val l = Seq((1L, ts("2024-01-01 00:00:01"))).toDF("k", "t")
    val r = Seq((1L, ts("2024-01-01 00:00:00"), 1.0)).toDF("rk", "rt", "v")
    val plan = AsOf.join(spark, l, r, Seq("k" -> "rk"), "t", "rt")
      .queryExecution.executedPlan.toString
    // SparkPlan.nodeName strips the Exec suffix: the node prints as "AsOfJoin"
    assert(plan.contains("AsOfJoin"), plan)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("matches the window-composed equivalent on real data") {
    // compositional as-of: union-free check via inequality join + rank
    val e = Tables.events(spark, TestSpark.sf)
      .select(col("event_id"), col("user_id"), col("ts")).limit(200)
    val basket = Tables.interactions(spark, TestSpark.sf)
      .groupBy(col("user_id").as("bu"), col("ts").as("bt"))
      .agg(count(lit(1)).as("n_items"))
    val viaOperator = graft.operators.Analytics.asofEnrich(spark, TestSpark.sf)
      .select(col("event_id"), col("last_n_items"))
    val viaComposition = {
      val j = e.join(basket, col("user_id") === col("bu") && col("bt") <= col("ts"), "left")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_id")).orderBy(col("bt").desc)
      j.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("event_id"), col("n_items").as("last_n_items"))
    }
    val diff = viaOperator.join(viaComposition, Seq("event_id"))
      .filter(
        (viaOperator("last_n_items").isNull =!= viaComposition("last_n_items").isNull) ||
        coalesce(viaOperator("last_n_items"), lit(-1L)) =!= coalesce(viaComposition("last_n_items"), lit(-1L)))
    assert(diff.count() === 0)
  }
}
