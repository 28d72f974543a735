package graft

import org.apache.spark.sql.functions._

/** r18 probe: the interactions upsert (latest-ts-wins, one row per
  * (user_id, item_id)) as the current row_number window vs a
  * max(struct) aggregation. ~25 bench queries rebuild this substrate,
  * so a few hundred ms here multiplies. Run:
  * Test/runMain graft.R18SubstrateProbe /root/testdata/sf0.1
  */
object R18SubstrateProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def raw() = {
      val o = Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey", "o_orderdate")
      val l = Tables.lineitem(spark, sfDir)
        .select("l_orderkey", "l_partkey", "l_quantity", "l_returnflag")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .select(
          o("o_custkey").as("user_id"),
          l("l_partkey").as("item_id"),
          Tables.halfStarRating(l("l_quantity")).as("rating"),
          (l("l_returnflag") === lit("R")).as("is_implicit"),
          o("o_orderdate").as("ts"))
    }

    def windowed() = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"), col("item_id"))
        .orderBy(col("ts").desc, col("rating").desc, col("is_implicit").asc)
      raw().withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
    }

    // ordering key (ts desc, rating desc, is_implicit asc) == max of
    // (ts, rating, !is_implicit); ties beyond the key are full-row
    // duplicates (the row IS the key columns + group keys), so the
    // surviving VALUES are identical either way
    def agged() = raw()
      .groupBy(col("user_id"), col("item_id"))
      .agg(max(struct(col("ts"), col("rating"), not(col("is_implicit")).as("fi"))).as("m"))
      .select(col("user_id"), col("item_id"), col("m.rating").as("rating"),
        not(col("m.fi")).as("is_implicit"), col("m.ts").as("ts"))

    def time(label: String)(df: => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $label%-8s $dt%.3f s")
      dt
    }

    // parity first: same rows, exactly
    val a = agged(); val w = windowed()
    val diff = a.exceptAll(w).count() + w.exceptAll(a).count()
    println(s"[probe] parity exceptAll diff = $diff")
    require(diff == 0, "substrate formulations disagree")

    // interleaved timing, 5 reps each
    (1 to 5).foreach { i =>
      time(s"window$i")(windowed())
      time(s"agg$i")(agged())
    }
    spark.stop()
  }
}
