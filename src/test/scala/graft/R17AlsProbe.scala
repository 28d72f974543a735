package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r17 optimization probe: split the ALS query walls (als_top_n 15.2 s,
  * als_implicit 12.3 s, als_fold_in 5.7 s, als_implicit_fold_in 7.9 s
  * in the r17 baseline) into fit vs serve so the optimization targets
  * the measured term, not the assumed one. Mirrors the Bench session.
  */
object R17AlsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val s = System.nanoTime; val r = f
      println(f"[r17-als] $label%-36s ${(System.nanoTime - s) / 1e9}%6.2f s")
      r
    }
    // session warm-up (codegen/class loading) on the smallest SF
    try graft.recommender.Als.topN(spark, "/root/testdata/sf0.001")
      .write.format("noop").mode("overwrite").save()
    catch { case e: Throwable => println(s"warmup failed: $e") }
    spark.catalog.clearCache()

    t("als_top_n full (warm)") {
      graft.recommender.Als.topN(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.catalog.clearCache()

    // piecewise: raw → keyed → fit → recommend → anti+rank
    val raw = Tables.interactions(spark, sfDir)
      .select(col("user_id"), col("item_id"), col("rating").cast("float").as("rating"))
    val keyed = t("keyedTrainingSet (bounds check)") {
      graft.recommender.Als.keyedTrainingSet(raw)
    }
    val train = keyed.train.cache()
    t("train materialize") { train.count() }
    val model = t("fit (rank8 iter10)") { graft.recommender.Als.fit(train) }
    val maxSeen = t("maxSeen agg") {
      train.groupBy(col("user")).count().agg(max(col("count"))).head().getLong(0).toInt
    }
    val buffer = math.min(maxSeen, 1000)
    println(s"[r17-als] buffer=$buffer")
    val recs = model.recommendForAllUsers(20 + buffer)
      .select(col("user"), explode(col("recommendations")).as("rec"))
      .select(col("user"), col("rec.item").as("item"), col("rec.rating").as("score"))
    t("recommendForAllUsers+explode (noop)") {
      recs.write.format("noop").mode("overwrite").save()
    }
    val seen = train.select(col("user"), col("item")).distinct()
    val unseen = recs.join(seen, Seq("user", "item"), "left_anti")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user")).orderBy(col("score").desc, col("item").asc)
    t("anti+window rank (noop)") {
      unseen.withColumn("rn", row_number().over(w)).filter(col("rn") <= 20)
        .write.format("noop").mode("overwrite").save()
    }
    train.unpersist()
    spark.catalog.clearCache()
    t("als_implicit full (warm)") {
      graft.recommender.Als.implicitTopN(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.catalog.clearCache()
    t("als_fold_in full (warm)") {
      graft.recommender.Als.foldInTopN(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.catalog.clearCache()
    t("als_implicit_fold_in full (warm)") {
      graft.recommender.Als.implicitFoldInTopN(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
