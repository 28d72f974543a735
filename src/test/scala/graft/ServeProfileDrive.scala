package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Throwaway profiling drive for the q_recs_serve blend (run with
  * `Test/runMain graft.ServeProfileDrive [sfDir]`): times each stage
  * of the serving chain separately to localize regressions the
  * aggregate bench number can't.
  */
object ServeProfileDrive {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val coalesceFlag = sys.env.getOrElse("PROFILE_COALESCE", "false")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", coalesceFlag)
      .config("spark.ui.enabled", false)
      .appName("serve-profile").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(s"[profile] coalesce=$coalesceFlag")
    def t[A](label: String)(f: => A): A = {
      val s = System.nanoTime; val r = f
      println(f"[profile] $label%-30s ${(System.nanoTime - s) / 1e9}%.2f s")
      r
    }
    import graft.operators.{ItemCF, Serving}
    // one full pass to warm JIT/codegen/page cache, then measure pieces
    t("recsServe warmup") {
      Serving.recsServe(spark, sfDir).write.format("noop").mode("overwrite").save() }
    spark.catalog.clearCache()
    t("recsServe warm full") {
      Serving.recsServe(spark, sfDir).write.format("noop").mode("overwrite").save() }
    spark.catalog.clearCache()
    val base = Tables.interactions(spark, sfDir)
      .select(col("user_id"), col("item_id"), col("rating"), col("ts")).cache()
    t("warm: interactions ETL") { base.count() }
    val snap = base.filter(col("ts") < lit("2000-07-01").cast("timestamp"))
    val capped = Tables.capDegree(snap, "user_id", "item_id", ItemCF.DefaultMaxDegree)
      .select(col("user_id"), col("item_id"), col("rating")).cache()
    t("warm: capDegree(snap)") { capped.count() }
    t("warm: recommend (cf chain)") {
      ItemCF.recommend(spark, sfDir).write.format("noop").mode("overwrite").save() }
    t("warm: recsServe with caches hot") {
      Serving.recsServe(spark, sfDir).write.format("noop").mode("overwrite").save() }
    // blend sub-pieces, everything upstream cached
    val scores = ItemCF.cfScores(capped, 3)
    t("warm: cfScores noop") { scores.write.format("noop").mode("overwrite").save() }
    graft.functions.TopKAgg.register(spark)
    val snapSeen = snap.select(col("user_id"), col("item_id").as("item_j"))
    val cfRecs = scores.join(snapSeen, Seq("user_id", "item_j"), "left_anti")
      .groupBy(col("user_id")).agg(expr("graft_topk(score, item_j, 10)").as("topk"))
      .select(col("user_id"), explode(col("topk")).as("kv"))
      .select(col("user_id"), col("kv.id").as("item_id"), col("kv.score").as("score"))
    val seen = base.select(col("user_id"), col("item_id"))
    val wSurv = Window.partitionBy(col("user_id")).orderBy(col("score").desc, col("item_id").asc)
    val survivors = cfRecs.join(seen, Seq("user_id", "item_id"), "left_anti")
      .withColumn("rec_rank", row_number().over(wSurv)).cache()
    t("warm: survivors.count") { survivors.count() }
    val nSurv = survivors.groupBy(col("user_id")).agg(count(lit(1)).as("n_surv"))
    val pool = base.filter(col("rating") >= 3.5)
      .groupBy(col("item_id"))
      .agg(round(avg(col("rating")), 4).as("avg_rating"), count(col("user_id")).as("votes"))
      .orderBy(col("votes").desc, col("avg_rating").desc, col("item_id").asc)
      .limit(200)
    val users = base.select(col("user_id")).distinct()
      .join(nSurv, Seq("user_id"), "left")
      .withColumn("n_surv", coalesce(col("n_surv"), lit(0L)))
      .filter(col("n_surv") < 10)
    t("warm: deficit users.count") { println("[profile]   deficit=" + users.count()) }
    val wPad = Window.partitionBy(col("user_id")).orderBy(col("votes").desc, col("avg_rating").desc, col("item_id").asc)
    val seenInPool = seen.join(broadcast(pool.select(col("item_id"))), Seq("item_id"), "left_semi")
    val padded = users.join(broadcast(pool), lit(true))
      .join(seenInPool, Seq("user_id", "item_id"), "left_anti")
      .join(survivors.select(col("user_id"), col("item_id")), Seq("user_id", "item_id"), "left_anti")
      .withColumn("pad_rn", row_number().over(wPad))
      .filter(col("pad_rn") <= lit(10) - col("n_surv"))
    t("warm: padded noop") { padded.write.format("noop").mode("overwrite").save() }
    val paddedHinted = users.join(broadcast(pool), lit(true))
      .join(broadcast(seenInPool), Seq("user_id", "item_id"), "left_anti")
      .join(broadcast(survivors.select(col("user_id"), col("item_id"))), Seq("user_id", "item_id"), "left_anti")
      .withColumn("pad_rn", row_number().over(wPad))
      .filter(col("pad_rn") <= lit(10) - col("n_surv"))
    t("warm: padded HINTED noop") { paddedHinted.write.format("noop").mode("overwrite").save() }
    t("warm: padded HINTED again") { paddedHinted.write.format("noop").mode("overwrite").save() }
    val excl = seenInPool.unionByName(survivors.select(col("user_id"), col("item_id")))
    val paddedUnion = users.join(broadcast(pool), lit(true))
      .join(excl, Seq("user_id", "item_id"), "left_anti")
      .withColumn("pad_rn", row_number().over(wPad))
      .filter(col("pad_rn") <= lit(10) - col("n_surv"))
    t("warm: padded UNION-excl noop") { paddedUnion.write.format("noop").mode("overwrite").save() }
    t("warm: padded UNION-excl again") { paddedUnion.write.format("noop").mode("overwrite").save() }
    spark.stop()
  }
}
