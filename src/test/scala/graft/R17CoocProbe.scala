package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r17 optimization probe: piecewise timing of the co-occurrence
  * family's shared substrate (interactions build, capDegree) and the
  * q_item_cooc_store tick (10.8 s in the r17 baseline — the heaviest
  * single phase on the board). Mirrors the Bench session.
  */
object R17CoocProbe {
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
      println(f"[r17-cooc] $label%-40s ${(System.nanoTime - s) / 1e9}%6.2f s")
      r
    }
    // warm-up
    try graft.operators.ItemCF.coocIncrementalStore(spark, "/root/testdata/sf0.001",
        artifactDir = "target/graft-r17probe")
      .write.format("noop").mode("overwrite").save()
    catch { case e: Throwable => println(s"warmup failed: $e") }
    spark.catalog.clearCache()

    // substrate pieces
    val inter = Tables.interactions(spark, sfDir)
    t("interactions build (noop)") {
      inter.write.format("noop").mode("overwrite").save()
    }
    t("interactions build again (noop)") {
      inter.write.format("noop").mode("overwrite").save()
    }
    val rawJoin = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"), col("l_returnflag"))
      .join(Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
    t("orders⋈lineitem join only (noop)") {
      rawJoin.write.format("noop").mode("overwrite").save()
    }
    val capped = Tables.capDegree(inter, "user_id", "item_id", 128)
      .select(col("user_id"), col("item_id"), col("rating"))
    t("capDegree over interactions (noop)") {
      capped.write.format("noop").mode("overwrite").save()
    }
    spark.catalog.clearCache()

    t("q_item_cooc full (warm)") {
      graft.operators.ItemCF.cooccurrence(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.catalog.clearCache()
    PhaseTimer.reset()
    t("q_item_cooc_store full (warm)") {
      graft.operators.ItemCF.coocIncrementalStore(spark, sfDir,
          artifactDir = "target/graft-r17probe")
        .write.format("noop").mode("overwrite").save()
    }
    println("[r17-cooc] phases=" + PhaseTimer.snapshot())
    spark.catalog.clearCache()

    // tick pieces at sf0.1: replicate the store tick body stepwise
    {
      import graft.streaming.BucketStore
      import graft.operators.ItemCF
      val dir = "target/graft-r17probe/cooc_probe_store"
      val base = Tables.interactions(spark, sfDir)
        .select(col("user_id"), col("item_id"), col("ts")).cache()
      val old = base.filter(col("ts") < lit("2001-06-01").cast("date"))
        .select(col("user_id"), col("item_id")).cache()
      val delta = base.filter(col("ts") >= lit("2001-06-01").cast("date"))
        .select(col("user_id"), col("item_id"))
      val seedMatrix = ItemCF.coocCountsOn(old).cache()
      val mrows = t("seed matrix count (cached)") { seedMatrix.count() }
      println(s"[r17-cooc] matrix rows=$mrows")
      val n = 64
      t("seed write (64 buckets)") {
        BucketStore.seed(seedMatrix, BucketStore.longBucket(col("item_a"), n), dir, n)
      }
      val (pairCounts, _) = ItemCF.deltaPairCountsTracked(old, delta)
      val deltaPairs = pairCounts.cache()
      val drows = t("delta pair counts (cached count)") { deltaPairs.count() }
      println(s"[r17-cooc] delta pair rows=$drows")
      val touched = t("touchedBuckets") {
        BucketStore.touchedBuckets(deltaPairs.select(
          pmod(shiftrightunsigned(col("pk"), 32), lit(n)).cast("int")
            .as(BucketStore.BucketCol)))
      }
      println(s"[r17-cooc] touched=${touched.size}")
      val matrix = BucketStore.readBuckets(spark, dir, touched, n)
      t("store read (noop)") {
        matrix.write.format("noop").mode("overwrite").save()
      }
      val (changes, _) = ItemCF.coocChangesFromPairs(matrix, deltaPairs)
      val ch = changes.cache()
      val crows = t("changes (inner+anti, cached count)") { ch.count() }
      println(s"[r17-cooc] changed rows=$crows")
      t("applyTick (read+anti+union+write)") {
        BucketStore.applyTick(spark, dir,
          ch.withColumn(BucketStore.BucketCol,
            BucketStore.longBucket(col("item_a"), n)),
          Seq("item_a", "item_b"), batchId = 0L, n = n)
      }
      t("readAll + threshold (noop)") {
        BucketStore.readAll(spark, dir).filter(col("n_users") >= 3)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
