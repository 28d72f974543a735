package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r17: stepwise replication of BucketStore.applyTick's body for the
  * q_item_cooc_store tick (applyTick measured 8.8 s while its visible
  * pieces sum to ~2.5 s) — find the hidden term.
  */
object R17ApplyTickProbe {
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
      println(f"[r17-tick] $label%-44s ${(System.nanoTime - s) / 1e9}%6.2f s")
      r
    }
    import graft.streaming.BucketStore
    import graft.operators.{Hints, ItemCF}
    // warm-up
    try graft.operators.ItemCF.coocIncrementalStore(spark, "/root/testdata/sf0.001",
        artifactDir = "target/graft-r17probe2")
      .write.format("noop").mode("overwrite").save()
    catch { case e: Throwable => println(s"warmup failed: $e") }
    spark.catalog.clearCache()

    val dir = "target/graft-r17probe2/cooc_probe_store"
    val base = Tables.interactions(spark, sfDir)
      .select(col("user_id"), col("item_id"), col("ts")).cache()
    val old = base.filter(col("ts") < lit("2001-06-01").cast("date"))
      .select(col("user_id"), col("item_id")).cache()
    val delta = base.filter(col("ts") >= lit("2001-06-01").cast("date"))
      .select(col("user_id"), col("item_id"))
    val seedMatrix = ItemCF.coocCountsOn(old).cache()
    seedMatrix.count()
    val n = 64
    BucketStore.seed(seedMatrix, BucketStore.longBucket(col("item_a"), n), dir, n)
    val (pairCounts, _) = ItemCF.deltaPairCountsTracked(old, delta)
    val deltaPairs = pairCounts.cache()
    deltaPairs.count()
    val touched = BucketStore.touchedBuckets(deltaPairs.select(
      pmod(shiftrightunsigned(col("pk"), 32), lit(n)).cast("int")
        .as(BucketStore.BucketCol)))
    val matrix = BucketStore.readBuckets(spark, dir, touched, n)
    val (changes0, _) = ItemCF.coocChangesFromPairs(matrix, deltaPairs)
    val changes = changes0.withColumn(BucketStore.BucketCol,
      BucketStore.longBucket(col("item_a"), n))

    // ---- applyTick body, stepwise ----
    val ch = t("ch.cache + count (changes plan)") {
      val c = changes.cache(); c.count(); c
    }
    val changedB = t("touchedBuckets(ch)") {
      BucketStore.touchedBuckets(ch.select(col(BucketStore.BucketCol)))
    }
    println(s"[r17-tick] changed buckets=${changedB.size}")
    // prevManifest read + selectOrEmpty equivalent: readBuckets again
    val oldRead = BucketStore.readBuckets(spark, dir, changedB, n)
    t("old read (noop)") {
      oldRead.write.format("noop").mode("overwrite").save()
    }
    val dropKeys = ch.select(col("item_a"), col("item_b"))
    val hinted = t("broadcastIfSmall(dropKeys) count") {
      Hints.broadcastIfSmall(dropKeys, Hints.DeltaBroadcastMaxRowsMd5)
    }
    // note: oldRead here lacks the bucket col; emulate applyTick's old
    // (which keeps it) by recomputing the bucket col
    val merged = oldRead.withColumn(BucketStore.BucketCol,
        BucketStore.longBucket(col("item_a"), n))
      .join(hinted, Seq("item_a", "item_b"), "left_anti")
      .unionByName(ch)
    t("merged anti+union (noop)") {
      merged.write.format("noop").mode("overwrite").save()
    }
    t("merged repartition+write parquet") {
      merged.repartition(col(BucketStore.BucketCol))
        .write.partitionBy(BucketStore.BucketCol).mode("overwrite")
        .parquet(s"$dir/gen-probe")
    }
    t("full applyTick for reference") {
      BucketStore.applyTick(spark, dir, ch,
        Seq("item_a", "item_b"), batchId = 0L, n = n)
    }
    spark.stop()
  }
}
