package graft

import graft.streaming.BucketStore
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Crash-window behavior of the bucketed store promotion: a COMPLETE
  * staged tick (parquet `_SUCCESS` + newer batch marker) rolls
  * FORWARD on recovery — whatever buckets were already promoted,
  * recovery finishes the rest and lands the marker; an INCOMPLETE
  * staged dir is discarded and the live store is untouched.
  */
class BucketStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def storeRows(dir: String): Set[(Long, Long)] =
    spark.read.parquet(dir).select("k", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("recover rolls a complete staged tick forward, discards an incomplete one") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("bucket_store").toString
    val dir = root + "/store"
    // seed: keys 1 and 2 land in buckets 1 and 2 (pmod(k, 64))
    BucketStore.seed(Seq((1L, 10L), (2L, 20L)).toDF("k", "v"),
      BucketStore.longBucket(col("k"), 64), dir, n = 64)
    assert(BucketStore.appliedBatchId(dir) === -1L)

    // a tick staged but never promoted (crash after the staged write):
    // bucket 1's merged content + marker + _SUCCESS, live untouched
    Seq((1L, 11L)).toDF("k", "v")
      .withColumn("bucket", BucketStore.longBucket(col("k"), 64))
      .repartition(col("bucket"))
      .write.partitionBy("bucket").parquet(dir + "_staged")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir + "_staged", "_graft_applied_batch"), "7".getBytes)
    BucketStore.recover(dir)
    assert(storeRows(dir) === Set((1L, 11L), (2L, 20L))) // bucket 1 promoted
    assert(BucketStore.appliedBatchId(dir) === 7L)       // marker landed last
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir + "_staged")))

    // an incomplete stage (no marker — the tick died mid-write, or the
    // marker equals the store's): recovery discards it, store intact
    Seq((2L, 99L)).toDF("k", "v")
      .withColumn("bucket", BucketStore.longBucket(col("k"), 64))
      .write.partitionBy("bucket").parquet(dir + "_staged")
    BucketStore.recover(dir)
    assert(storeRows(dir) === Set((1L, 11L), (2L, 20L)))
    assert(BucketStore.appliedBatchId(dir) === 7L)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir + "_staged")))

    // applyTick itself honors the replay guard: batchId <= marker no-ops
    BucketStore.applyTick(spark, dir,
      Seq((2L, 99L)).toDF("k", "v")
        .withColumn("bucket", BucketStore.longBucket(col("k"), 64)),
      Seq("k"), batchId = 7L, n = 64)
    assert(storeRows(dir) === Set((1L, 11L), (2L, 20L)))
    // and a genuinely new tick merges: changed key replaces, new key
    // lands, untouched bucket carried over
    BucketStore.applyTick(spark, dir,
      Seq((2L, 21L), (66L, 60L)).toDF("k", "v")
        .withColumn("bucket", BucketStore.longBucket(col("k"), 64)),
      Seq("k"), batchId = 8L, n = 64)
    assert(storeRows(dir) === Set((1L, 11L), (2L, 21L), (66L, 60L)))
    assert(BucketStore.appliedBatchId(dir) === 8L)
  }

  test("a tick with a mismatched bucket count fails loudly instead of corrupting the store") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bucket_store_meta").toString + "/store"
    BucketStore.seed(Seq((1L, 10L), (65L, 20L)).toDF("k", "v"),
      BucketStore.longBucket(col("k"), 64), dir, n = 64)
    // n=32 would put key 65 in bucket 1 instead of bucket 1=pmod(65,64):
    // the pruned read would miss its real bucket — must fail up front
    val e = intercept[IllegalArgumentException] {
      BucketStore.applyTick(spark, dir,
        Seq((65L, 21L)).toDF("k", "v")
          .withColumn("bucket", BucketStore.longBucket(col("k"), 32)),
        Seq("k"), batchId = 1L, n = 32)
    }
    assert(e.getMessage.contains("bucket-count mismatch"))
    val e2 = intercept[IllegalArgumentException] {
      BucketStore.readBuckets(spark, dir, Seq(1), n = 32)
    }
    assert(e2.getMessage.contains("bucket-count mismatch"))
    // store unchanged by the refused tick
    assert(storeRows(dir) === Set((1L, 10L), (65L, 20L)))
    // the matching count still reads/applies fine
    assert(BucketStore.readBuckets(spark, dir, Seq(1), n = 64).count() === 2L)
  }
}
