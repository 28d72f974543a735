package graft

import graft.operators.Mutations
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MutationsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("applyBatch upserts, deletes, and normalizes like the REST surface") {
    import spark.implicits._
    val base = Seq(
      (1L, 10L, 4.0, false, ts("2024-01-01 00:00:00")),
      (1L, 11L, 3.0, false, ts("2024-01-01 00:00:00")),
      (2L, 10L, 5.0, false, ts("2024-01-01 00:00:00")))
      .toDF("user_id", "item_id", "rating", "is_implicit", "ts")
    val updates = Seq(
      // re-rate 1/10 with a raw 3.8 → normalized to 4.0? round(3.8*2)/2 = 4.0
      (1L, 10L, 3.8, false, ts("2024-01-02 00:00:00"), "upsert"),
      // delete 1/11
      (1L, 11L, 0.0, false, ts("2024-01-02 00:00:00"), "delete"),
      // brand-new rating 2/12 at 0.2 → clamps to 0.5
      (2L, 12L, 0.2, false, ts("2024-01-02 00:00:00"), "upsert"))
      .toDF("user_id", "item_id", "rating", "is_implicit", "ts", "op")

    val next = Mutations.applyBatch(base, updates).cache()
    val m = next.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(m((1L, 10L)) === 4.0)      // upsert replaced, normalized 3.8 → 4.0
    assert(!m.contains((1L, 11L)))    // deleted
    assert(m((2L, 10L)) === 5.0)      // untouched
    assert(m((2L, 12L)) === 0.5)      // clamped to the scale floor
    assert(next.count() === 3)
    next.unpersist()
  }

  test("applyUserBatch upserts, deletes, and resolves same-batch conflicts to upsert") {
    import spark.implicits._
    val base = Seq(
      (1L, "alice", "AUTOMOBILE"),
      (2L, "bob", "BUILDING"),
      (3L, "carol", "MACHINERY"))
      .toDF("user_id", "name", "segment")
    val updates = Seq(
      (2L, "bob", "BUILDING", 1L, "delete"),            // delete user 2
      (3L, "carol2", "FURNITURE", 1L, "upsert"),        // rename user 3
      (3L, "carol", "MACHINERY", 1L, "delete"),         // same-batch conflict → upsert wins
      (4L, "dave", "HOUSEHOLD", 1L, "upsert"))          // new user
      .toDF("user_id", "name", "segment", "bts", "op")
    val next = Mutations.applyUserBatch(base, updates)
    val m = next.collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(m(1L) === (("alice", "AUTOMOBILE"))) // untouched
    assert(!m.contains(2L))                     // deleted
    assert(m(3L) === (("carol2", "FURNITURE"))) // upsert beat the same-batch delete
    assert(m(4L) === (("dave", "HOUSEHOLD")))   // added
    assert(m.size === 3)
  }

  test("two same-batch upserts for one user resolve deterministically") {
    import spark.implicits._
    val base = Seq((1L, "alice", "AUTOMOBILE")).toDF("user_id", "name", "segment")
    val updates = Seq(
      (1L, "zed", "HOUSEHOLD", 1L, "upsert"),
      (1L, "amy", "BUILDING", 1L, "upsert")) // identical bts → name asc wins
      .toDF("user_id", "name", "segment", "bts", "op")
    val out = Mutations.applyUserBatch(base, updates).collect()
    assert(out.length === 1)
    assert(out.head.getString(1) === "amy" && out.head.getString(2) === "BUILDING")
  }

  test("cascadeToRatings drops a deleted user's ratings with them") {
    import spark.implicits._
    val users = Seq((1L, "alice", "A"), (3L, "carol", "C")).toDF("user_id", "name", "segment")
    val ratings = Seq((1L, 10L), (2L, 10L), (2L, 11L), (3L, 12L)).toDF("user_id", "item_id")
    val surviving = Mutations.cascadeToRatings(ratings, users)
    assert(surviving.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
      Set((1L, 10L), (3L, 12L)))
  }

  test("watchedBatch assigns the item average, else the 3.5 default") {
    import spark.implicits._
    // item 10 has 6 explicit ratings avg 4.0 (> lower limit); item 99 unknown
    val base = (1 to 6).map(u => (u.toLong, 10L, 4.0, false, ts("2024-01-01 00:00:00")))
      .toDF("user_id", "item_id", "rating", "is_implicit", "ts")
    val watched = Seq(
      (7L, 10L, ts("2024-01-02 00:00:00")),
      (7L, 99L, ts("2024-01-02 00:00:00")))
      .toDF("user_id", "item_id", "ts")
    val out = Mutations.watchedBatch(spark, base, watched).collect()
      .map(r => r.getAs[Long]("item_id") -> r.getAs[Double]("rating")).toMap
    assert(out(10L) === 4.0)  // item average
    assert(out(99L) === 3.5)  // cold item → default
    // and merging the watched batch yields implicit rows
    val next = Mutations.applyBatch(base, Mutations.watchedBatch(spark, base, watched))
    assert(next.filter(col("is_implicit")).count() === 2)
  }

  test("cdcSnapshotStore ≡ applyBatch and empties bucket 5 out of the manifest") {
    val dir = java.nio.file.Files.createTempDirectory("cdc_store_spec").toString
    val nBuckets = 64
    val stored = Mutations.cdcSnapshotStore(spark, TestSpark.sf,
        nBuckets = nBuckets, artifactDir = dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getBoolean(3), r.getString(4))).toSet
    // batch-oracle identity: the store round-trip matches the one-shot
    // full-snapshot merge of the same batch
    val base = graft.Tables.interactions(spark, TestSpark.sf).cache()
    val expected = Mutations.applyBatch(base, Mutations.cdcDemoBatch(base, nBuckets))
      .select(col("user_id"), col("item_id"), col("rating"), col("is_implicit"),
        date_format(col("ts"), "yyyy-MM-dd").as("ts_day"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getBoolean(3), r.getString(4))).toSet
    assert(stored === expected)
    // every % nBuckets = 5 user's rows were tombstoned...
    assert(!stored.exists(_._1 % nBuckets === 5))
    // ...and the EMPTIED bucket dropped out of the manifest: the
    // pruned read of bucket 5 resolves to zero generation paths
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(TestSpark.sf.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
    val storeDir = s"$dir/ratings_cdc_store_$digest"
    assert(streaming.BucketStore.readBuckets(spark, storeDir, Seq(5), nBuckets).count() === 0)
    // the seed DID have bucket-5 rows (the emptied path was exercised)
    assert(base.filter(col("user_id") % nBuckets === 5).count() > 0)
    base.unpersist()
    ()
  }
}
