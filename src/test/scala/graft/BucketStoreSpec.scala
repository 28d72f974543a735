package graft

import graft.streaming.BucketStore
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Crash-window behavior of the generation-manifest store protocol:
  * the marker write is the single publish point, so anything a
  * crashed tick left behind (generation dir, manifest) is invisible
  * to readers and rolled BACK by recovery; the at-least-once replay
  * then recomputes the batch idempotently. Readers resolve
  * marker → manifest → immutable generation files, so a snapshot
  * taken before a tick still reads the pre-tick rows after the tick
  * publishes (retention window: one tick).
  */
class BucketStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def storeRows(dir: String): Set[(Long, Long)] =
    BucketStore.readAll(spark, dir).select("k", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("recover rolls an unpublished tick back; replayed batch recomputes idempotently") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("bucket_store").toString
    val dir = root + "/store"
    // seed: keys 1 and 2 land in buckets 1 and 2 (pmod(k, 64))
    BucketStore.seed(Seq((1L, 10L), (2L, 20L)).toDF("k", "v"),
      BucketStore.longBucket(col("k"), 64), dir, n = 64)
    assert(BucketStore.appliedBatchId(dir) === -1L)
    assert(storeRows(dir) === Set((1L, 10L), (2L, 20L)))

    // a tick that died AFTER writing its generation and manifest but
    // BEFORE the marker: readers never saw it, recovery deletes it
    Seq((1L, 99L)).toDF("k", "v")
      .withColumn("bucket", BucketStore.longBucket(col("k"), 64))
      .write.partitionBy("bucket").parquet(dir + "/gen-7")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "_graft_manifest_7"),
      "1\tgen-7\n2\tgen-base".getBytes)
    assert(storeRows(dir) === Set((1L, 10L), (2L, 20L))) // unpublished = invisible
    BucketStore.recover(dir)
    assert(BucketStore.appliedBatchId(dir) === -1L)
    assert(storeRows(dir) === Set((1L, 10L), (2L, 20L)))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "gen-7")))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "_graft_manifest_7")))

    // the replayed batch then recomputes the same tick for real
    BucketStore.applyTick(spark, dir,
      Seq((1L, 11L)).toDF("k", "v")
        .withColumn("bucket", BucketStore.longBucket(col("k"), 64)),
      Seq("k"), batchId = 7L, n = 64)
    assert(storeRows(dir) === Set((1L, 11L), (2L, 20L)))
    assert(BucketStore.appliedBatchId(dir) === 7L)

    // replay guard: batchId <= marker no-ops
    BucketStore.applyTick(spark, dir,
      Seq((2L, 99L)).toDF("k", "v")
        .withColumn("bucket", BucketStore.longBucket(col("k"), 64)),
      Seq("k"), batchId = 7L, n = 64)
    assert(storeRows(dir) === Set((1L, 11L), (2L, 20L)))

    // and a genuinely new tick merges: changed key replaces, new key
    // lands, untouched bucket carried over from its old generation
    BucketStore.applyTick(spark, dir,
      Seq((2L, 21L), (66L, 60L)).toDF("k", "v")
        .withColumn("bucket", BucketStore.longBucket(col("k"), 64)),
      Seq("k"), batchId = 8L, n = 64)
    assert(storeRows(dir) === Set((1L, 11L), (2L, 21L), (66L, 60L)))
    assert(BucketStore.appliedBatchId(dir) === 8L)
  }

  test("a reader's snapshot survives a concurrent tick; retention bounds the window") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bucket_store_mvcc").toString + "/store"
    BucketStore.seed(Seq((1L, 10L), (2L, 20L)).toDF("k", "v"),
      BucketStore.longBucket(col("k"), 64), dir, n = 64)
    // resolve a snapshot BEFORE the tick (manifest + file listing are
    // resolved eagerly at construction)
    val snapshot = BucketStore.readAll(spark, dir).select("k", "v")
    BucketStore.applyTick(spark, dir,
      Seq((1L, 11L)).toDF("k", "v")
        .withColumn("bucket", BucketStore.longBucket(col("k"), 64)),
      Seq("k"), batchId = 0L, n = 64)
    // live readers see the new value; the pre-tick snapshot still
    // reads the OLD value — its generation files are retained
    assert(storeRows(dir) === Set((1L, 11L), (2L, 20L)))
    assert(snapshot.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      === Set((1L, 10L), (2L, 20L)))
    // two more ticks on the same bucket push gen-0 out of the
    // retention window (current + previous manifest) — gc reclaims it
    BucketStore.applyTick(spark, dir,
      Seq((1L, 12L)).toDF("k", "v")
        .withColumn("bucket", BucketStore.longBucket(col("k"), 64)),
      Seq("k"), batchId = 1L, n = 64)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "gen-0")),
      "generation referenced by the previous manifest must be retained")
    BucketStore.applyTick(spark, dir,
      Seq((1L, 13L)).toDF("k", "v")
        .withColumn("bucket", BucketStore.longBucket(col("k"), 64)),
      Seq("k"), batchId = 2L, n = 64)
    assert(storeRows(dir) === Set((1L, 13L), (2L, 20L)))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "gen-0")),
      "generation outside the retention window was not reclaimed")
    // explicit time travel inside the retention window: AS OF the
    // previous tick; outside it fails loudly, never an empty store
    assert(BucketStore.readAt(spark, dir, 1L).select("k", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      === Set((1L, 12L), (2L, 20L)))
    val e = intercept[IllegalArgumentException] { BucketStore.readAt(spark, dir, 0L) }
    assert(e.getMessage.contains("no retained manifest"))
  }

  test("tombstones: an emptied bucket drops out of the manifest at publish") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bucket_store_tomb").toString + "/store"
    BucketStore.seed(Seq((1L, 10L), (2L, 20L)).toDF("k", "v"),
      BucketStore.longBucket(col("k"), 64), dir, n = 64)
    // delete key 2 — bucket 2's post-merge state is empty
    BucketStore.applyTick(spark, dir,
      spark.emptyDataset[(Long, Long)].toDF("k", "v")
        .withColumn("bucket", BucketStore.longBucket(col("k"), 64)),
      Seq("k"), batchId = 0L, n = 64,
      removed = Some(Seq((2L, 0L)).toDF("k", "v")
        .select(col("k"), BucketStore.longBucket(col("k"), 64).as("bucket"))))
    assert(storeRows(dir) === Set((1L, 10L)))
    assert(BucketStore.appliedBatchId(dir) === 0L)
    // readBuckets of the emptied bucket: schema-correct empty
    assert(BucketStore.readBuckets(spark, dir, Seq(2), n = 64).count() === 0L)
  }

  test("a fully-tombstoned store survives gc of its last data file") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bucket_store_empty").toString + "/store"
    BucketStore.seed(Seq((1L, 10L), (2L, 20L)).toDF("k", "v"),
      BucketStore.longBucket(col("k"), 64), dir, n = 64)
    // tick 0 tombstones EVERY row — the published manifest is empty
    BucketStore.applyTick(spark, dir,
      spark.emptyDataset[(Long, Long)].toDF("k", "v")
        .withColumn("bucket", BucketStore.longBucket(col("k"), 64)),
      Seq("k"), batchId = 0L, n = 64,
      removed = Some(Seq((1L, 0L), (2L, 0L)).toDF("k", "v")
        .select(col("k"), BucketStore.longBucket(col("k"), 64).as("bucket"))))
    assert(storeRows(dir) === Set.empty)
    // tick 1 pushes the seed manifest out of the retention window and
    // gc reclaims gen-base — the store's LAST remaining data file
    BucketStore.applyTick(spark, dir,
      spark.emptyDataset[(Long, Long)].toDF("k", "v")
        .withColumn("bucket", BucketStore.longBucket(col("k"), 64)),
      Seq("k"), batchId = 1L, n = 64)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "gen-base")),
      "unreferenced seed generation should be reclaimed like any other")
    // with zero data files left, reads still serve the seeded schema…
    val empty = BucketStore.readAll(spark, dir)
    assert(empty.columns.toSet === Set("k", "v"))
    assert(empty.count() === 0L)
    // …and the store still ticks: a later insert revives it
    BucketStore.applyTick(spark, dir,
      Seq((3L, 30L)).toDF("k", "v")
        .withColumn("bucket", BucketStore.longBucket(col("k"), 64)),
      Seq("k"), batchId = 2L, n = 64)
    assert(storeRows(dir) === Set((3L, 30L)))
  }

  test("a corrupt marker fails loudly; a missing marker means pre-first-tick") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bucket_store_marker").toString + "/store"
    BucketStore.seed(Seq((1L, 10L)).toDF("k", "v"),
      BucketStore.longBucket(col("k"), 64), dir, n = 64)
    assert(BucketStore.appliedBatchId(dir) === -1L) // missing marker = -1
    // an EMPTY marker (the in-place-overwrite glimpse) must never be
    // silently read as -1 — that would void the replay guard
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "_graft_applied_batch"), Array.empty[Byte])
    val e = intercept[IllegalArgumentException] { BucketStore.appliedBatchId(dir) }
    assert(e.getMessage.contains("unreadable"))
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

  test("generation sprawl auto-compacts: live state folds into one generation") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bucket_store_compact").toString + "/store"
    def tick(batchId: Long, k: Long, v: Long): BucketStore.TickStats =
      BucketStore.applyTick(spark, dir,
        Seq((k, v)).toDF("k", "v")
          .withColumn("bucket", BucketStore.longBucket(col("k"), 64)),
        Seq("k"), batchId = batchId, n = 64, maxLiveGenerations = 3)
    def liveGens(): Set[String] =
      BucketStore.readAll(spark, dir).inputFiles
        .map(_.split("/").find(_.startsWith("gen-")).get).toSet
    BucketStore.seed(Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v"),
      BucketStore.longBucket(col("k"), 64), dir, n = 64)
    val s0 = tick(0L, 1L, 11L)                // live: gen-base + gen-0
    assert(s0 === BucketStore.TickStats(0L, applied = true, touchedBuckets = 1,
      compacted = false, liveGenerations = 2))
    tick(1L, 2L, 21L)                         // live: base + 0 + 1 = 3 gens
    assert(liveGens() === Set("gen-base", "gen-0", "gen-1"))
    // next tick sees 3 live generations >= maxLive → folds EVERYTHING
    // (its own change included) into its generation
    val s2 = tick(2L, 3L, 31L)
    assert(s2.compacted && s2.touchedBuckets === 3 && s2.liveGenerations === 1)
    assert(liveGens() === Set("gen-2"))
    assert(storeRows(dir) === Set((1L, 11L), (2L, 21L), (3L, 31L)))
    assert(BucketStore.appliedBatchId(dir) === 2L) // publish protocol unchanged
    // the compaction is invisible to the value story: a further normal
    // tick merges against the folded store, and retention gc reclaims
    // the pre-compaction generations
    tick(3L, 1L, 12L)
    assert(storeRows(dir) === Set((1L, 12L), (2L, 21L), (3L, 31L)))
    assert(liveGens() === Set("gen-2", "gen-3"))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "gen-base")),
      "pre-compaction generations must age out through the normal retention gc")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "gen-0")))
  }

  test("soak: 20 ticks of upserts/deletes track a reference map; live generations stay bounded") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bucket_store_soak").toString + "/store"
    val maxLive = 3
    // deterministic pseudo-random stream of mutations over a 40-key space
    def keyAt(i: Int): Long = ((i * 7919L) % 40) + 1L
    val ref = scala.collection.mutable.Map[Long, Long]()
    Seq((1L, 100L), (2L, 200L)).foreach { case (k, v) => ref(k) = v }
    BucketStore.seed(ref.toSeq.toDF("k", "v"),
      BucketStore.longBucket(col("k"), 16), dir, n = 16)
    (0 until 20).foreach { i =>
      val k1 = keyAt(2 * i); val k2 = keyAt(2 * i + 1)
      // a key may not be both changed and removed in one tick (the
      // post-merge state cannot be both present and gone)
      val deleting = i % 4 == 3 && ref.contains(k2) && k2 != k1
      val changes = Seq((k1, i.toLong * 10)).toDF("k", "v")
        .withColumn("bucket", BucketStore.longBucket(col("k"), 16))
      val removed = if (deleting)
        Some(Seq((k2, 0L)).toDF("k", "v")
          .select(col("k"), BucketStore.longBucket(col("k"), 16).as("bucket")))
      else None
      val st = BucketStore.applyTick(spark, dir, changes, Seq("k"),
        batchId = i.toLong, n = 16, removed = removed,
        maxLiveGenerations = maxLive)
      ref(k1) = i.toLong * 10
      if (deleting) ref.remove(k2)
      assert(st.applied && st.liveGenerations <= maxLive,
        s"tick $i: $st exceeded the live-generation bound")
      assert(storeRows(dir) === ref.toSet, s"tick $i diverged from the reference")
    }
    assert(BucketStore.appliedBatchId(dir) === 19L)
  }

  test("append ticks stack generations O(delta): no carry-over write, merge collapses, fold compacts") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bucket_store_append").toString + "/store"
    def appended(rows: (Long, Long)*) = rows.toDF("k", "v")
      .withColumn("bucket", BucketStore.longBucket(col("k"), 64))
    def gensOf(bucket: Int): Set[String] =
      BucketStore.readBuckets(spark, dir, Seq(bucket), n = 64).inputFiles
        .map(_.split("/").find(_.startsWith("gen-")).get).toSet
    BucketStore.seed(Seq((1L, 10L), (2L, 20L)).toDF("k", "v"),
      BucketStore.longBucket(col("k"), 64), dir, n = 64)

    // append tick 0: NEW keys 65 (bucket 1 — shared with key 1) and 3
    val s0 = BucketStore.applyAppendTick(spark, dir,
      appended((65L, 650L), (3L, 30L)), batchId = 0L, n = 64)
    assert(s0 === BucketStore.TickStats(0L, applied = true, touchedBuckets = 2,
      compacted = false, liveGenerations = 2))
    assert(storeRows(dir) === Set((1L, 10L), (2L, 20L), (65L, 650L), (3L, 30L)))
    // THE O(delta) pin: the tick's generation holds ONLY the delta's
    // rows — bucket 1's pre-existing row was NOT rewritten
    assert(spark.read.parquet(s"$dir/gen-0").count() === 2L)
    // bucket 1 now spans TWO stacked generations; readers union them
    assert(gensOf(1) === Set("gen-base", "gen-0"))

    // append tick 1 stacks a third generation onto bucket 1
    BucketStore.applyAppendTick(spark, dir, appended((129L, 1290L)),
      batchId = 1L, n = 64)
    assert(gensOf(1) === Set("gen-base", "gen-0", "gen-1"))
    assert(storeRows(dir).size === 5)

    // a MERGE tick touching bucket 1 reads all three generations and
    // collapses the bucket to its own single generation; untouched
    // buckets keep their stacks
    BucketStore.applyTick(spark, dir, appended((1L, 11L)), Seq("k"),
      batchId = 2L, n = 64)
    assert(gensOf(1) === Set("gen-2"))
    assert(storeRows(dir) ===
      Set((1L, 11L), (2L, 20L), (65L, 650L), (3L, 30L), (129L, 1290L)))

    // the live-generation bound still folds: maxLive=3 with gens
    // {base, 2} + this tick's would-be stack → next append compacts
    // everything (its own rows included) into ONE generation
    BucketStore.applyAppendTick(spark, dir, appended((4L, 40L)),
      batchId = 3L, n = 64)
    val s4 = BucketStore.applyAppendTick(spark, dir, appended((5L, 50L)),
      batchId = 4L, n = 64, maxLiveGenerations = 3)
    assert(s4.compacted && s4.liveGenerations === 1)
    assert(storeRows(dir) === Set((1L, 11L), (2L, 20L), (65L, 650L),
      (3L, 30L), (129L, 1290L), (4L, 40L), (5L, 50L)))
    assert(BucketStore.readAll(spark, dir).inputFiles
      .forall(_.contains("gen-4")), "fold must collapse to the tick's generation")
  }

  test("merge-on-read appends: partial rows aggregate on read; onCompact folds them at compaction") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bucket_store_mor").toString + "/store"
    def partial(rows: (String, Long)*) = rows.toDF("k", "n")
      .withColumn("bucket", BucketStore.md5Bucket(md5(col("k")), 64))
    def summed: Map[String, Long] = BucketStore.readAll(spark, dir)
      .groupBy(col("k")).agg(sum(col("n")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val reduce: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      _.groupBy(col("k"), col("bucket")).agg(sum(col("n")).as("n"))
    BucketStore.seed(partial(("hot", 1L), ("cold", 1L)).select("k", "n"),
      BucketStore.md5Bucket(md5(col("k")), 64), dir, n = 64,
      kind = BucketStore.KindMd5)

    // three append ticks each add a PARTIAL count for the hot key —
    // zero carry-over writes (each generation holds exactly 1 row)
    (0L to 2L).foreach { b =>
      BucketStore.applyAppendTick(spark, dir, partial(("hot", 1L)),
        batchId = b, n = 64, onCompact = reduce)
      assert(spark.read.parquet(s"$dir/gen-$b").count() === 1L)
    }
    // merge-on-read: the aggregated view is exact at every point
    assert(summed === Map("hot" -> 4L, "cold" -> 1L))

    // the compaction fold applies the SAME reduction: after it fires,
    // the hot key's partials collapse to ONE physical row
    val st = BucketStore.applyAppendTick(spark, dir, partial(("hot", 1L)),
      batchId = 3L, n = 64, maxLiveGenerations = 3, onCompact = reduce)
    assert(st.compacted && st.liveGenerations === 1)
    assert(summed === Map("hot" -> 5L, "cold" -> 1L))
    assert(spark.read.parquet(s"$dir/gen-3")
      .filter(col("k") === "hot").count() === 1L,
      "compaction must reduce partial rows, not just concatenate them")
  }

  test("append-tick crash window: unpublished generation rolls back; replay is idempotent") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bucket_store_append_crash").toString + "/store"
    def appended(rows: (Long, Long)*) = rows.toDF("k", "v")
      .withColumn("bucket", BucketStore.longBucket(col("k"), 64))
    BucketStore.seed(Seq((1L, 10L)).toDF("k", "v"),
      BucketStore.longBucket(col("k"), 64), dir, n = 64)
    // crash AFTER the generation write, BEFORE manifest + marker
    val boom = new RuntimeException("crash before publish")
    val e = intercept[RuntimeException] {
      BucketStore.applyAppendTick(spark, dir, appended((2L, 20L)),
        batchId = 0L, n = 64, beforePublish = () => throw boom)
    }
    assert(e eq boom)
    // unpublished = invisible; recover sweeps the orphans
    assert(storeRows(dir) === Set((1L, 10L)))
    assert(BucketStore.appliedBatchId(dir) === -1L)
    BucketStore.recover(dir)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "gen-0")))
    // the at-least-once replay then lands the same batch for real
    val st = BucketStore.applyAppendTick(spark, dir, appended((2L, 20L)),
      batchId = 0L, n = 64)
    assert(st.applied)
    assert(storeRows(dir) === Set((1L, 10L), (2L, 20L)))
    // and a replayed (already-applied) batch no-ops
    val replay = BucketStore.applyAppendTick(spark, dir, appended((3L, 30L)),
      batchId = 0L, n = 64)
    assert(!replay.applied)
    assert(storeRows(dir) === Set((1L, 10L), (2L, 20L)))
  }

  test("writer fencing: of two interleaved appliers exactly one wins and the loser fails loudly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bucket_store_fence").toString + "/store"
    BucketStore.seed(Seq((1L, 10L), (2L, 20L)).toDF("k", "v"),
      BucketStore.longBucket(col("k"), 64), dir, n = 64)

    def changesOf(k: Long, v: Long) = Seq((k, v)).toDF("k", "v")
      .withColumn("bucket", BucketStore.longBucket(col("k"), 64))

    // Writer A reads the store, computes its merge, and — in the
    // window between its compute and its publish — writer B (a second
    // maintainer accidentally pointed at the same store) runs a full
    // tick. A's publish must then fail loudly, not overwrite B's.
    var interleaved = false
    val e = intercept[BucketStore.ConcurrentWriterException] {
      BucketStore.applyTick(spark, dir, changesOf(1L, 111L), Seq("k"),
        batchId = 5L, n = 64,
        beforePublish = () => {
          val st = BucketStore.applyTick(spark, dir, changesOf(2L, 222L),
            Seq("k"), batchId = 4L, n = 64)
          assert(st.applied)
          interleaved = true
        })
    }
    assert(interleaved)
    assert(e.getMessage.contains("another maintainer"))
    // store state equals the WINNER's tick: B's change landed, A's did not
    assert(storeRows(dir) === Set((1L, 10L), (2L, 222L)))
    assert(BucketStore.appliedBatchId(dir) === 4L)

    // the loser's orphaned generation is garbage, not live state, and
    // the next healthy tick publishes over it normally and gc sweeps it
    val st2 = BucketStore.applyTick(spark, dir, changesOf(3L, 30L), Seq("k"),
      batchId = 6L, n = 64)
    assert(st2.applied)
    assert(storeRows(dir) === Set((1L, 10L), (2L, 222L), (3L, 30L)))

    // same-batch-id race: B already published batch 7; A attempting
    // batch 7 afterwards is stopped by the replay guard (applied=false)
    BucketStore.applyTick(spark, dir, changesOf(1L, 77L), Seq("k"),
      batchId = 7L, n = 64)
    val replay = BucketStore.applyTick(spark, dir, changesOf(1L, 88L), Seq("k"),
      batchId = 7L, n = 64)
    assert(!replay.applied)
    assert(storeRows(dir) === Set((1L, 77L), (2L, 222L), (3L, 30L)))
  }

  test("writer lease: the loser is blocked at ENTRY — no orphan generation written at all") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bucket_store_lease").toString + "/store"
    BucketStore.seed(Seq((1L, 10L), (2L, 20L)).toDF("k", "v"),
      BucketStore.longBucket(col("k"), 64), dir, n = 64)
    def changesOf(k: Long, v: Long) = Seq((k, v)).toDF("k", "v")
      .withColumn("bucket", BucketStore.longBucket(col("k"), 64))
    def genDirs(): Set[String] = new java.io.File(dir).listFiles().toSeq
      .map(_.getName).filter(_.startsWith("gen-")).toSet

    // under the fence alone, an interleaved writer B completes a full
    // tick and A's orphan generation hits disk before the loud loss;
    // under the LEASE, B cannot even enter: create-exclusive on the
    // lease file is atomic on a POSIX local FS, so B throws at entry
    // and writes NOTHING
    val leaseA = BucketStore.WriterLease(writerId = "maintainer-A")
    val leaseB = BucketStore.WriterLease(writerId = "maintainer-B")
    val gensBeforeB = new java.util.concurrent.atomic.AtomicReference[Set[String]](Set.empty)
    var bBlocked = false
    val stA = BucketStore.applyTick(spark, dir, changesOf(1L, 111L), Seq("k"),
      batchId = 5L, n = 64, lease = Some(leaseA),
      beforePublish = () => {
        gensBeforeB.set(genDirs())
        val e = intercept[BucketStore.ConcurrentWriterException] {
          BucketStore.applyTick(spark, dir, changesOf(2L, 222L), Seq("k"),
            batchId = 4L, n = 64, lease = Some(leaseB))
        }
        assert(e.getMessage.contains("lease held by another maintainer"))
        assert(genDirs() === gensBeforeB.get(), "loser wrote a generation before being blocked")
        bBlocked = true
      })
    assert(stA.applied && bBlocked)
    assert(storeRows(dir) === Set((1L, 111L), (2L, 20L))) // A's tick, uncontested
    assert(!genDirs().exists(_ == "gen-4"), "loser's orphan generation exists")

    // lease released after A's tick: B now enters and applies cleanly
    val stB = BucketStore.applyTick(spark, dir, changesOf(2L, 222L), Seq("k"),
      batchId = 6L, n = 64, lease = Some(leaseB))
    assert(stB.applied)
    assert(storeRows(dir) === Set((1L, 111L), (2L, 222L)))

    // crashed-holder story: a stale lease (expired TTL) is reclaimed,
    // a live one refuses
    val (fs0, p0) = (new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration), new org.apache.hadoop.fs.Path(dir))
    val lp = new org.apache.hadoop.fs.Path(p0, "_graft_writer_lease")
    val out = fs0.create(lp, true)
    out.write(s"crashed-writer\n${System.currentTimeMillis() - 1000}".getBytes("UTF-8")); out.close()
    val stC = BucketStore.applyTick(spark, dir, changesOf(3L, 30L), Seq("k"),
      batchId = 7L, n = 64, lease = Some(leaseA))
    assert(stC.applied, "expired lease was not reclaimed")
    // same writer id re-enters (restart with a durable id): idempotent
    val out2 = fs0.create(lp, true)
    out2.write(s"maintainer-A\n${System.currentTimeMillis() + 600000}".getBytes("UTF-8")); out2.close()
    val stD = BucketStore.applyTick(spark, dir, changesOf(3L, 33L), Seq("k"),
      batchId = 8L, n = 64, lease = Some(leaseA))
    assert(stD.applied)
    ()
  }

  test("derived bucket counts pin the anchors/clamps; stores recover their layout from meta") {
    import spark.implicits._
    // test-SF floor: every test corpus keeps the historical 64
    assert(BucketStore.deriveBuckets(500) === 64)
    assert(BucketStore.deriveBuckets(256000) === 64)
    // scale anchor: 1M rows derive the 256 the scale run hand-picked
    assert(BucketStore.deriveBuckets(1000000L) === 256)
    // clamp + monotone: ~4k rows/bucket up to the 65536 top
    assert(BucketStore.deriveBuckets(1000000000L) === 65536)
    val ns = Seq(1L, 100000L, 1000000L, 100000000L, 10000000000L)
    assert(ns.map(BucketStore.deriveBuckets) === ns.map(BucketStore.deriveBuckets).sorted)
    // the cooc MATRIX store's own curve (r16, the r15 verdict's #3):
    // ~4M rows/bucket — ~1000× flatter than the row-store curve,
    // anchored by the 20M-fact sweep (196M matrix rows: walls
    // flat-to-adverse in bucket count, so the receipt point keeps the
    // measured-minimum 64 and granularity grows only with file scale)
    import graft.operators.ItemCF
    assert(ItemCF.deriveMatrixBuckets(1000L) === 64)       // test-SF floor
    assert(ItemCF.deriveMatrixBuckets(196000312L) === 64)  // the sweep receipt point
    assert(ItemCF.deriveMatrixBuckets(1000000000L) === 256)
    assert(ItemCF.deriveMatrixBuckets(1000000000000L) === 65536) // clamp
    assert(ns.map(ItemCF.deriveMatrixBuckets) === ns.map(ItemCF.deriveMatrixBuckets).sorted)
    // a seeded store's meta IS the layout contract: seededBuckets
    // round-trips the seed-time count, and an unseeded dir fails loudly
    val dir = java.nio.file.Files.createTempDirectory("derive_buckets").toString + "/s"
    BucketStore.seed(Seq((1L, "a"), (2L, "b")).toDF("id", "v"),
      BucketStore.longBucket(col("id"), 96), dir, 96)
    assert(BucketStore.seededBuckets(dir) === 96)
    intercept[IllegalStateException] {
      BucketStore.seededBuckets(dir + "_missing")
    }
    ()
  }

  test("generation footers match the recorded schema; empty-store reads report the same (relaxed) schema as pruned reads") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bucket_store_schema").toString + "/store"
    BucketStore.seed(Seq((1L, 10L), (2L, 20L)).toDF("k", "v"),
      BucketStore.longBucket(col("k"), 64), dir, n = 64)
    def bucketed(rows: (Long, Long)*) = rows.toDF("k", "v")
      .withColumn("bucket", BucketStore.longBucket(col("k"), 64))
    BucketStore.applyTick(spark, dir, bucketed((3L, 30L)), Seq("k"), batchId = 0L, n = 64)
    BucketStore.applyAppendTick(spark, dir, bucketed((4L, 40L)), batchId = 1L, n = 64)
    // the store schema is immutable after seed: selectPaths reads every
    // generation with the RECORDED schema, so a tick that wrote drifted
    // columns would be silently masked (extras dropped, missing as
    // null). Pin that each generation's own footer-inferred schema
    // (field name -> type) equals the recorded one.
    val recorded = org.apache.spark.sql.types.DataType.fromJson(
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dir, "_graft_schema")), "UTF-8"))
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val recordedTypes = recorded.fields.map(f => f.name -> f.dataType).toMap
    val genDirs = new java.io.File(dir).listFiles().toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("gen-"))
    assert(genDirs.size >= 2) // seed collapsed by the merge? at least base+one live gen
    genDirs.foreach { g =>
      val inferred = spark.read.parquet(g.toString).schema
      assert(inferred.fields.map(f => f.name -> f.dataType).toMap === recordedTypes,
        s"generation ${g.getName} footer schema drifted from the recorded store schema")
    }
    // empty-store read path reports the recorded schema nullable-relaxed,
    // exactly like a pruned read of live buckets (r17 ADVICE: the two
    // branches disagreed on nullability)
    val live = BucketStore.readAll(spark, dir)
    val emptyDir = java.nio.file.Files.createTempDirectory("bucket_store_schema_e").toString + "/store"
    BucketStore.seed(Seq((1L, 10L)).toDF("k", "v"),
      BucketStore.longBucket(col("k"), 64), emptyDir, n = 64)
    // tombstone the only row: the store becomes empty but must stay
    // readable off its recorded schema
    BucketStore.applyTick(spark, emptyDir,
      bucketed().select(col("k"), col("v"), col("bucket")), Seq("k"),
      batchId = 0L, n = 64,
      removed = Some(Seq(1L).toDF("k")
        .withColumn("bucket", BucketStore.longBucket(col("k"), 64))))
    val empty = BucketStore.readAll(spark, emptyDir)
    assert(empty.count() === 0)
    assert(empty.schema.fields.map(f => (f.name, f.dataType, f.nullable)).toSeq ===
      live.schema.fields.map(f => (f.name, f.dataType, f.nullable)).toSeq)
    ()
  }

  test("r17 tick job budget: one delta job per merge tick, zero per append tick; empty append still advances the marker") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bucket_store_jobs").toString + "/store"
    BucketStore.seed(Seq((1L, 10L), (2L, 20L)).toDF("k", "v"),
      BucketStore.longBucket(col("k"), 64), dir, n = 64)
    def bucketed(rows: (Long, Long)*) = rows.toDF("k", "v")
      .withColumn("bucket", BucketStore.longBucket(col("k"), 64))
    // count scheduled jobs across one tick — the r17 change folded the
    // merge tick's touched-bucket distinct and its broadcast-gate count
    // into ONE aggregation job, and removed the append tick's pre-write
    // distinct outright (touched buckets come off the written
    // generation's partition dirs, a filesystem listing)
    // per-JOB-GROUP counts (r17 ADVICE): a bare global counter let late
    // JobStart events from one jobsOf section bleed into the next on a
    // contended host; tagging each section with its own job group makes
    // the attribution race-free — the settle loop below only absorbs
    // the bus's delivery lag for the section's OWN jobs
    val jobsByGroup = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val g = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.jobGroup.id"))).getOrElse("")
        jobsByGroup.merge(g, 1, (a, b) => a + b); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    // the listener bus is async — read the group's counter once it
    // stops moving
    def settled(group: String): Int = {
      def cnt(): Int = Option(jobsByGroup.get(group)).fold(0)(_.intValue())
      var prev = -1; var cur = cnt(); var spins = 0
      while (cur != prev && spins < 100) {
        prev = cur; Thread.sleep(50); cur = cnt(); spins += 1
      }
      cur
    }
    // AQE surfaces each query stage as its own job, which would make
    // the budget Spark-version-shaped; the pin is about GRAFT's job
    // structure, so pin it with AQE off (session conf restored below)
    val aqe0 = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      def jobsOf(group: String)(f: => Unit): Int = {
        spark.sparkContext.setJobGroup(group, group)
        try f finally spark.sparkContext.clearJobGroup()
        settled(group)
      }
      // merge tick: ONE delta stats job (touched buckets + gate count
      // fused) + the broadcast build + the generation write = 3; the
      // pre-r17 shape paid 4 (distinct, gate count, broadcast, write)
      val mergeJobs = jobsOf("budget-merge") {
        BucketStore.applyTick(spark, dir, bucketed((1L, 11L)), Seq("k"),
          batchId = 0L, n = 64,
          removed = Some(Seq((2L, 0L)).toDF("k", "v")
            .select(col("k"), BucketStore.longBucket(col("k"), 64).as("bucket"))))
      }
      assert(storeRows(dir) === Set((1L, 11L)))
      assert(mergeJobs <= 3,
        s"merge tick should schedule at most 3 jobs (stats + broadcast + write), saw $mergeJobs")
      // append tick: the generation write only = exactly 1 (the
      // pre-r17 shape paid 2: a delta distinct, then the write)
      val appendJobs = jobsOf("budget-append") {
        val st = BucketStore.applyAppendTick(spark, dir, bucketed((3L, 30L)),
          batchId = 1L, n = 64)
        assert(st.applied && st.touchedBuckets === 1 && !st.compacted)
      }
      assert(storeRows(dir) === Set((1L, 11L), (3L, 30L)))
      assert(appendJobs <= 1,
        s"append tick should schedule at most 1 job (the write), saw $appendJobs")
      // empty append tick: no bucket dirs written → manifest unchanged,
      // marker advances (replay-guard requirement), store intact
      val st = BucketStore.applyAppendTick(spark, dir,
        spark.emptyDataset[(Long, Long)].toDF("k", "v")
          .withColumn("bucket", BucketStore.longBucket(col("k"), 64)),
        batchId = 2L, n = 64)
      assert(st.applied && st.touchedBuckets === 0 && !st.compacted)
      assert(BucketStore.appliedBatchId(dir) === 2L)
      assert(storeRows(dir) === Set((1L, 11L), (3L, 30L)))
      // and the replayed empty batch no-ops via the guard
      val st2 = BucketStore.applyAppendTick(spark, dir,
        bucketed((9L, 90L)), batchId = 2L, n = 64)
      assert(!st2.applied)
      assert(storeRows(dir) === Set((1L, 11L), (3L, 30L)))
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe0)
      spark.sparkContext.removeSparkListener(listener)
    }
  }

  test("r18 narrow merge: a broadcast-gated merge tick's generation write plans exactly one shuffle (the delta side)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bucket_store_narrow").toString + "/store"
    // a store with rows in several buckets, so the carry-over side is
    // a real multi-bucket scan
    BucketStore.seed(
      spark.range(0L, 1000L).select(col("id").as("k"), (col("id") * 2).as("v")),
      BucketStore.longBucket(col("k"), 8), dir, n = 8)
    // capture the tick's write plans off the listener manager; the bus
    // is async, so the assertion below polls until the gen write shows
    val plans = scala.collection.mutable.ArrayBuffer.empty[String]
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        plans.synchronized { plans += qe.executedPlan.toString; () }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      BucketStore.applyTick(spark, dir,
        Seq((1L, 99L), (9L, 90L)).toDF("k", "v")
          .withColumn("bucket", BucketStore.longBucket(col("k"), 8)),
        Seq("k"), batchId = 1L, n = 8,
        removed = Some(Seq((2L, 0L)).toDF("k", "v")
          .select(col("k"), BucketStore.longBucket(col("k"), 8).as("bucket"))))
      def genWrite(): Option[String] = plans.synchronized {
        plans.find(p => p.contains("gen-1") && p.contains("InsertIntoHadoopFsRelation"))
      }
      var spins = 0
      while (genWrite().isEmpty && spins < 100) { Thread.sleep(50); spins += 1 }
      val planFull = genWrite().getOrElse(fail("gen-1 write plan never reached the listener"))
      // AdaptiveSparkPlan's toString appends the pre-AQE "Initial Plan"
      // section after the final one — count shuffles in the FINAL plan
      val plan = planFull.split("== Initial Plan ==")(0)
      // the carry-over side must stay NARROW: scan → broadcast anti →
      // union, no hashpartitioning exchange of the touched store; the
      // ONLY shuffle is the delta-sized repartition(bucket) of ch
      val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(shuffles === 1,
        s"broadcast-gated merge write should shuffle only the delta, saw $shuffles exchanges in:\n$plan")
      assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
        s"carry-over anti should be a broadcast join in:\n$plan")
      // and the merged content is right
      assert(storeRows(dir) === (
        (0L until 1000L).filterNot(k => k == 1L || k == 2L || k == 9L)
          .map(k => (k, k * 2)).toSet ++ Set((1L, 99L), (9L, 90L))))
    } finally spark.listenerManager.unregister(listener)
  }
}
