package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Typed event row for streaming pipelines (µs timestamp — see
  * graft.Tables.events for the ns-parquet handling).
  */
case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                 event_type: String, value: Double)

/** Per-user running rating state — the streaming twin of the
  * reference's live redis counters (`n_ratings_<user>` incr/decr in
  * /root/reference/web/app/controller.py:127-146) and of its
  * 15-minute APScheduler recompute loop: instead of periodically
  * re-reading PostgreSQL, state updates ride the event stream.
  */
case class UserRatingState(n_events: Long, sum_value: Double)
case class UserRatingUpdate(user_id: Long, n_events: Long, sum_value: Double)

object EventStream {

  /** Continuous version of [[graft.operators.Analytics.eventsWindow]]:
    * watermarked tumbling-window aggregate per event type. Late data
    * beyond the watermark is dropped instead of blocking state growth —
    * the property that keeps this runnable forever at 100 TB/day.
    */
  def windowedStats(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Streaming gap-sessionization with the native session_window —
    * the continuous twin of [[graft.operators.Analytics.sessionize]].
    * State per (user, open session) merges as events arrive; the
    * watermark closes sessions and bounds state.
    */
  def sessionStats(events: DataFrame, gap: String = "30 minutes", watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .select(
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("sum_value"))

  /** Per-user running counters via mapGroupsWithState — emits the
    * updated (count, sum) for each user seen in the micro-batch.
    * State is per-key and bounded by the user population; a production
    * deployment adds a timeout to reap idle users.
    */
  def userRatingCounters(events: Dataset[Event]): Dataset[UserRatingUpdate] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserRatingState, UserRatingUpdate](GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[UserRatingState]) =>
          val prev = state.getOption.getOrElse(UserRatingState(0L, 0.0))
          val (n, s) = batch.foldLeft((prev.n_events, prev.sum_value)) {
            case ((cnt, sum), e) => (cnt + 1, sum + e.value)
          }
          state.update(UserRatingState(n, s))
          UserRatingUpdate(userId, n, math.rint(s * 100) / 100)
      }
  }

  /** Continuous CDC apply: a stream of rating mutations merged into a
    * BUCKET-PARTITIONED ratings snapshot ([[BucketStore]], bucketed by
    * `pmod(user_id, nBuckets)`) per micro-batch — the streaming
    * version of the reference's REST write path, with the same
    * O(delta)-I/O contract as the materialized-view maintainers: the
    * batch's keys name their buckets up front, the resolution reads
    * only those buckets' current rows
    * ([[graft.operators.Mutations.applyBatchDelta]], work ∝ batch),
    * and the apply publishes only those buckets into a new store
    * generation — tombstones included (a delete that empties a bucket
    * drops it from the manifest). On a lake this whole body is one
    * `MERGE INTO` against Delta/Iceberg; the bucket layout is the
    * plain-parquet equivalent.
    *
    * @param updates       streaming DataFrame with applyBatch's update schema
    * @param snapshot      bucketed ratings snapshot — seed with
    *                      [[BucketStore.seed]] on `pmod(user_id, nBuckets)`
    * @param checkpointDir durable streaming checkpoint (REQUIRED: the
    *                      applied-batch replay guard needs monotonic
    *                      batch ids across restarts)
    * @param nBuckets      the store's bucket count, must match the
    *                      seed; ≤ 0 (the r15 default) recovers it
    *                      from the store's meta
    */
  def startCdcApply(updates: DataFrame, snapshot: String, checkpointDir: String,
                    nBuckets: Int = -1): org.apache.spark.sql.streaming.StreamingQuery =
    updates.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        BucketStore.recover(snapshot)
        val b = batch.toDF().cache()
        // nBuckets ≤ 0 (r15 default): the store meta is the layout
        if (b.count() > 0 && BucketStore.appliedBatchId(snapshot) < batchId)
          cdcMergeTick(spark, snapshot, b, batchId,
            if (nBuckets > 0) nBuckets else BucketStore.seededBuckets(snapshot))
        b.unpersist()
        ()
      }
      .start()

  /** One CDC merge tick against a bucketed ratings snapshot — the
    * shared body of [[startCdcApply]] and [[startRetrainLoop]]: the
    * batch's keys name the touched buckets up front, the resolution
    * reads only those buckets' current rows
    * ([[graft.operators.Mutations.applyBatchDelta]], work ∝ batch),
    * and the apply publishes only those buckets into a new store
    * generation, tombstones included. Package-visible so
    * [[graft.operators.Mutations.cdcSnapshotStore]] can hash-gate
    * this exact body against a SQL oracle.
    */
  private[graft] def cdcMergeTick(spark: SparkSession, snapshot: String, b: DataFrame,
                           batchId: Long, nBuckets: Int): Unit = {
    val keys = b.select(col("user_id"), col("item_id")).distinct().cache()
    // one pass over the cached keys yields the pruned read's bucket
    // list AND the broadcast gate's row count (r17 — previously a
    // distinct-collect plus a separate count, two jobs per tick)
    val (touched, nKeys) = BucketStore.touchedBucketStats(keys.select(
      BucketStore.longBucket(col("user_id"), nBuckets).as(BucketStore.BucketCol)))
    val keysHinted = if (nKeys <= graft.operators.Hints.DeltaBroadcastMaxRows)
      broadcast(keys) else keys
    val baseTouched = BucketStore.readBuckets(spark, snapshot, touched, nBuckets)
      .join(keysHinted, Seq("user_id", "item_id"), "left_semi")
    val (changes, removed) =
      graft.operators.Mutations.applyBatchDelta(baseTouched, b)
    def bucketed(df: DataFrame) = df.withColumn(BucketStore.BucketCol,
      BucketStore.longBucket(col("user_id"), nBuckets))
    BucketStore.applyTick(spark, snapshot, bucketed(changes),
      Seq("user_id", "item_id"), batchId, n = nBuckets,
      removed = Some(bucketed(removed)))
    keys.unpersist()
    ()
  }

  /** Streaming materialized view of the co-occurrence matrix: each
    * micro-batch of new interactions flows through
    * [[graft.operators.ItemCF.coocDelta]]'s two phases (changed
    * matrix rows only — work ∝ batch, zero shuffles of matrix or
    * facts) and is MERGED into a bucket-partitioned matrix store
    * ([[BucketStore]]). This is the reference's 15-minute full
    * recompute (web/service.py APScheduler) turned into a
    * continuously maintained view whose per-tick cost no longer grows
    * with history.
    *
    * The tick is O(delta) end-to-end, reads included: the changed-key
    * set ≡ the delta-pair key set
    * ([[graft.operators.ItemCF.coocChangesFromPairs]]), so the
    * touched buckets are known BEFORE any matrix read — the merge
    * reads only those bucket partitions and the apply publishes only
    * those buckets into a new generation; untouched buckets stay
    * byte-identical (CdcStreamSpec pins it). Replay guard: the
    * applied-batch marker lands only after the tick's generation and
    * manifest are complete, so an at-least-once redelivery
    * (marker >= batchId) skips the apply; the facts append re-runs
    * and no-ops via its anti-join.
    *
    * @param interactions  streaming (user_id, item_id) new-interaction rows
    * @param factsDir      parquet snapshot of interactions seen so far
    * @param matrixDir     bucketed store of UNFILTERED pair counts
    *                      (minUsers = 1, coocIncrement's contract) in
    *                      the PACKED-key schema (pk, n_users) — seed
    *                      with [[BucketStore.seed]] over
    *                      [[graft.operators.ItemCF.coocCountsPkOn]]
    *                      bucketed by `ItemCF.pairBucket(pk, nBuckets)`
    *                      (≡ pmod(item_a, nBuckets) — r17)
    * @param checkpointDir durable streaming checkpoint. REQUIRED for
    *                      the replay guard to be sound: without one,
    *                      batch ids restart at 0 on every launch while
    *                      the applied-batch marker persists, and the
    *                      guard would skip real matrix updates forever
    * @param nBuckets      the store's bucket count — part of its
    *                      on-disk contract, must match the seed; ≤ 0
    *                      (the r15 default) recovers it from the
    *                      store's meta
    */
  def startCoocMaintain(interactions: DataFrame, factsDir: String,
                        matrixDir: String, checkpointDir: String,
                        nBuckets: Int = -1): org.apache.spark.sql.streaming.StreamingQuery =
    interactions.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        recoverSnapshot(factsDir); BucketStore.recover(matrixDir)
        // distinct: the matrix path dedups internally (coocDelta), so
        // the facts append must too — a doubly-delivered row inside
        // one trigger would otherwise corrupt the facts snapshot
        val b = batch.toDF().select(col("user_id"), col("item_id"))
          .distinct().cache()
        if (b.count() > 0) {
          val old = spark.read.parquet(factsDir)
          if (BucketStore.appliedBatchId(matrixDir) < batchId) {
            // nBuckets ≤ 0 (r15 default): the store meta is the layout
            val n = if (nBuckets > 0) nBuckets
              else BucketStore.seededBuckets(matrixDir)
            // phase 1 — delta pair counts: needs facts + batch only
            val (pairCounts, pairCaches) =
              graft.operators.ItemCF.deltaPairCountsTracked(old, b)
            val deltaPairs = pairCounts.cache()
            // phase 2 — merge against ONLY the touched buckets: the
            // changed keys are exactly the delta-pair keys, so the
            // pruned read cannot miss a bump
            val touched = BucketStore.touchedBuckets(deltaPairs.select(
              graft.operators.ItemCF.pairBucket(col("pk"), n).as(BucketStore.BucketCol)))
            val matrix = BucketStore.readBuckets(spark, matrixDir, touched, n)
            // r17: the matrix store is packed-key — (pk, n_users) rows,
            // single-long merge keys (see ItemCF.coocIncrementalStore)
            val (changes, mergeCaches) =
              graft.operators.ItemCF.coocChangesFromPairsPk(matrix, deltaPairs)
            BucketStore.applyTick(spark, matrixDir,
              changes.withColumn(BucketStore.BucketCol,
                graft.operators.ItemCF.pairBucket(col("pk"), n)),
              Seq("pk"), batchId, n = n)
            // unpersist ONLY this tick's intermediates — a session-wide
            // clearCache would thrash concurrent queries' caches
            (pairCaches ++ Seq(deltaPairs) ++ mergeCaches).foreach(_.unpersist())
          }
          // facts gain only the batch's genuinely-new (user, item)
          // rows (coocDelta ignored the rest); materialize before
          // writing — the plan reads the directory being appended to
          val newFacts = b.join(old, Seq("user_id", "item_id"), "left_anti").cache()
          newFacts.count()
          newFacts.write.mode("append").parquet(factsDir)
          newFacts.unpersist()
        }
        b.unpersist()
        ()
      }
      .start()

  /** Continuous retrain loop — the reference's periodic recompute
    * (web/service.py APScheduler: recompute_recommendations every
    * 15/30 min) turned data-driven: mutations stream into the
    * BUCKET-PARTITIONED ratings snapshot through the literal
    * [[startCdcApply]] merge body ([[cdcMergeTick]] — touched-bucket
    * read, work ∝ batch, only touched bucket dirs rewritten), and
    * once `retrainEvery` mutations have accumulated since the last
    * train, ALS refits on the merged snapshot
    * ([[BucketStore.readAll]] — the refit is legitimately global; only
    * the MERGE is O(delta)) and rewrites the per-user top-N recs (the
    * reference's redis `u<id>` export refresh).
    *
    * The snapshot must be seeded with [[BucketStore.seed]] on
    * `pmod(user_id, nBuckets)`, same as [[startCdcApply]].
    *
    * @param checkpointDir durable streaming checkpoint (REQUIRED, same
    *   contract as [[startCdcApply]]: the replay guard compares the
    *   store's applied-batch marker against the stream's batch ids, so
    *   ids must stay monotonic across restarts — without a checkpoint
    *   they restart at 0 and every batch up to the marker would be
    *   silently skipped, dropping its mutations). The pending counter
    *   is process-local (a restart retrains on the first qualifying
    *   batch — safe, just eager); production tracking belongs in the
    *   streaming checkpoint / a metadata table.
    */
  def startRetrainLoop(updates: DataFrame, snapshot: String, recsDir: String,
                       checkpointDir: String,
                       retrainEvery: Long = 100, topN: Int = 10,
                       rank: Int = 4, maxIter: Int = 5,
                       nBuckets: Int = -1): org.apache.spark.sql.streaming.StreamingQuery = {
    val pending = new java.util.concurrent.atomic.AtomicLong(0L)
    updates.writeStream.outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        BucketStore.recover(snapshot)
        val b = batch.toDF().cache()
        val n = b.count()
        // nBuckets ≤ 0 (r15 default): the store meta is the layout
        if (n > 0 && BucketStore.appliedBatchId(snapshot) < batchId)
          cdcMergeTick(spark, snapshot, b, batchId,
            if (nBuckets > 0) nBuckets else BucketStore.seededBuckets(snapshot))
        b.unpersist()
        if (n > 0 && pending.addAndGet(n) >= retrainEvery) {
          val train = BucketStore.readAll(spark, snapshot).select(
            col("user_id").cast("int").as("user"),
            col("item_id").cast("int").as("item"),
            col("rating").cast("float").as("rating"))
          val model = graft.recommender.Als.fit(train, rank, maxIter)
          // recsDir is the serving surface (the reference's redis
          // export): stage + atomic swap so a reader never observes a
          // half-written directory, and reset the pending counter only
          // AFTER the recs landed — a crash mid-train retrains on the
          // next batch instead of serving stale recs for a full window
          model.recommendForAllUsers(topN)
            .select(col("user"), explode(col("recommendations")).as("rec"))
            .select(
              col("user").cast("long").as("user_id"),
              col("rec.item").cast("long").as("item_id"),
              round(col("rec.rating").cast("double"), 4).as("score"))
            .write.mode("overwrite").parquet(recsDir + "_staged")
          promoteStaged(recsDir)
          pending.set(0L)
        }
        ()
      }
      .start()
  }

  /** Hadoop FileSystem + path for a snapshot dir — resolved from the
    * path's scheme against the session's Hadoop conf (same resolution
    * as [[BucketStore]]'s metadata I/O), so the swap protocol runs on
    * file:/, a mounted shared FS, hdfs://, or an object-store
    * connector. On object stores the renames are copy+delete, not
    * atomic — the _SUCCESS guard + [[recoverSnapshot]] still yield a
    * complete snapshot, but a whole-dir swap there is O(bytes);
    * prefer the [[BucketStore]] generation protocol for anything
    * large.
    */
  private def hadoopFs(path: String): (org.apache.hadoop.fs.FileSystem, org.apache.hadoop.fs.Path) = {
    val conf = org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new org.apache.hadoop.conf.Configuration())
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(conf), p)
  }

  /** Promote any staged directory → live: rename live aside, rename
    * staged in, drop the old copy. Directory renames are atomic on
    * POSIX/HDFS; the only non-atomic window (between the two renames)
    * is covered by [[recoverSnapshot]] because the staged dir is
    * already complete (guarded by its _SUCCESS marker). Tolerates a
    * missing live dir (first-ever write of e.g. the recs export).
    */
  private[streaming] def promoteStaged(path: String): Unit = {
    val (fs, live) = hadoopFs(path)
    val staged = new org.apache.hadoop.fs.Path(path + "_staged")
    val old = new org.apache.hadoop.fs.Path(path + "_old")
    require(fs.exists(new org.apache.hadoop.fs.Path(staged, "_SUCCESS")),
      s"staged dir $staged incomplete (no _SUCCESS)")
    fs.delete(old, true)
    // rename failure must THROW (silently losing it could delete the
    // sole surviving copy on the trailing delete)
    if (fs.exists(live))
      require(fs.rename(live, old), s"failed to move $live aside")
    require(fs.rename(staged, live), s"failed to promote $staged -> $live")
    fs.delete(old, true)
    ()
  }

  /** Crash recovery: if the live dir is missing, promote the completed
    * staged copy (crash between the two renames) or restore the old
    * copy (staged incomplete). Called before every merge, so a
    * restarted query always reads a complete base snapshot.
    */
  private[streaming] def recoverSnapshot(snapshot: String): Unit = {
    val (fs, live) = hadoopFs(snapshot)
    val staged = new org.apache.hadoop.fs.Path(snapshot + "_staged")
    val old = new org.apache.hadoop.fs.Path(snapshot + "_old")
    if (!fs.exists(live)) {
      if (fs.exists(new org.apache.hadoop.fs.Path(staged, "_SUCCESS")))
        require(fs.rename(staged, live), s"failed to recover $staged -> $live")
      else if (fs.exists(old))
        require(fs.rename(old, live), s"failed to restore $old -> $live")
    }
  }

  /** Start [[windowedStats]] against an in-memory sink (used by tests
    * and local smoke runs; swap the sink for kafka/delta in
    * production — the plan is identical).
    */
  def startMemorySink(agg: DataFrame, queryName: String): org.apache.spark.sql.streaming.StreamingQuery =
    agg.writeStream
      .outputMode(OutputMode.Update())
      .format("memory")
      .queryName(queryName)
      .start()
}
