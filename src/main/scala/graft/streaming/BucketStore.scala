package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}

/** Bucket-partitioned parquet store for the streaming materialized
  * views — the layout that makes a maintenance tick O(delta) in I/O,
  * not just in compute.
  *
  * The store directory is Hive-partitioned on a stable `bucket`
  * column derived from the primary key (`pmod(pk, n)` for long keys,
  * an md5-prefix mod for hash keys). Because the bucket is a pure
  * function of the key, a tick knows — from its changed rows alone —
  * exactly which partition directories it touches, and:
  *
  *  - the merge READ prunes to those buckets (partition pruning on
  *    `bucket IN (...)`), and
  *  - the WRITE stages and promotes ONLY those bucket directories;
  *    untouched buckets are never opened, their files stay
  *    byte-identical across the tick.
  *
  * This is the plain-parquet equivalent of a Delta/Iceberg MERGE into
  * a bucketed table: at 100 TB a 15-minute tick cadence must not
  * rewrite a multi-TB store to apply a few thousand changed rows —
  * with `n` buckets the rewrite is ~`touched/n` of the store, and
  * `touched` is bounded by the tick's changed-row count.
  *
  * The bucket count is part of the on-disk contract: [[seed]] records
  * it (plus the key kind) in a `_graft_store_meta` file and every
  * pruned read / tick apply asserts the caller's count against it —
  * a mismatched count would silently prune to the wrong directories
  * (a changed key's old row surviving in its old bucket while the new
  * row lands in another), so it fails fast instead. A store without
  * the meta file (seeded by an older build) is accepted unchecked.
  *
  * '''Filesystem contract.''' All store I/O — parquet data AND the
  * marker/manifest/promotion metadata — goes through the Hadoop
  * `FileSystem` resolved from the store path, so the store runs
  * wherever Spark can write: local disk, a POSIX-mounted shared FS,
  * HDFS, or an object store via its Hadoop connector (s3a://, gs://,
  * abfs://). Caveat for object stores: `rename` there is copy+delete,
  * not atomic — the roll-forward protocol tolerates a crash
  * mid-rename (resume deletes the partial destination and re-renames,
  * [[recover]]), but promotion of a bucket is O(bucket bytes) instead
  * of O(1), and readers can observe a bucket mid-copy. On HDFS /
  * POSIX renames are atomic and promotion is metadata-only.
  *
  * '''Concurrency contract: single writer, no overlapping readers.'''
  * One maintainer owns a store (the streaming foreachBatch serializes
  * ticks); promotion deletes each live bucket dir before renaming the
  * staged one in, so an independent reader scanning the store DURING
  * a tick can observe a torn view — a bucket momentarily absent, or a
  * mix of pre/post-tick buckets. Readers must run between ticks (the
  * maintainers' own merge reads do — they run inside the tick, before
  * promotion). A serving surface that needs reader isolation should
  * copy the store aside (e.g. [[EventStream.promoteStaged]]'s
  * staged/live swap) or publish store GENERATIONS readers resolve
  * atomically.
  *
  * Crash safety is roll-forward: the staged dir is complete (parquet
  * `_SUCCESS` + batch marker) before promotion starts, each bucket
  * promotion is a delete + rename, and [[recover]] resumes an
  * interrupted promotion from whatever bucket it stopped at — the
  * marker moves into the live store last, so a replayed batch
  * ([[appliedBatchId]] guard) is skipped only once the whole
  * promotion landed. An incomplete staged dir (no `_SUCCESS`, or
  * marker not newer than the store's) is discarded: the live store
  * was never touched.
  */
private[graft] object BucketStore {

  val BucketCol = "bucket"

  /** Default bucket count. Tests and local runs spread a handful of
    * keys into distinct buckets; production tunes per store size
    * (target: one bucket ≈ a few compaction-friendly files).
    */
  val DefaultBuckets = 64

  private val Marker = "_graft_applied_batch"
  private val EmptiedManifest = "_graft_emptied_buckets"
  private val MetaFile = "_graft_store_meta"

  /** Key kind recorded in the store meta (forensics; the count is the
    * asserted part of the contract).
    */
  val KindLong = "long"
  val KindMd5 = "md5"

  /** Bucket of a non-negative long key. */
  def longBucket(pk: Column, n: Int): Column = pmod(pk, lit(n)).cast("int")

  /** Bucket of a hex-digest key (e.g. md5): first 4 hex chars mod n —
    * uniform because the digest is.
    */
  def md5Bucket(digest: Column, n: Int): Column =
    pmod(conv(substring(digest, 1, 4), 16, 10).cast("long"), lit(n)).cast("int")

  /** Seed (or fully rebuild) a store: `df` + derived bucket column,
    * written Hive-partitioned on it, plus the meta file recording the
    * bucket count `n` (and key `kind`) the bucket expression used.
    * The SAME bucket expression must be used by every later tick —
    * the count half of that contract is asserted on every pruned read
    * and apply.
    */
  def seed(df: DataFrame, bucket: Column, dir: String, n: Int,
           kind: String = KindLong): Unit = {
    df.withColumn(BucketCol, bucket)
      .repartition(col(BucketCol))
      .write.partitionBy(BucketCol).mode("overwrite").parquet(dir)
    val (fs, p) = fsFor(dir)
    writeSmall(fs, new HPath(p, MetaFile), s"n=$n\nkind=$kind\n")
  }

  /** Full store read, bucket column dropped (storage concern only). */
  def readAll(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir).drop(BucketCol)

  /** Pruned read of only the named buckets — partition pruning keeps
    * the scan to those directories; untouched buckets are never
    * opened. `n` is the caller's bucket count, asserted against the
    * store meta: bucket ids computed with a different count would
    * prune to the wrong directories.
    */
  def readBuckets(spark: SparkSession, dir: String, buckets: Seq[Int],
                  n: Int): DataFrame = {
    requireBucketCount(dir, n)
    spark.read.parquet(dir)
      .where(col(BucketCol).isin(buckets.map(Integer.valueOf): _*))
      .drop(BucketCol)
  }

  /** Distinct bucket ids of a single-column `bucket` frame. The
    * collect is bounded by the store's bucket count (≤ n small ints),
    * never by data volume — the one sanctioned driver pull here.
    */
  def touchedBuckets(bucketsOnly: DataFrame): Seq[Int] =
    bucketsOnly.distinct().collect().map(_.getInt(0)).toSeq

  /** Apply one tick: `changes` is the post-merge state of every
    * touched key (bucket column included); `removed` optionally names
    * keys whose post-merge state is GONE (CDC tombstones — bucket
    * column included). Reads the touched buckets' current rows,
    * carries over rows the tick neither changed nor removed, and
    * promotes ONLY those bucket directories. An emptied-buckets
    * manifest travels with the staged dir so promotion also clears a
    * bucket the tick emptied entirely (all rows deleted → no staged
    * dir for it, but its live dir must still go). Skips (and is a
    * no-op) when `batchId` was already applied — the caller should
    * still guard on [[appliedBatchId]] to skip its merge compute too.
    * `n` is the caller's bucket count, asserted against the store
    * meta before anything is read or staged.
    */
  def applyTick(spark: SparkSession, dir: String, changes: DataFrame,
                keyCols: Seq[String], batchId: Long, n: Int,
                removed: Option[DataFrame] = None): Unit = {
    val staged = dir + "_staged"
    if (appliedBatchId(dir) >= batchId) return
    requireBucketCount(dir, n)
    val ch = changes.cache()
    val rm = removed.map(_.cache())
    val touched = touchedBuckets(
      rm.map(r => ch.select(col(BucketCol)).unionByName(r.select(col(BucketCol))))
        .getOrElse(ch.select(col(BucketCol))))
    val old = spark.read.parquet(dir)
      .where(col(BucketCol).isin(touched.map(Integer.valueOf): _*))
    // carry-over: touched-bucket rows the tick neither changed nor
    // removed. The changed-key side is delta-sized — size-gated
    // broadcast at the conservative (string-key) row cap, same
    // convention as every delta hint (Hints.broadcastIfSmall).
    val dropKeys = rm.map(r => ch.select(keyCols.map(col): _*)
        .unionByName(r.select(keyCols.map(col): _*)))
      .getOrElse(ch.select(keyCols.map(col): _*))
    val merged = old
      .join(graft.operators.Hints.broadcastIfSmall(dropKeys,
          graft.operators.Hints.DeltaBroadcastMaxRowsMd5),
        keyCols, "left_anti")
      .unionByName(ch)
    merged.repartition(col(BucketCol))
      .write.partitionBy(BucketCol).mode("overwrite").parquet(staged)
    // manifest = touched buckets the write produced NO dir for (every
    // row deleted): promotion must clear their live dirs. Listed
    // separately from the staged dirs because a resumed promotion
    // cannot tell an already-moved bucket from an emptied one.
    writeManifest(staged, touched.filterNot(presentBuckets(staged).contains))
    writeMarker(staged, batchId)
    promote(dir)
    ch.unpersist(); rm.foreach(_.unpersist())
    ()
  }

  /** Hadoop FileSystem + path for a store dir — resolved from the
    * path's scheme against the session's Hadoop conf, so file:/,
    * hdfs://, s3a:// etc. all route to the right implementation
    * (the same resolution Spark's own parquet writes use).
    */
  private def fsFor(dir: String): (FileSystem, HPath) = {
    val conf = SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession)
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())
    val p = new HPath(dir)
    (p.getFileSystem(conf), p)
  }

  private def readSmall(fs: FileSystem, p: HPath): Option[String] =
    if (fs.exists(p)) {
      val in = fs.open(p)
      try {
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](4096)
        var r = in.read(buf)
        while (r >= 0) { out.write(buf, 0, r); r = in.read(buf) }
        Some(new String(out.toByteArray, java.nio.charset.StandardCharsets.UTF_8))
      } finally in.close()
    } else None

  private def writeSmall(fs: FileSystem, p: HPath, s: String): Unit = {
    val out = fs.create(p, true)
    try out.write(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  private def requireBucketCount(dir: String, n: Int): Unit = {
    val (fs, p) = fsFor(dir)
    readSmall(fs, new HPath(p, MetaFile))
      .flatMap(_.split("\n").find(_.startsWith("n="))
        .map(_.stripPrefix("n=").trim.toInt))
      .foreach(declared => require(declared == n,
        s"bucket-count mismatch for store $dir: seeded with n=$declared, " +
          s"caller uses n=$n — a mismatched bucket fn would prune to the " +
          "wrong directories and silently duplicate keys"))
  }

  private def presentBuckets(dir: String): Set[Int] = {
    val (fs, p) = fsFor(dir)
    fs.listStatus(p)
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(BucketCol + "="))
      .map(_.getPath.getName.stripPrefix(BucketCol + "=").toInt)
      .toSet
  }

  /** Batch id recorded in the store (-1 before the first tick). The
    * underscore-prefixed marker file is invisible to Spark's readers.
    */
  def appliedBatchId(dir: String): Long = {
    val (fs, p) = fsFor(dir)
    readSmall(fs, new HPath(p, Marker)).map(_.trim.toLong).getOrElse(-1L)
  }

  private def writeMarker(dir: String, batchId: Long): Unit = {
    val (fs, p) = fsFor(dir)
    writeSmall(fs, new HPath(p, Marker), batchId.toString)
  }

  private def writeManifest(dir: String, emptied: Seq[Int]): Unit = {
    val (fs, p) = fsFor(dir)
    writeSmall(fs, new HPath(p, EmptiedManifest), emptied.mkString("\n"))
  }

  /** Promote a complete staged tick: move each staged bucket dir over
    * its live twin (delete + rename), clear the live dirs the
    * manifest marks as EMPTIED by the tick (all rows deleted — no
    * staged dir exists for them), then move the marker in, then drop
    * the staged dir. Idempotent — a crash at any point resumes here
    * via [[recover]]: already-promoted buckets are simply absent from
    * the staged dir, re-clearing an emptied bucket is a no-op, and on
    * an object store a crash mid-(copy+delete)-rename is healed by
    * the resume's delete-then-rename of the same bucket.
    */
  private def promote(dir: String): Unit = {
    val (fs, live) = fsFor(dir)
    val staged = new HPath(dir + "_staged")
    require(fs.exists(new HPath(staged, "_SUCCESS")),
      s"staged store $staged incomplete (no _SUCCESS)")
    fs.listStatus(staged)
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(BucketCol + "="))
      .foreach { st =>
        val liveBd = new HPath(live, st.getPath.getName)
        fs.delete(liveBd, true)
        require(fs.rename(st.getPath, liveBd),
          s"failed to promote staged bucket ${st.getPath} -> $liveBd")
      }
    readSmall(fs, new HPath(staged, EmptiedManifest))
      .foreach(_.split("\n").filter(_.nonEmpty).foreach { b =>
        fs.delete(new HPath(live, s"$BucketCol=$b"), true)
      })
    val sm = new HPath(staged, Marker)
    if (fs.exists(sm)) {
      val lm = new HPath(live, Marker)
      // two-step replace (Hadoop rename does not overwrite): a crash
      // between delete and rename leaves no live marker, so recover
      // re-runs this promotion — bucket moves no-op, marker lands
      fs.delete(lm, false)
      require(fs.rename(sm, lm), s"failed to move marker $sm -> $lm")
    }
    fs.delete(staged, true)
    ()
  }

  /** Roll an interrupted tick forward (staged dir complete and newer
    * than the store → finish its promotion) or discard it (staged dir
    * incomplete → the live store was never touched). Call before
    * every tick and at startup.
    */
  def recover(dir: String): Unit = {
    val (fs, _) = fsFor(dir)
    val staged = new HPath(dir + "_staged")
    if (fs.exists(staged)) {
      val stagedId = readSmall(fs, new HPath(staged, Marker))
        .map(_.trim.toLong).getOrElse(-1L)
      if (fs.exists(new HPath(staged, "_SUCCESS")) &&
          stagedId > appliedBatchId(dir))
        promote(dir)
      else
        fs.delete(staged, true)
      ()
    }
  }
}
