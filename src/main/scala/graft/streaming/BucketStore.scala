package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
  * Crash safety is roll-forward: the staged dir is complete (parquet
  * `_SUCCESS` + batch marker) before promotion starts, each bucket
  * promotion is a delete + atomic rename, and [[recover]] resumes an
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

  /** Bucket of a non-negative long key. */
  def longBucket(pk: Column, n: Int): Column = pmod(pk, lit(n)).cast("int")

  /** Bucket of a hex-digest key (e.g. md5): first 4 hex chars mod n —
    * uniform because the digest is.
    */
  def md5Bucket(digest: Column, n: Int): Column =
    pmod(conv(substring(digest, 1, 4), 16, 10).cast("long"), lit(n)).cast("int")

  /** Seed (or fully rebuild) a store: `df` + derived bucket column,
    * written Hive-partitioned on it. The SAME bucket expression must
    * be used by every later tick — the bucket is part of the store's
    * on-disk contract.
    */
  def seed(df: DataFrame, bucket: Column, dir: String): Unit =
    df.withColumn(BucketCol, bucket)
      .repartition(col(BucketCol))
      .write.partitionBy(BucketCol).mode("overwrite").parquet(dir)

  /** Full store read, bucket column dropped (storage concern only). */
  def readAll(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir).drop(BucketCol)

  /** Pruned read of only the named buckets — partition pruning keeps
    * the scan to those directories; untouched buckets are never
    * opened.
    */
  def readBuckets(spark: SparkSession, dir: String, buckets: Seq[Int]): DataFrame =
    spark.read.parquet(dir)
      .where(col(BucketCol).isin(buckets.map(Integer.valueOf): _*))
      .drop(BucketCol)

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
    */
  def applyTick(spark: SparkSession, dir: String, changes: DataFrame,
                keyCols: Seq[String], batchId: Long,
                removed: Option[DataFrame] = None): Unit = {
    val staged = dir + "_staged"
    if (appliedBatchId(dir) >= batchId) return
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

  private def presentBuckets(dir: String): Set[Int] = {
    import scala.jdk.CollectionConverters._
    val p = java.nio.file.FileSystems.getDefault.getPath(dir)
    java.nio.file.Files.list(p).iterator().asScala
      .filter(x => java.nio.file.Files.isDirectory(x) &&
        x.getFileName.toString.startsWith(BucketCol + "="))
      .map(_.getFileName.toString.stripPrefix(BucketCol + "=").toInt)
      .toSet
  }

  /** Batch id recorded in the store (-1 before the first tick). The
    * underscore-prefixed marker file is invisible to Spark's readers.
    */
  def appliedBatchId(dir: String): Long = {
    val p = java.nio.file.FileSystems.getDefault.getPath(dir, Marker)
    if (java.nio.file.Files.exists(p))
      new String(java.nio.file.Files.readAllBytes(p)).trim.toLong
    else -1L
  }

  private def writeMarker(dir: String, batchId: Long): Unit =
    java.nio.file.Files.write(
      java.nio.file.FileSystems.getDefault.getPath(dir, Marker),
      batchId.toString.getBytes)

  private val EmptiedManifest = "_graft_emptied_buckets"

  private def writeManifest(dir: String, emptied: Seq[Int]): Unit =
    java.nio.file.Files.write(
      java.nio.file.FileSystems.getDefault.getPath(dir, EmptiedManifest),
      emptied.mkString("\n").getBytes)

  /** Promote a complete staged tick: move each staged bucket dir over
    * its live twin (delete + atomic rename), clear the live dirs the
    * manifest marks as EMPTIED by the tick (all rows deleted — no
    * staged dir exists for them), then move the marker in, then drop
    * the staged dir. Idempotent — a crash at any point resumes here
    * via [[recover]]: already-promoted buckets are simply absent from
    * the staged dir, and re-clearing an emptied bucket is a no-op.
    */
  private def promote(dir: String): Unit = {
    import scala.jdk.CollectionConverters._
    val fs = java.nio.file.FileSystems.getDefault
    val staged = fs.getPath(dir + "_staged")
    require(java.nio.file.Files.exists(staged.resolve("_SUCCESS")),
      s"staged store $staged incomplete (no _SUCCESS)")
    val bucketDirs = java.nio.file.Files.list(staged).iterator().asScala
      .filter(p => java.nio.file.Files.isDirectory(p) &&
        p.getFileName.toString.startsWith(BucketCol + "="))
      .toSeq
    bucketDirs.foreach { bd =>
      val live = fs.getPath(dir, bd.getFileName.toString)
      EventStream.deleteRecursively(live)
      java.nio.file.Files.move(bd, live)
    }
    val manifest = staged.resolve(EmptiedManifest)
    if (java.nio.file.Files.exists(manifest))
      new String(java.nio.file.Files.readAllBytes(manifest)).split("\n")
        .filter(_.nonEmpty).foreach { b =>
          EventStream.deleteRecursively(fs.getPath(dir, s"$BucketCol=$b"))
        }
    val sm = staged.resolve(Marker)
    if (java.nio.file.Files.exists(sm))
      java.nio.file.Files.move(sm, fs.getPath(dir, Marker),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    EventStream.deleteRecursively(staged)
  }

  /** Roll an interrupted tick forward (staged dir complete and newer
    * than the store → finish its promotion) or discard it (staged dir
    * incomplete → the live store was never touched). Call before
    * every tick and at startup.
    */
  def recover(dir: String): Unit = {
    val fs = java.nio.file.FileSystems.getDefault
    val staged = fs.getPath(dir + "_staged")
    if (java.nio.file.Files.exists(staged)) {
      val stagedMarker = staged.resolve(Marker)
      val stagedId =
        if (java.nio.file.Files.exists(stagedMarker))
          new String(java.nio.file.Files.readAllBytes(stagedMarker)).trim.toLong
        else -1L
      if (java.nio.file.Files.exists(staged.resolve("_SUCCESS")) &&
          stagedId > appliedBatchId(dir))
        promote(dir)
      else
        EventStream.deleteRecursively(staged)
    }
  }
}
