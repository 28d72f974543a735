package graft

import graft.streaming.DocStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

case class DocIngest(doc_id: Long, text: String)
case class DocCdcIngest(op: String, doc_id: Long, text: String, text_before: String)

/** The materialized-store regime of incremental exact dedup,
  * end-to-end: a parquet group store maintained by
  * [[DocStream.startDedupMaintain]] must equal the from-scratch batch
  * dedup of everything ever ingested, after EVERY tick — with copies
  * arriving across tick boundaries (the store-side keeper must win),
  * within one tick, and via at-least-once redelivery (the replay
  * marker must make it a no-op).
  */
class DedupStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("streaming dedup-store maintenance equals batch recompute after every tick") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("dedup_mv").toString
    val storeDir = root + "/store"

    // seed corpus: two singleton groups + one 2-copy group
    val seed = Seq(
      (1L, "alpha beta gamma"), (2L, "delta epsilon"),
      (3L, "alpha beta gamma"), (4L, "zeta eta theta"))
    var corpus = seed
    graft.operators.Dedup.seedDedupMemberStore(spark,
      seed.toDF("doc_id", "text"), storeDir, nBuckets = 64)

    val input = MemoryStream[DocIngest]
    val q = DocStream.startDedupMaintain(input.toDF(), storeDir, root + "/ckpt")

    def storeNow = graft.operators.Dedup.readDedupGroups(spark, storeDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    def batchNow = corpus.toDF("doc_id", "text")
      .groupBy(md5(col("text")).as("text_md5"))
      .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_copies"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

    // tick 1: a cross-tick copy (doc 10 duplicates seed group "alpha…",
    // whose keeper 1 must survive), a brand-new group, and a
    // within-tick double delivery of the same (doc_id, text) row
    input.addData(DocIngest(10L, "alpha beta gamma"),
      DocIngest(11L, "iota kappa"), DocIngest(11L, "iota kappa"))
    corpus ++= Seq((10L, "alpha beta gamma"), (11L, "iota kappa"))
    q.processAllAvailable()
    assert(storeNow === batchNow)
    // the merged group kept the STORE's keeper and counted the copy
    val alpha = storeNow.find(_._2 == 1L).get
    assert(alpha._3 === 3L)
    // untouched group carried over
    assert(storeNow.exists(t => t._2 == 2L && t._3 == 1L))

    // tick 2: another copy of the same group + a copy of tick 1's new
    // group (keeper 11 from the PREVIOUS tick must survive). Append
    // ticks stack a NEW generation only — every pre-tick file must
    // come through BYTE-IDENTICAL (r14: O(delta) member appends)
    val before = TestFiles.bucketFileHashes(spark, storeDir)
    val touched2 = Seq("alpha beta gamma", "iota kappa").map { t =>
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(d.take(4), 16) % 64).toInt
    }.toSet
    input.addData(DocIngest(12L, "alpha beta gamma"), DocIngest(13L, "iota kappa"))
    corpus ++= Seq((12L, "alpha beta gamma"), (13L, "iota kappa"))
    q.processAllAvailable()
    q.stop()
    assert(storeNow === batchNow)
    assert(storeNow.find(_._2 == 1L).get._3 === 4L)
    assert(storeNow.exists(t => t._2 == 11L && t._3 == 2L))
    val after = TestFiles.bucketFileHashes(spark, storeDir)
    val untouched = before.filter { case (p, _) => !touched2.exists(TestFiles.inBucket(p, _)) }
    assert(untouched.nonEmpty) // the seed's other groups live elsewhere
    untouched.foreach { case (path, h) => assert(after.get(path).contains(h)) }

    // the applied-batch marker swapped in with the store (replay guard)
    val marker = java.nio.file.FileSystems.getDefault
      .getPath(storeDir, "_graft_applied_batch")
    assert(java.nio.file.Files.exists(marker))
    assert(graft.streaming.BucketStore.appliedBatchId(storeDir) === 1L)
  }

  test("dedup-store CDC: keeper deletion elects the next member, last deletion ends the group, updates move docs; ≡ batch recompute") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("dedup_cdc").toString
    val storeDir = root + "/store"
    // groups: A = {1, 3, 10} (keeper 1), B = {2}, C = {4}
    val seed = Seq(
      (1L, "alpha beta gamma"), (2L, "delta epsilon"),
      (3L, "alpha beta gamma"), (4L, "zeta eta theta"),
      (10L, "alpha beta gamma"))
    graft.operators.Dedup.seedDedupMemberStore(spark,
      seed.toDF("doc_id", "text"), storeDir, nBuckets = 64)

    val input = MemoryStream[DocCdcIngest]
    val q = DocStream.startDedupMaintain(input.toDF(), storeDir, root + "/ckpt")
    def storeNow = graft.operators.Dedup.readDedupGroups(spark, storeDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    def batchOf(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")
      .groupBy(md5(col("text")).as("text_md5"))
      .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_copies"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

    // one CDC batch: DELETE keeper 1 (group A must re-elect 3),
    // DELETE 2 (its group must vanish), UPDATE 4 to group A's content
    // (moves between groups), INSERT 20 as a new singleton
    input.addData(
      DocCdcIngest("d", 1L, null, "alpha beta gamma"),
      DocCdcIngest("d", 2L, null, "delta epsilon"),
      DocCdcIngest("u", 4L, "alpha beta gamma", "zeta eta theta"),
      DocCdcIngest("i", 20L, "iota kappa", null))
    q.processAllAvailable()
    q.stop()
    val mutated = Seq(3L -> "alpha beta gamma", 10L -> "alpha beta gamma",
      4L -> "alpha beta gamma", 20L -> "iota kappa")
    assert(storeNow === batchOf(mutated))
    // the re-elected keeper is the next-lowest LIVE member
    assert(storeNow.exists(t => t._2 == 3L && t._3 == 3L))
    // the emptied group is really gone (no zero-count residue)
    assert(!storeNow.exists(_._2 == 2L))

    // replay: a restarted stream redelivering the batch no-ops
    val markerBefore = graft.streaming.BucketStore.appliedBatchId(storeDir)
    val input2 = MemoryStream[DocCdcIngest]
    val q2 = DocStream.startDedupMaintain(input2.toDF(), storeDir, root + "/ckpt2")
    input2.addData(DocCdcIngest("d", 1L, null, "alpha beta gamma"))
    q2.processAllAvailable()
    q2.stop()
    assert(graft.streaming.BucketStore.appliedBatchId(storeDir) === markerBefore)
    assert(storeNow === batchOf(mutated))
  }
}
