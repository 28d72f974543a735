package graft

import graft.operators.TextAnalysis
import graft.streaming.{BucketStore, DocStream}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The continuous rung of the line-dedup family: a bucketed line-count
  * store maintained by [[DocStream.startLineCountMaintain]] must equal
  * the from-scratch [[TextAnalysis.lineCountsOf]] of everything ever
  * ingested after EVERY tick — with a boilerplate line accumulating
  * across tick boundaries, a within-doc repeat counting once, replay
  * no-oping, and untouched buckets passing through byte-identical.
  * Finally the store's ≥ minDocs keys must clean a fresh delta exactly
  * like the batch scrub would.
  */
class LineStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("streaming line-count maintenance equals batch recount after every tick") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("line_mv").toString
    val storeDir = root + "/store"

    val seed = Seq(
      (1L, "Cookie notice\nbody one"),
      (2L, "Cookie notice\nbody two"),
      (3L, "unique alpha\n\nunique beta"))
    var corpus = seed
    BucketStore.seed(
      TextAnalysis.lineCountsOf(seed.toDF("doc_id", "text")),
      BucketStore.md5Bucket(md5(col("k")), 64), storeDir, n = 64,
      kind = BucketStore.KindMd5)

    val input = MemoryStream[DocIngest]
    val q = DocStream.startLineCountMaintain(input.toDF(), storeDir, root + "/ckpt")

    def storeNow = DocStream.readLineCounts(spark, storeDir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    def batchNow = TextAnalysis.lineCountsOf(corpus.toDF("doc_id", "text"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet

    // tick 1: the seed's boilerplate line again (cross-tick
    // accumulation), a brand-new line, and a doc repeating one line
    // twice (must count ONE doc)
    input.addData(DocIngest(10L, "Cookie notice\nfresh line\nfresh line"))
    corpus ++= Seq((10L, "Cookie notice\nfresh line\nfresh line"))
    q.processAllAvailable()
    assert(storeNow === batchNow)
    assert(storeNow.contains(("Cookie notice", 3L)))
    assert(storeNow.contains(("fresh line", 1L)))

    // tick 2: only "fresh line" moves — every other bucket must come
    // through byte-identical
    val before = TestFiles.bucketFileHashes(spark, storeDir)
    input.addData(DocIngest(11L, "fresh line"))
    corpus ++= Seq((11L, "fresh line"))
    q.processAllAvailable()
    assert(storeNow === batchNow)
    assert(storeNow.contains(("fresh line", 2L)))
    val after = TestFiles.bucketFileHashes(spark, storeDir)
    val freshBucket = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest("fresh line".getBytes("UTF-8")).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(d.take(4), 16) % 64).toInt
    }
    val untouched = before.filter { case (p, _) => !TestFiles.inBucket(p, freshBucket) }
    assert(untouched.nonEmpty)
    untouched.foreach { case (path, h) =>
      assert(after.get(path).contains(h), s"untouched $path was rewritten")
    }
    // O(delta) write pin (merge-on-read append protocol): tick 2's
    // stacked generation holds exactly the delta's ONE partial row —
    // the seed's counts were never re-read or rewritten
    assert(spark.read.parquet(s"$storeDir/gen-1").count() === 1L)
    q.stop()

    // the store cleans a fresh delta exactly like the batch scrub
    val delta = Seq((20L, "Cookie notice\nnew content")).toDF("doc_id", "text")
    val viaStore = TextAnalysis.cleanWithBoiler(delta,
      DocStream.readLineCounts(spark, storeDir).filter(col("ndocs") >= 2).select(col("k")))
      .collect().head
    assert(viaStore.getAs[String]("clean_text") === "new content")
    assert(viaStore.getAs[Long]("n_removed") === 1L)
  }

  test("replayed tick is a no-op (applied-batch marker)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("line_mv2").toString
    val storeDir = root + "/store"
    BucketStore.seed(
      TextAnalysis.lineCountsOf(Seq((1L, "base line")).toDF("doc_id", "text")),
      BucketStore.md5Bucket(md5(col("k")), 64), storeDir, n = 64,
      kind = BucketStore.KindMd5)
    val input = MemoryStream[DocIngest]
    val q = DocStream.startLineCountMaintain(input.toDF(), storeDir, root + "/ckpt")
    input.addData(DocIngest(2L, "base line"))
    q.processAllAvailable()
    q.stop()
    // restart from the SAME checkpoint replays nothing: counts stable
    val q2 = DocStream.startLineCountMaintain(input.toDF(), storeDir, root + "/ckpt")
    q2.processAllAvailable()
    q2.stop()
    val counts = DocStream.readLineCounts(spark, storeDir)
      .collect().map(r => (r.getAs[String]("k"), r.getAs[Long]("ndocs"))).toMap
    assert(counts("base line") === 2L)
  }

  test("line-count CDC: deletes subtract, updates move lines, boilerplate verdicts deflate; ≡ batch recount of the mutated corpus") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("line_cdc").toString
    val storeDir = root + "/store"
    // "Cookie notice" sits at the minDocs=2 boilerplate threshold
    // through docs 1 and 2; deleting doc 2 must deflate it below
    val seed = Seq(
      (1L, "Cookie notice\nbody one"),
      (2L, "Cookie notice\nbody two"),
      (3L, "unique alpha"))
    BucketStore.seed(
      TextAnalysis.lineCountsOf(seed.toDF("doc_id", "text")),
      BucketStore.md5Bucket(md5(col("k")), 64), storeDir, n = 64,
      kind = BucketStore.KindMd5)

    val input = MemoryStream[DocCdcIngest]
    val q = DocStream.startLineCountMaintain(input.toDF(), storeDir, root + "/ckpt")
    // one CDC batch: DELETE doc 2, UPDATE doc 3 to carry a line it
    // shares with nobody plus one it keeps (unchanged lines must not
    // double-count through the +1/-1 union)
    input.addData(
      DocCdcIngest("d", 2L, null, "Cookie notice\nbody two"),
      DocCdcIngest("u", 3L, "unique alpha\nunique gamma", "unique alpha"))
    q.processAllAvailable()
    q.stop()
    val mutated = Seq(
      (1L, "Cookie notice\nbody one"),
      (3L, "unique alpha\nunique gamma"))
    val expected = TextAnalysis.lineCountsOf(mutated.toDF("doc_id", "text"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val got = DocStream.readLineCounts(spark, storeDir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === expected)
    // the deflated line no longer reaches the boilerplate verdict
    assert(got.contains(("Cookie notice", 1L)))
    assert(!got.exists(t => t._1 == "body two"),
      "a fully-deleted line must net to zero and drop out of the read")
    // and the whole CDC tick rode the APPEND path: one stacked
    // generation of signed partials, no bucket re-merge
    assert(new java.io.File(s"$storeDir/gen-0").exists())
  }
}
