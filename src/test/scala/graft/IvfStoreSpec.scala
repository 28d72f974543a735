package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persisted IVF index lifecycle (`knn_ivf_store`): quantizer
  * frozen to an artifact, postings bucketed by cluster in a
  * BucketStore, appends as generation-publish ticks, search =
  * probe-pruned bucket reads. Gates:
  *  - search over (seed base + append tick) ≡ search over a ONE-SHOT
  *    index of the full corpus with the same frozen quantizer — the
  *    tick is invisible to results;
  *  - inverted lists (buckets) the tick's vectors don't land in stay
  *    byte-identical — the append is O(touched clusters) in store I/O.
  */
class IvfStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("append tick ≡ one-shot index; untouched inverted lists byte-identical") {
    val root = java.nio.file.Files.createTempDirectory("ivf_store_spec").toString
    val nlist = 8; val nQueries = 10; val k = 10; val nprobe = 2
    graft.functions.VectorFunctions.register(spark)
    val c = Tables.embeddings(spark, TestSpark.sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("norm", sqrt(expr("graft_dot(v, v)")))
      .cache()
    val base = c.filter(col("vec_id") % 10 =!= 7).select("vec_id", "v", "norm")
    val delta = c.filter(col("vec_id") % 10 === 7).select("vec_id", "v", "norm")
    val queries = c.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("norm").as("qnorm"))

    // incremental: seed base, append the held-out split as one tick
    val incDir = s"$root/inc"
    val cents = Similarity.trainQuantizer(spark, base, s"$root/cents", nlist)
    Similarity.seedIvfStore(spark, base, incDir, cents, nlist)
    val beforeTick = TestFiles.bucketFileHashes(spark, incDir)
    Similarity.ivfAppendTick(spark, incDir, cents, delta, batchId = 0L, nlist = nlist)
    val afterTick = TestFiles.bucketFileHashes(spark, incDir)

    // the centroid artifact round-trips exactly
    assert(Similarity.loadCentroids(spark, s"$root/cents") === cents)

    // untouched inverted lists: clusters none of the delta vectors
    // land in keep their seed files byte-identical
    val deltaClusters = graft.streaming.BucketStore
      .readAll(spark, incDir)
      .join(delta.select(col("vec_id")), Seq("vec_id"), "left_semi")
      .select(col("cluster")).distinct().collect().map(_.getInt(0)).toSet
    val untouched = beforeTick.filter { case (path, _) =>
      !deltaClusters.exists(cl => path.contains(s"bucket=$cl/")) }
    assert(untouched.nonEmpty, "spec needs at least one untouched cluster")
    untouched.foreach { case (path, hash) =>
      assert(afterTick.get(path).contains(hash), s"untouched list $path changed") }

    // one-shot: the full corpus seeded at once with the SAME quantizer
    val fullDir = s"$root/full"
    Similarity.seedIvfStore(spark, base.unionByName(delta), fullDir, cents, nlist)

    def results(dir: String): Set[(Long, Long, Double, Int, Int)] =
      Similarity.searchIvfStore(spark, dir, cents, queries, k, nprobe, nlist)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getInt(3), r.getInt(4))).toSet

    val inc = results(incDir)
    assert(inc === results(fullDir))
    assert(inc.size === nQueries * k) // full top-k per query
    assert(inc.map(_._1) === (0L until nQueries.toLong).toSet)
    c.unpersist()
    ()
  }

  test("IVF maintainer: streamed appends across ticks ≡ one-shot index") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("ivf_maintain_spec").toString
    val storeDir = s"$root/store"; val centsDir = s"$root/cents"
    val nlist = 8; val nQueries = 10; val k = 10; val nprobe = 2
    graft.functions.VectorFunctions.register(spark)
    val c = Tables.embeddings(spark, TestSpark.sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("norm", sqrt(expr("graft_dot(v, v)")))
      .cache()
    val base = c.filter(col("vec_id") % 10 =!= 7 && col("vec_id") % 10 =!= 3)
      .select("vec_id", "v", "norm")
    val cents = Similarity.trainQuantizer(spark, base, centsDir, nlist)
    Similarity.seedIvfStore(spark, base, storeDir, cents, nlist)

    def ingest(m: Int): Seq[VecIngest] = c.filter(col("vec_id") % 10 === m)
      .select(col("vec_id"), col("v"))
      .collect().map(r => VecIngest(r.getLong(0), r.getSeq[Double](1))).toSeq

    val input = MemoryStream[VecIngest]
    val q = streaming.DocStream.startIvfMaintain(
      input.toDF(), storeDir, centsDir, s"$root/ckpt", nlist)
    input.addData(ingest(7): _*); q.processAllAvailable()
    input.addData(ingest(3): _*); q.processAllAvailable()
    q.stop()
    assert(graft.streaming.BucketStore.appliedBatchId(storeDir) === 1L)

    // the maintained index answers exactly like a one-shot index of
    // the full corpus under the same frozen quantizer
    val fullDir = s"$root/full"
    Similarity.seedIvfStore(spark, c.select("vec_id", "v", "norm"), fullDir, cents, nlist)
    val queries = c.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("norm").as("qnorm"))
    def results(dir: String) =
      Similarity.searchIvfStore(spark, dir, cents, queries, k, nprobe, nlist)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getInt(3), r.getInt(4))).toSet
    assert(results(storeDir) === results(fullDir))
    c.unpersist()
    ()
  }
}
