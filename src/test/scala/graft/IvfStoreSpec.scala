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

  test("IVF maintainer tombstones: before-image deletes drop postings; re-embed moves cluster") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("ivf_tomb_spec").toString
    val storeDir = s"$root/store"; val centsDir = s"$root/cents"
    val nlist = 8
    graft.functions.VectorFunctions.register(spark)
    val c = Tables.embeddings(spark, TestSpark.sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("norm", sqrt(expr("graft_dot(v, v)")))
      .cache()
    val base = c.filter(col("vec_id") % 10 =!= 7).select("vec_id", "v", "norm")
    val cents = Similarity.trainQuantizer(spark, base, centsDir, nlist)
    Similarity.seedIvfStore(spark, base, storeDir, cents, nlist)

    val byId = c.select(col("vec_id"), col("v")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val input = MemoryStream[VecCdc]
    val q = streaming.DocStream.startIvfMaintain(
      input.toDF(), storeDir, centsDir, s"$root/ckpt", nlist)
    // one CDC batch: add the held-out split, delete two indexed
    // vectors (before-image embeddings), re-embed one (delete old
    // image + upsert a shifted vector in the same batch)
    val adds = byId.keys.filter(_ % 10 == 7).toSeq.sorted
      .map(id => VecCdc(id, byId(id), "upsert"))
    val dels = Seq(VecCdc(20L, byId(20L), "delete"), VecCdc(30L, byId(30L), "delete"))
    val reEmbedded = byId(40L).map(_ + 0.5)
    val moves = Seq(VecCdc(40L, byId(40L), "delete"), VecCdc(40L, reEmbedded, "upsert"))
    input.addData(adds ++ dels ++ moves: _*)
    q.processAllAvailable(); q.stop()

    val rows = graft.streaming.BucketStore.readAll(spark, storeDir)
      .select(col("vec_id"), col("v")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(!rows.contains(20L) && !rows.contains(30L))
    assert(rows(40L) === reEmbedded)        // new image indexed…
    assert(rows.count(_._1 == 40L) === 1)   // …exactly once
    assert(byId.keys.filter(_ % 10 == 7).forall(rows.contains))
    // no duplicate postings anywhere
    val n = graft.streaming.BucketStore.readAll(spark, storeDir).count()
    assert(n === rows.size)
    c.unpersist()
    ()
  }

  test("index rebuild publishes by pointer cutover; reader snapshot survives; retention reclaims") {
    val root = java.nio.file.Files.createTempDirectory("ivf_rebuild_spec").toString + "/idx"
    val nlist = 8; val nQueries = 5; val k = 5; val nprobe = 2
    graft.functions.VectorFunctions.register(spark)
    val c = Tables.embeddings(spark, TestSpark.sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("norm", sqrt(expr("graft_dot(v, v)")))
      .cache()
    val base = c.filter(col("vec_id") % 2 === 0).select("vec_id", "v", "norm")
    val full = c.select("vec_id", "v", "norm")
    val queries = c.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("norm").as("qnorm"))
    def search(storeDir: String, centsDir: String) =
      Similarity.searchIvfStore(spark, storeDir,
        Similarity.loadCentroids(spark, centsDir), queries, k, nprobe, nlist)

    // no published version yet → loud failure, not an empty answer
    val e = intercept[IllegalArgumentException] { Similarity.resolveIvfIndex(spark, root) }
    assert(e.getMessage.contains("no published IVF index"))

    // v0: built from the base corpus, published, searchable
    assert(Similarity.rebuildIvfIndex(spark, base, root, nlist) === 0L)
    val (store0, cents0) = Similarity.resolveIvfIndex(spark, root)
    assert(store0.contains("idx-0"))
    val v0Results = search(store0, cents0).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(v0Results.nonEmpty)

    // v1: rebuilt from the FULL corpus (new quantizer, full re-assign)
    // under the old version; cutover is the pointer overwrite
    assert(Similarity.rebuildIvfIndex(spark, full, root, nlist) === 1L)
    val (store1, cents1) = Similarity.resolveIvfIndex(spark, root)
    assert(store1.contains("idx-1"))
    // previous version retained one rebuild back: the v0 reader's
    // dirs still resolve and answer identically
    assert(search(store0, cents0).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet === v0Results)
    // the new version sees the held-out vectors v0 never indexed
    val v1Neighbors = search(store1, cents1).collect().map(_.getLong(1)).toSet
    assert(v1Neighbors.exists(_ % 2 === 1))

    // v2: one more rebuild reclaims v0, retains v1
    assert(Similarity.rebuildIvfIndex(spark, full, root, nlist) === 2L)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(root, "idx-0")))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(root, "idx-1")))
    c.unpersist()
    ()
  }
}

case class VecCdc(vec_id: Long, embedding: Seq[Double], op: String)
