package graft

import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity
import graft.functions.VectorFunctions

/** The FAISS-IMI-style two-level coarse assignment (r16 verdict #1:
  * the flat O(n·nlist) argmin was the derived build's dominant term
  * once nlist scale-derives past ~2k). Pins, in order: the group
  * structure's invariants, EXACT parity with the flat argmin on a
  * clustered corpus (the IVF regime — vectors near their centroids),
  * a measured parity floor on an adversarial UNclustered corpus
  * (boundary error is the two-level trade; top-2 groups bound it),
  * the routing threshold (flat ≤ 256 centroids — bit-parity with
  * every pre-r17 artifact; test SFs never leave that path), and the
  * planted-near-dup recall gate through a store seeded entirely on
  * the two-level path.
  */
class TwoLevelAssignSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** nc well-separated centroids: seeded gaussians scaled 50 — at
    * dim ≥ 4 pairwise distances are O(100) against the O(1)
    * intra-cluster spreads the tests plant, so the nearest centroid
    * is unambiguous for every planted vector.
    */
  private def separated(nc: Int, dim: Int, seed: Long = 3L): Seq[(Int, Seq[Double])] = {
    val rnd = new scala.util.Random(seed)
    (0 until nc).map(i => (i, Seq.fill(dim)(rnd.nextGaussian() * 50.0)))
  }

  test("groupCentroids: CSR invariants, determinism, ~sqrt group count, empty-group compaction") {
    val rnd = new scala.util.Random(13)
    val cents = (0 until 512).map(i => (i, Seq.fill(8)(rnd.nextGaussian())))
    val g = Similarity.groupCentroids(cents)
    // CSR shape: offsets monotone, spanning, members a permutation
    assert(g.gOff.head === 0 && g.gOff.last === 512)
    assert(g.gOff.sliding(2).forall(w => w(1) > w(0)), "every live group is non-empty")
    assert(g.gIdx.sorted.toSeq === (0 until 512))
    assert(g.nGroups <= 23 && g.nGroups >= 2) // ceil(sqrt(512)) = 23
    assert(g.gC2.length === g.nGroups && g.gCents.length === g.nGroups * 8)
    g.gC2.zipWithIndex.foreach { case (c2, k) =>
      val s = (0 until 8).map(j => g.gCents(k * 8 + j)).map(x => x * x).sum
      assert(math.abs(c2 - s) < 1e-9)
    }
    // pure function of the centroid set: same input → same arrays,
    // and input ORDER is immaterial (callers pass artifact reads in
    // any order; the grouping sorts by id first)
    val g2 = Similarity.groupCentroids(rnd.shuffle(cents))
    assert(g.gCents.toSeq === g2.gCents.toSeq && g.gOff.toSeq === g2.gOff.toSeq &&
      g.gIdx.toSeq === g2.gIdx.toSeq)
    // memo returns the identical structure (content-hash key)
    val gm1 = Similarity.coarseGroupsFor(cents)
    val gm2 = Similarity.coarseGroupsFor(cents)
    assert(gm1 eq gm2, "second lookup is the memo hit")
    assert(gm1.gIdx.toSeq === g.gIdx.toSeq)
  }

  test("two-level ≡ flat argmin exactly on a clustered corpus (the IVF regime), eval ≡ codegen") {
    import spark.implicits._
    val dim = 6
    val nc = 300 // > TwoLevelMinNlist - 1: assignClusters takes the two-level path
    val cents = separated(nc, dim)
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 3000L).map { i =>
      val c = cents((i % nc).toInt)._2
      (i, c.map(_ + rnd.nextDouble() * 0.5 - 0.25))
    }.toDF("vec_id", "v")

    val two = Similarity.assignClusters(vecs, cents)
      .select("vec_id", "cluster").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // flat oracle: the exact argmin expression, same centroid set
    val flatCol = GraftShims.column(VectorFunctions.NearestClusters(
      GraftShims.expression(col("v")),
      cents.flatMap(_._2).toArray,
      cents.map(_._2.map(x => x * x).sum).toArray,
      cents.map(_._1).toArray, dim, 1))
    val flat = vecs.withColumn("cluster", element_at(flatCol, 1))
      .select("vec_id", "cluster").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(two === flat, "separated clusters: two-level must be exact")
    // the corpus really is the clustered regime: every vector landed
    // on the centroid it was planted around
    assert(two.forall { case (id, cl) => cl == (id % nc).toInt })

    // interpreted eval ≡ codegen (the df path is whole-stage codegen;
    // force the interpreted projection for the same expression)
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interp = Similarity.assignClusters(vecs, cents)
        .select("vec_id", "cluster").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(interp === two)
    } finally {
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
  }

  test("adversarial unclustered corpus: measured parity floor, mis-assignments are near-ties") {
    import spark.implicits._
    val dim = 16
    val nc = 512
    val rnd = new scala.util.Random(29)
    val cents = (0 until nc).map(i => (i, Seq.fill(dim)(rnd.nextGaussian())))
    val vecs = (0L until 4000L).map(i => (i, Seq.fill(dim)(rnd.nextGaussian())))
      .toDF("vec_id", "v")
    val two = Similarity.assignClusters(vecs, cents)
      .select("vec_id", "cluster").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val flatCol = GraftShims.column(VectorFunctions.NearestClusters(
      GraftShims.expression(col("v")),
      cents.flatMap(_._2).toArray,
      cents.map(_._2.map(x => x * x).sum).toArray,
      cents.map(_._1).toArray, dim, 1))
    val flat = vecs.withColumn("cluster", element_at(flatCol, 1))
      .select("vec_id", "cluster").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val agree = two.count { case (id, cl) => flat(id) == cl }
    // gaussian-on-gaussian is the WORST case for ANY coarse group
    // pass: with no cluster structure every group mean collapses
    // toward the origin, so the level-1 ranking carries little
    // signal — the regime where FAISS IMI is documented to degrade
    // too. Measured 0.541 at this fixed seed (deterministic);
    // floored at 0.5. The contract claim lives in the CLUSTERED
    // test above (exact parity) — real embedding corpora cluster,
    // and the assert below pins that even here a mis-assignment is
    // a near-tie, never a blunder.
    assert(agree.toDouble / two.size >= 0.5,
      s"parity ${agree.toDouble / two.size} below the adversarial floor")
    // and where the two disagree, the two-level pick is a near-tie,
    // not a blunder:
    val cmap = cents.toMap
    val vs = vecs.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    def d2(v: Seq[Double], c: Seq[Double]): Double =
      v.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum
    val ratios = two.toSeq.collect {
      case (id, cl) if flat(id) != cl =>
        d2(vs(id), cmap(cl)) / d2(vs(id), cmap(flat(id)))
    }
    // mis-assignments land on a CLOSE centroid, never an arbitrary
    // one: per-vector within 3× of the true min squared distance
    // (worst measured 2.67 at this seed — ~1.6× in DISTANCE), within 1.24× on average (measured 1.233)
    assert(ratios.forall(_ <= 3.0), s"worst mis-assignment ratio ${ratios.max}")
    assert(ratios.sum / ratios.size <= 1.30,
      s"mean mis-assignment ratio ${ratios.sum / ratios.size}")
  }

  test("routing: flat at 256 centroids (bit-parity regime), two-level at 257") {
    import spark.implicits._
    val dim = 4
    val vecs = (0L until 8L).map(i => (i, Seq.fill(dim)(i.toDouble))).toDF("vec_id", "v")
    def planOf(nc: Int): String = {
      val cents = separated(nc, dim)
      Similarity.assignClusters(vecs, cents).queryExecution.analyzed.toString
    }
    val at256 = planOf(256)
    assert(at256.contains("graft_nearest_clusters") && !at256.contains("graft_nearest_cluster_2l"),
      "≤256 centroids must stay on the flat exact argmin")
    val at257 = planOf(257)
    assert(at257.contains("graft_nearest_cluster_2l"),
      ">256 centroids must take the two-level path")
  }

  test("end-to-end: store seeded on the two-level path surfaces planted near-dups (recall gate)") {
    import spark.implicits._
    val dim = 6
    val nc = 300
    val cents = separated(nc, dim)
    val rnd = new scala.util.Random(41)
    // corpus: 20 vectors per cluster with ±5 spread — wide enough
    // that same-cluster cosines round BELOW 1.0000 at the search's 4
    // decimals, so the planted copy (cosine exactly 1) is the unique
    // rank-1, not a vec_id tie-break among rounded ties. Queries are
    // exact copies scaled 1.0001 of the first member of every 30th
    // cluster (same nearest centroid by construction).
    val base = (0L until 6000L).map { i =>
      val c = cents((i % nc).toInt)._2
      (i, c.map(_ + rnd.nextDouble() * 10.0 - 5.0))
    }
    val corpus = Similarity.withVecNorm(spark, base.toDF("vec_id", "v"))
    val dir = java.nio.file.Files.createTempDirectory("twolevel_ivf").toString
    Similarity.trainQuantizer(spark, corpus, s"$dir/cents", nlist = nc, n = 6000L)
    val loaded = Similarity.loadCentroids(spark, s"$dir/cents")
    assert(loaded.size === nc)
    Similarity.seedIvfStore(spark, corpus, s"$dir/store", loaded, nlist = nc)
    // ids 0..299 are each cluster's first member; take every 30th
    val planted = base.filter { case (id, _) => id < nc && id % 30 == 0 }
    val queries = planted.map { case (id, v) =>
      (id + 1000000L, v.map(_ * 1.0001))
    }.toDF("vec_id", "v")
    val q = Similarity.withVecNorm(spark, queries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("norm").as("qnorm"))
    val hits = Similarity.searchIvfStore(spark, s"$dir/store", loaded, q,
        k = 3, nprobe = 4, nlist = nc)
      .filter(col("rn") === 1)
      .select("query_id", "neighbor_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    planted.foreach { case (id, _) =>
      assert(hits.get(id + 1000000L).contains(id),
        s"planted near-dup $id must be the rank-1 hit of its scaled copy")
    }
  }
}
