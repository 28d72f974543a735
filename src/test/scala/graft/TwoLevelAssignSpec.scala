package graft

import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity
import graft.functions.VectorFunctions

/** The r16 verdict #1 follow-through, pinned with receipts. Two
  * sub-linear coarse-assignment rails were BUILT and MEASURED this
  * round: the FAISS-style top-k-groups heuristic regressed IVF
  * recall at 2M (1.0000 → 0.9594 — KMeans cells tile a continuum,
  * boundary vectors are common even on clustered corpora), and the
  * exact ball-pruned two-level scan kept here LOST to the flat
  * codegen argmin on wall clock (IvfBuildPhaseProbe at dim 64: flat
  * 11.4/39.2 s vs two-level 15.1/96.1 s at nlist 2048/8192 —
  * high-dim distance concentration leaves nothing to prune), so
  * [[Similarity.assignClusters]] routes FLAT at every nlist and the
  * exact two-level kernel stays as the measured-and-rejected
  * alternative (it bites at low dim). Pins, in order: the group
  * structure's invariants (ball radii cover every member — the
  * exactness bound), EXACT parity with the flat argmin on a
  * clustered corpus AND on an adversarial structureless corpus (the
  * bound's worst case — parity must hold even where pruning saves
  * nothing), eval ≡ codegen, the router's flat pin at 256 AND 2048
  * centroids, and the planted-near-dup recall gate through a store
  * whose quantizer trains on the scalable Lloyd's rail
  * ([[Similarity.lloydCentroids]], nlist > 256).
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
    // ball radii: one per group, each covering its farthest member —
    // the exactness bound the pruned scan relies on
    assert(g.gR.length === g.nGroups)
    val byId = cents.toMap
    (0 until g.nGroups).foreach { k =>
      var m = g.gOff(k)
      while (m < g.gOff(k + 1)) {
        val c = g.gIdx(m)
        val d = math.sqrt(byId(c).zipWithIndex
          .map { case (x, j) => val t = x - g.gCents(k * 8 + j); t * t }.sum)
        assert(d <= g.gR(k) + 1e-9,
          s"member $c of group $k at $d exceeds radius ${g.gR(k)}")
        m += 1
      }
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
    val nc = 300
    val cents = separated(nc, dim)
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 3000L).map { i =>
      val c = cents((i % nc).toInt)._2
      (i, c.map(_ + rnd.nextDouble() * 0.5 - 0.25))
    }.toDF("vec_id", "v")

    val two = Similarity.assignClustersTwoLevel(vecs, cents)
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
      val interp = Similarity.assignClustersTwoLevel(vecs, cents)
        .select("vec_id", "cluster").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(interp === two)
    } finally {
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
  }

  test("adversarial structureless corpus: still EXACT parity (pruning's worst case)") {
    import spark.implicits._
    val dim = 16
    val nc = 512
    val rnd = new scala.util.Random(29)
    // gaussian-on-gaussian is the WORST case for the ball bound: with
    // no cluster structure the group means collapse toward the origin
    // and the radii stay wide, so pruning saves little — the scan
    // must degrade to "flat plus group overhead" while the RESULT
    // stays the exact argmin. (The abandoned top-2-groups heuristic
    // agreed with flat on only 54% of this corpus — the regression
    // this test exists to keep dead.)
    val cents = (0 until nc).map(i => (i, Seq.fill(dim)(rnd.nextGaussian())))
    val vecs = (0L until 4000L).map(i => (i, Seq.fill(dim)(rnd.nextGaussian())))
      .toDF("vec_id", "v")
    val two = Similarity.assignClustersTwoLevel(vecs, cents)
      .select("vec_id", "cluster").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val flatCol = GraftShims.column(VectorFunctions.NearestClusters(
      GraftShims.expression(col("v")),
      cents.flatMap(_._2).toArray,
      cents.map(_._2.map(x => x * x).sum).toArray,
      cents.map(_._1).toArray, dim, 1))
    val flat = vecs.withColumn("cluster", element_at(flatCol, 1))
      .select("vec_id", "cluster").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(two === flat, "structureless corpus: the pruned scan must still be exact")
  }

  test("routing: assignClusters pins the flat exact argmin at every nlist (measured receipt)") {
    import spark.implicits._
    val dim = 4
    val vecs = (0L until 8L).map(i => (i, Seq.fill(dim)(i.toDouble))).toDF("vec_id", "v")
    def planOf(nc: Int): String = {
      val cents = separated(nc, dim)
      Similarity.assignClusters(vecs, cents).queryExecution.analyzed.toString
    }
    // the r17 probe receipt pinned the router flat at EVERY nlist
    // (TwoLevelMinNlist's scaladoc): exact ball pruning loses at high
    // dim, and the sub-linear heuristic costs recall. The two-level
    // kernel stays reachable only through assignClustersTwoLevel.
    Seq(256, 2048).foreach { nc =>
      val plan = planOf(nc)
      assert(plan.contains("graft_nearest_clusters") && !plan.contains("graft_nearest_cluster_2l"),
        s"nlist $nc must stay on the flat exact argmin")
    }
    val direct = Similarity.assignClustersTwoLevel(vecs, separated(300, dim))
      .queryExecution.analyzed.toString
    assert(direct.contains("graft_nearest_cluster_2l"),
      "the explicit two-level rail must still build the pruned-scan plan")
  }

  test("end-to-end: store whose quantizer trains on the scalable Lloyd's rail surfaces planted near-dups") {
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
