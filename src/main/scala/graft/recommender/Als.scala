package graft.recommender

import graft.Tables
import org.apache.spark.ml.evaluation.RegressionEvaluator
import org.apache.spark.ml.recommendation.{ALS, ALSModel}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Matrix-factorization recommender — the Spark-native re-expression of
  * the reference's scikit-surprise SVD pipeline
  * (/root/reference/web/app/recommender/estimator.py:104
  * `recompute_recommendations`, /root/reference/prototype/trainer.py).
  *
  * Funk SVD and ALS fit the same low-rank user×item model; ALS is the
  * factorizer that actually distributes (block-partitioned normal
  * equations, no driver-side matrix), which is why MLlib ships it and
  * not SGD-SVD. Same capability, Spark-first execution:
  *
  *  - estimator.load_dataset  → [[graft.Tables.interactions]]
  *  - SVD.fit                 → ALS.fit (rank/maxIter/regParam ↔
  *                              n_factors/n_epochs/reg_all)
  *  - build_anti_testset + test + get_top_n
  *                            → recommendForAllUsers (blocked top-k via
  *                              BLAS gemm) + distributed anti-join of
  *                              seen pairs (the anti-testset filter)
  *  - GridSearchCV(rmse/mae)  → train/validation sweep with
  *                              RegressionEvaluator
  *
  * The reference materializes the full anti-testset (all unseen
  * user×item pairs) in memory — O(|U|·|I|) on the driver, the exact
  * thing that cannot survive 100 TB. Here the candidate set never
  * materializes: recommendForAllUsers scores in factor-block batches
  * and keeps only per-user top-k heaps.
  */
object Als {

  /** Training input after the id seam: `train` carries int32
    * (user, item, rating); the maps are present iff the raw keys were
    * re-indexed and are needed to translate scored output back.
    * `source` is the cached raw frame backing a re-index — call
    * [[release]] once `train` is materialized (post-fit) to drop it.
    */
  private[graft] case class AlsInput(train: DataFrame,
      userMap: Option[DataFrame], itemMap: Option[DataFrame],
      source: Option[DataFrame] = None) {
    def release(): Unit = source.foreach { df => df.unpersist(); () }
  }

  /** ALS requires 32-bit ids. Keys already in int range pass through
    * with a bare cast (testdata, MovieLens); keys outside it — the
    * 100 TB norm, where user/item ids are 64-bit snowflakes or hashes —
    * get a DENSE RE-INDEX: each distinct key maps to its RANK in the
    * sorted key order (distributed sort + `zipWithIndex`, no
    * single-partition window), the training set joins through the
    * maps, and scored output joins back to the original ids. Rank is
    * well-defined regardless of how the sort's range partitioner
    * places boundaries, so the mapping is deterministic AND invariant
    * under order-preserving key translation — AlsReindexSpec pins that
    * a corpus with ids shifted by 2^33 trains to byte-identical recs.
    * The re-indexed train is canonicalized (hash-repartition on user,
    * sort within partitions) so ALS sees identical block contents in
    * identical order either way. ALS's remaining hard limit is the
    * DISTINCT entity count per side (rank must fit int32) — a bound on
    * population, not key magnitude.
    */
  private[graft] def keyedTrainingSet(raw: DataFrame, force: Boolean = false,
      boundsProbe: Option[DataFrame] = None): AlsInput = {
    val direct = AlsInput(raw.select(
      col("user_id").cast("int").as("user"),
      col("item_id").cast("int").as("item"),
      col("rating").cast("float").as("rating")), None, None)
    if (!force) {
      // `boundsProbe`, when given, is a (user_id, item_id) frame whose
      // key bounds CONTAIN raw's (caller's contract) but is cheaper to
      // scan — the fits decision only needs a conservative superset.
      // For the interactions-derived raws that is the base tables' key
      // columns: the upsert window never widens a key range, so the
      // probe skips the orders⋈lineitem + window build the bounds agg
      // otherwise re-derives and discards (r17, guide §8 "use what you
      // know": measured 2.2 s → ~0.15 s per ALS query at sf0.1).
      // Wider-than-actual probe bounds only ever flip the decision
      // toward the re-index path, which is correct for any key space.
      val b = boundsProbe.getOrElse(raw).agg(
        min(col("user_id")), max(col("user_id")),
        min(col("item_id")), max(col("item_id"))).head()
      val fits = (b.isNullAt(0) && b.isNullAt(2)) ||
        ((b.isNullAt(0) ||
          (b.getLong(0) >= Int.MinValue && b.getLong(1) <= Int.MaxValue)) &&
         (b.isNullAt(2) ||
          (b.getLong(2) >= Int.MinValue && b.getLong(3) <= Int.MaxValue)))
      if (fits) return direct
    }
    // one source scan, not four: the two zipWithIndex rank builds (each
    // eager — the size job runs at construction) and the train join all
    // re-read `raw`, whose upstream lineage (interaction joins + dedup
    // windows) is expensive to recompute. The first rank job populates
    // the cache; everything after reads it. Released by the caller
    // after training materializes `train` (AlsInput.release).
    val src = raw.cache()
    val users = denseIndex(src.select(col("user_id")), "user_id", "user")
    val items = denseIndex(src.select(col("item_id")), "item_id", "item")
    val train = src
      .join(users, Seq("user_id")).join(items, Seq("item_id"))
      .select(col("user"), col("item"), col("rating").cast("float").as("rating"))
      .repartition(col("user"))
      .sortWithinPartitions(col("user"), col("item"), col("rating"))
    AlsInput(train, Some(users), Some(items), Some(src))
  }

  /** Dense ids for one key side: distinct keys → rank in sorted order.
    * `zipWithIndex` offsets each sorted partition by the sizes before
    * it — one extra count job, zero data through the driver.
    */
  private def denseIndex(keys: DataFrame, keyCol: String, idxCol: String): DataFrame = {
    import org.apache.spark.sql.types._
    val spark = keys.sparkSession
    val rows = keys.select(col(keyCol).cast("long")).distinct().sort(keyCol)
      .rdd.zipWithIndex().map { case (r, i) =>
        org.apache.spark.sql.Row(r.getLong(0), i.toInt)
      }
    spark.createDataFrame(rows, StructType(Seq(
      StructField(keyCol, LongType, nullable = false),
      StructField(idxCol, IntegerType, nullable = false))))
  }

  private def rawSet(spark: SparkSession, sfDir: String): DataFrame =
    Tables.interactions(spark, sfDir)
      .select(col("user_id"), col("item_id"), col("rating").cast("float").as("rating"))

  /** Conservative key-bounds probe for every interactions-derived raw
    * set: user ids ⊆ orders.o_custkey and item ids ⊆ lineitem.l_partkey
    * (the interactions join projects them; the upsert window and any
    * downstream filter only SHRINK the key set), so min/max over the
    * two base key columns bound the raw set's keys from two plain
    * column scans — no join, no window (see keyedTrainingSet's
    * boundsProbe contract).
    */
  private def rawBoundsProbe(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .select(col("o_custkey").as("user_id"),
        lit(null).cast("long").as("item_id"))
      .unionByName(Tables.lineitem(spark, sfDir)
        .select(lit(null).cast("long").as("user_id"),
          col("l_partkey").as("item_id")))

  private def trainingSet(spark: SparkSession, sfDir: String): DataFrame =
    keyedTrainingSet(rawSet(spark, sfDir),
      boundsProbe = Some(rawBoundsProbe(spark, sfDir))).train

  def fit(train: DataFrame, rank: Int = 8, maxIter: Int = 10, regParam: Double = 0.1,
          implicitPrefs: Boolean = false, alpha: Double = 1.0, seed: Long = 42L): ALSModel = {
    // MLlib ALS only engages its iteration checkpointing when the
    // context has a checkpoint dir — without one, every iteration's
    // factor RDD chains to the previous and the whole depth rides
    // into downstream task binaries (a reference-parity 15-iter fit
    // has blown the serializer's stack after a long same-JVM session).
    // Respect a caller-configured dir; otherwise point at a temp dir.
    val sc = train.sparkSession.sparkContext
    if (sc.getCheckpointDir.isEmpty)
      sc.setCheckpointDir(
        java.nio.file.Files.createTempDirectory("graft-als-ckpt").toString)
    new ALS()
      .setUserCol("user").setItemCol("item").setRatingCol("rating")
      .setRank(rank).setMaxIter(maxIter).setRegParam(regParam)
      .setImplicitPrefs(implicitPrefs).setAlpha(alpha)
      .setSeed(seed)
      .setColdStartStrategy("drop")
      // truncate lineage every 5 iterations (default 10 leaves a
      // 10-deep chain at the reference cell's 15 iterations)
      .setCheckpointInterval(5)
      // default block count: at this data size more blocks only add
      // shuffle overhead (A/B-tested 10/16/32 at sf0.1); on a real
      // cluster set user/item blocks ≈ total cores
      .fit(train)
  }

  /** Per-user top-N over UNSEEN items (the reference's anti-testset
    * semantics): over-fetch n+buffer candidates from the blocked top-k,
    * anti-join the seen pairs, re-rank, keep n.
    *
    * The buffer is MEASURED, not guessed: buffer = max per-user seen
    * count (one cheap agg over the cached training set), which is the
    * smallest value guaranteeing every user still has ≥ n unseen
    * candidates after the anti-join. recommendForAllUsers scores every
    * item per user regardless of k (k only sizes the top-k heap and
    * output), so the win is in the exploded output volume: at sf0.1
    * this is k = 125 vs the previous hardcoded 130, and it stays
    * minimal as data grows instead of silently under- or
    * over-fetching. `bufferCap` bounds a pathological power user (at
    * 100 TB, profile truncation — the ItemCF degree-cap policy —
    * applies before this ever binds).
    */
  def topN(spark: SparkSession, sfDir: String, n: Int = 20, bufferCap: Int = 1000): DataFrame =
    topNOn(rawSet(spark, sfDir), n, bufferCap,
      boundsProbe = Some(rawBoundsProbe(spark, sfDir)))

  /** [[topN]] over an explicit (user_id, item_id, rating) frame —
    * the id seam applies here: out-of-int32 keys re-index densely and
    * the output joins back to the original ids (`force` exercises the
    * re-index path on in-range keys; AlsReindexSpec).
    */
  private[graft] def topNOn(raw: DataFrame, n: Int, bufferCap: Int,
                            force: Boolean = false,
                            boundsProbe: Option[DataFrame] = None): DataFrame = {
    val keyed = keyedTrainingSet(raw, force, boundsProbe)
    val train = keyed.train.cache()
    val model = fit(train)
    keyed.release()
    val out = topNUnseen(train, model, n, bufferCap, keyed)
    train.unpersist()
    out
  }

  /** Shared top-N-over-unseen tail of [[topN]] / [[implicitTopN]]:
    * measured over-fetch, distributed anti-join of seen pairs,
    * re-rank, keep n, then translate ids back through the re-index
    * maps when present. `train` must be cached (the buffer agg and
    * the seen anti-join both read it).
    */
  private def topNUnseen(train: DataFrame, model: ALSModel, n: Int, bufferCap: Int,
                         keyed: AlsInput): DataFrame = {
    val maxSeen = train.groupBy(col("user")).count()
      .agg(max(col("count"))).head().getLong(0).toInt
    val buffer = math.min(maxSeen, bufferCap)
    val recs = model.recommendForAllUsers(n + buffer)
      .select(col("user"), explode(col("recommendations")).as("rec"))
      .select(col("user"), col("rec.item").as("item"), col("rec.rating").as("score"))
    val seen = train.select(col("user"), col("item")).distinct()
    val unseen = recs.join(seen, Seq("user", "item"), "left_anti")
    val w = Window.partitionBy(col("user"))
      .orderBy(col("score").desc, col("item").asc)
    val ranked = unseen
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= n)
    val mapped = (keyed.userMap, keyed.itemMap) match {
      case (Some(u), Some(i)) =>
        // standard dim joins on the dense int keys; Catalyst/AQE
        // broadcasts the maps when they fit
        ranked.join(u, Seq("user")).join(i, Seq("item"))
      case _ =>
        ranked.withColumn("user_id", col("user").cast("long"))
          .withColumn("item_id", col("item").cast("long"))
    }
    mapped.select(
      col("user_id"), col("item_id"),
      round(col("score").cast("double"), 4).as("score"), col("rn"))
  }

  /** Implicit-feedback ALS — the reference's watched-but-unrated flow
    * (controller.py:150: viewing events become implicit rows in the
    * SAME ratings store, flagged `is_implicit`) trained the way that
    * signal should be: MLlib's built-in Hu–Koren–Volinsky implicit
    * formulation (`implicitPrefs=true`), where every observed
    * interaction is a binary preference and the rating column becomes
    * a CONFIDENCE weight (c = 1 + α·r). Explicit rows carry their
    * star rating as confidence strength; implicit rows a weak
    * constant 1.0 — a view says "observed", a 5-star rating says
    * "observed and loved". Output: per-user top-N over unseen items,
    * same anti-testset semantics as [[topN]] (rows-only; AlsGridSpec
    * pins shape, determinism, and that held-out positives outscore
    * random negatives — the ranking-sanity check the implicit model
    * must pass to be a model at all).
    */
  def implicitTopN(spark: SparkSession, sfDir: String, n: Int = 20,
                   alpha: Double = 10.0, bufferCap: Int = 1000): DataFrame = {
    val keyed = keyedTrainingSet(implicitRawSet(spark, sfDir),
      boundsProbe = Some(rawBoundsProbe(spark, sfDir)))
    val train = keyed.train.cache()
    val model = fit(train, implicitPrefs = true, alpha = alpha)
    keyed.release()
    val out = topNUnseen(train, model, n, bufferCap, keyed)
    train.unpersist()
    out
  }

  // ---------------------------------------------------------------
  // fold-in: new users between retrains, no retrain

  /** Factors for NEW users solved against the FROZEN item factors —
    * the scale answer to the reference's retrain cadence gap: a user
    * who signs up between estimator.py's periodic recomputes gets only
    * the popularity fallback (controller.py:262) until the next full
    * retrain. Fold-in is the standard middle path: with item factors Y
    * frozen, one user's factor is the ridge solution
    * `x_u = (Yᵤᵀ Yᵤ + λ·n_u·I)⁻¹ Yᵤᵀ r_u` over just their rated
    * items — EXACTLY the per-user half of an ALS sweep, with MLlib's
    * own weighted-λ regularization (λ scaled by the user's rating
    * count), so folding in a user the model already trained on
    * reproduces their trained factor to float tolerance
    * (AlsFoldInSpec pins it).
    *
    * Distribution: one shuffle keyed by the NEW users (delta-sized,
    * never the corpus); each group solves a rank×rank system in
    * microseconds. Items the frozen model has never seen contribute
    * nothing (inner join) — a user with zero known items yields no
    * row, which is the honest answer (they are genuinely cold; the
    * popularity fallback still applies).
    *
    * @param ratings (user_id long, item int — the MODEL's item key
    *                space, rating float)
    * @return (user_id, features array&lt;float&gt;)
    */
  private[graft] def foldInFactors(itemFactors: DataFrame, ratings: DataFrame,
      regParam: Double): DataFrame = {
    val spark = itemFactors.sparkSession
    import spark.implicits._
    val joined = ratings
      .join(itemFactors.select(col("id").as("item"), col("features")), Seq("item"))
      .select(col("user_id").cast("long"), col("features"),
        col("rating").cast("float"))
      .as[(Long, Seq[Float], Float)]
    joined.groupByKey(_._1).mapGroups { (u, rows) =>
      var k = -1
      var a: Array[Double] = null
      var b: Array[Double] = null
      var n = 0
      rows.foreach { case (_, y, r) =>
        if (k < 0) { k = y.length; a = new Array[Double](k * k); b = new Array[Double](k) }
        var i = 0
        while (i < k) {
          val yi = y(i).toDouble
          b(i) += r * yi
          var j = 0
          while (j < k) { a(i * k + j) += yi * y(j); j += 1 }
          i += 1
        }
        n += 1
      }
      val lam = regParam * n // MLlib's weighted-λ (scaled by rating count)
      var d = 0
      while (d < k) { a(d * k + d) += lam; d += 1 }
      (u, solveSym(a, b, k).map(_.toFloat).toSeq)
    }.toDF("user_id", "features")
  }

  /** In-place Gaussian elimination with partial pivoting for the
    * rank×rank normal equations (SPD by construction; rank ≤ a few
    * hundred, so a dense direct solve per user is microseconds).
    */
  private def solveSym(a: Array[Double], b: Array[Double], k: Int): Array[Double] = {
    var col0 = 0
    while (col0 < k) {
      var p = col0; var r = col0 + 1
      while (r < k) { if (math.abs(a(r * k + col0)) > math.abs(a(p * k + col0))) p = r; r += 1 }
      if (p != col0) {
        var j = 0
        while (j < k) {
          val t = a(col0 * k + j); a(col0 * k + j) = a(p * k + j); a(p * k + j) = t; j += 1
        }
        val tb = b(col0); b(col0) = b(p); b(p) = tb
      }
      val piv = a(col0 * k + col0)
      r = col0 + 1
      while (r < k) {
        val f = a(r * k + col0) / piv
        if (f != 0.0) {
          var j = col0
          while (j < k) { a(r * k + j) -= f * a(col0 * k + j); j += 1 }
          b(r) -= f * b(col0)
        }
        r += 1
      }
      col0 += 1
    }
    val x = new Array[Double](k)
    var i = k - 1
    while (i >= 0) {
      var s = b(i); var j = i + 1
      while (j < k) { s -= a(i * k + j) * x(j); j += 1 }
      x(i) = s / a(i * k + i)
      i -= 1
    }
    x
  }

  /** Yᵀ·Y over ALL item factors — the k×k Gram matrix the implicit
    * fold-in solve needs (Hu–Koren's trick: the sum over UNOBSERVED
    * items collapses to this one corpus-level term). One distributed
    * treeAggregate; the result is rank² doubles (rank ≤ a few hundred
    * → ≤ a few hundred KB), driver-held and broadcast — never a
    * per-user recomputation.
    */
  private[graft] def gramMatrix(itemFactors: DataFrame): Array[Double] =
    itemFactors.select(col("features")).rdd
      .map(_.getSeq[Float](0))
      .treeAggregate(Array.empty[Double])(
        (acc, y) => {
          val k = y.length
          val a = if (acc.isEmpty) new Array[Double](k * k) else acc
          var i = 0
          while (i < k) {
            val yi = y(i).toDouble
            var j = 0
            while (j < k) { a(i * k + j) += yi * y(j); j += 1 }
            i += 1
          }
          a
        },
        (a, b) =>
          if (a.isEmpty) b
          else if (b.isEmpty) a
          else { var i = 0; while (i < a.length) { a(i) += b(i); i += 1 }; a })

  /** Implicit-model fold-in (Hu–Koren–Volinsky): a new user's factor
    * against FROZEN implicit item factors is
    * `x_u = (YᵀY + Σ_obs αr·y yᵀ + λ·n_u·I)⁻¹ Σ_obs (1+αr)·y`
    * — confidence c = 1 + α·r enters the normal equations only for
    * OBSERVED items; the all-items preference-0 mass is the shared
    * [[gramMatrix]] term. λ matches MLlib's implicit convention
    * (regParam × the user's positive-interaction count), and MLlib's
    * implicit loop also ends on a user update against the final item
    * factors, so — exactly as in the explicit path — folding in a
    * TRAINED user reproduces their trained factor to float tolerance
    * (AlsImplicitFoldInSpec pins it).
    *
    * Same distribution shape as [[foldInFactors]]: one delta-sized
    * shuffle keyed by the new users; item factors never shuffle; each
    * group is a rank×rank direct solve.
    *
    * @param ratings (user_id long, item int — the MODEL's item key
    *                space, rating float = the CONFIDENCE source r > 0)
    */
  private[graft] def implicitFoldInFactors(itemFactors: DataFrame, ratings: DataFrame,
      regParam: Double, alpha: Double): DataFrame = {
    val spark = itemFactors.sparkSession
    import spark.implicits._
    val bcGram = spark.sparkContext.broadcast(gramMatrix(itemFactors))
    val joined = ratings
      .join(itemFactors.select(col("id").as("item"), col("features")), Seq("item"))
      .select(col("user_id").cast("long"), col("features"),
        col("rating").cast("float"))
      .as[(Long, Seq[Float], Float)]
    joined.groupByKey(_._1).mapGroups { (u, rows) =>
      var k = -1
      var a: Array[Double] = null
      var b: Array[Double] = null
      var n = 0
      rows.foreach { case (_, y, r) =>
        if (k < 0) {
          k = y.length
          a = bcGram.value.clone()
          b = new Array[Double](k)
        }
        val c1 = alpha * math.abs(r.toDouble) // c_ui − 1
        var i = 0
        while (i < k) {
          val yi = y(i).toDouble
          b(i) += (1.0 + c1) * yi
          var j = 0
          while (j < k) { a(i * k + j) += c1 * yi * y(j); j += 1 }
          i += 1
        }
        if (r > 0f) n += 1
      }
      val lam = regParam * n // MLlib's implicit weighted-λ (positive count)
      var d = 0
      while (d < k) { a(d * k + d) += lam; d += 1 }
      (u, solveSym(a, b, k).map(_.toFloat).toSeq)
    }.toDF("user_id", "features")
  }

  /** The fold-in SERVING path end-to-end (registered as
    * `als_fold_in`): train on the base population, hold out a slice of
    * users as "signed up since the last retrain", fold their factors
    * in against the frozen item factors, and serve per-user top-N over
    * their unseen items — scores from the same dot product
    * `recommendForAllUsers` computes, ranked by the partial-
    * aggregating top-k heap (≤ n rows per user per map partition
    * shuffle). The fold-in side is broadcast (delta-sized by
    * definition); the item-factor side streams map-side — no shuffle
    * of the item factors at any point, which is the 100 TB shape
    * (items are the big side of a mature recommender). Id seam: items
    * translate through the re-index map when present; fold-in user
    * ids never need translating (they stay original longs — fold-in
    * is per-user independent, no int32 contract).
    */
  def foldInTopN(spark: SparkSession, sfDir: String, n: Int = 20,
                 holdMod: Int = 50, holdVal: Int = 7,
                 rank: Int = 8, regParam: Double = 0.1): DataFrame =
    foldInServe(rawSet(spark, sfDir), n, holdMod, holdVal,
      t => fit(t, rank = rank, regParam = regParam),
      (yf, r) => foldInFactors(yf, r, regParam),
      boundsProbe = Some(rawBoundsProbe(spark, sfDir)))

  /** [[foldInTopN]] for the IMPLICIT model (registered as
    * `als_implicit_fold_in`): the same hold-out serve, with the
    * confidence-weighted raw set, `implicitPrefs` training, and the
    * Hu–Koren fold-in solve ([[implicitFoldInFactors]]) — closing the
    * between-retrains serving gap for BOTH models (estimator.py:104
    * leaves new users to the popularity fallback until the next
    * periodic recompute; controller.py:150's implicit rows deserve
    * the same freshness).
    */
  def implicitFoldInTopN(spark: SparkSession, sfDir: String, n: Int = 20,
                         holdMod: Int = 50, holdVal: Int = 7,
                         rank: Int = 8, regParam: Double = 0.1,
                         alpha: Double = 10.0): DataFrame =
    foldInServe(implicitRawSet(spark, sfDir), n, holdMod, holdVal,
      t => fit(t, rank = rank, regParam = regParam, implicitPrefs = true, alpha = alpha),
      (yf, r) => implicitFoldInFactors(yf, r, regParam, alpha),
      boundsProbe = Some(rawBoundsProbe(spark, sfDir)))

  /** Shared hold-out → train → fold-in → serve pipeline of
    * [[foldInTopN]] / [[implicitFoldInTopN]]; `fitFn` and `foldFn`
    * carry the model-specific halves.
    */
  private def foldInServe(rawIn: DataFrame, n: Int, holdMod: Int, holdVal: Int,
                          fitFn: DataFrame => ALSModel,
                          foldFn: (DataFrame, DataFrame) => DataFrame,
                          boundsProbe: Option[DataFrame] = None): DataFrame = {
    val spark = rawIn.sparkSession
    val raw = rawIn.cache()
    val newSide = raw.filter(col("user_id") % holdMod === holdVal)
    val baseSide = raw.filter(col("user_id") % holdMod =!= holdVal)
    // the hold-out filter only shrinks the key set, so the caller's
    // probe bounds still contain baseSide's
    val keyed = keyedTrainingSet(baseSide, boundsProbe = boundsProbe)
    val train = keyed.train.cache()
    val model = fitFn(train)
    keyed.release()
    train.unpersist() // fit materialized it; the serving path needs only factors
    val newKeyed = keyed.itemMap match {
      case Some(im) => newSide.join(im, Seq("item_id"))
        .select(col("user_id"), col("item"), col("rating"))
      case None => newSide
        .select(col("user_id"), col("item_id").cast("int").as("item"), col("rating"))
    }
    val folded = foldFn(model.itemFactors, newKeyed)
    graft.functions.VectorFunctions.register(spark)
    graft.functions.TopKAgg.register(spark)
    val scored = model.itemFactors
      .select(col("id").as("item"), col("features").as("yf"))
      .join(broadcast(folded), lit(true))
      .withColumn("score",
        expr("graft_dot(cast(features as array<double>), cast(yf as array<double>))"))
    val seen = newKeyed.select(col("user_id"), col("item")).distinct()
    val top = scored.join(seen, Seq("user_id", "item"), "left_anti")
      .groupBy(col("user_id"))
      .agg(expr(s"graft_topk(score, cast(item as bigint), $n)").as("topk"))
      .select(col("user_id"), posexplode(col("topk")))
      .select(col("user_id"), col("col.id").cast("int").as("item"),
        col("col.score").as("score"), (col("pos") + 1).as("rn"))
    val out = keyed.itemMap match {
      case Some(im) => top.join(im, Seq("item"))
      case None => top.withColumn("item_id", col("item").cast("long"))
    }
    raw.unpersist()
    out.select(col("user_id"), col("item_id"),
      round(col("score").cast("double"), 4).as("score"), col("rn"))
  }

  /** Confidence-weighted raw rows for the implicit model — same id
    * seam as the explicit path ([[keyedTrainingSet]]).
    */
  private def implicitRawSet(spark: SparkSession, sfDir: String): DataFrame =
    Tables.interactions(spark, sfDir)
      .select(
        col("user_id"), col("item_id"),
        when(col("is_implicit"), lit(1.0))
          .otherwise(col("rating")).cast("float").as("rating"))

  /** Int-cast implicit training set (kept for spec use; the query
    * path routes through [[implicitRawSet]] + the id seam).
    */
  private[graft] def implicitTrainingSet(spark: SparkSession, sfDir: String): DataFrame =
    keyedTrainingSet(implicitRawSet(spark, sfDir),
      boundsProbe = Some(rawBoundsProbe(spark, sfDir))).train

  /** RMSE + MAE on a deterministic 80/20 split — the reference's
    * evaluation measures (trainer.py:57 GridSearchCV measures=['rmse','mae']).
    */
  def evaluate(spark: SparkSession, sfDir: String, rank: Int = 8, maxIter: Int = 10,
               regParam: Double = 0.1): DataFrame = {
    import spark.implicits._
    val all = trainingSet(spark, sfDir)
      .withColumn("fold", pmod(hash(col("user"), col("item")), lit(5)))
    val train = all.filter(col("fold") =!= 0).drop("fold").cache()
    val test = all.filter(col("fold") === 0).drop("fold").cache()
    val model = fit(train, rank, maxIter, regParam)
    val pred = model.transform(test).cache()
    val rmse = new RegressionEvaluator().setMetricName("rmse")
      .setLabelCol("rating").setPredictionCol("prediction").evaluate(pred)
    val mae = new RegressionEvaluator().setMetricName("mae")
      .setLabelCol("rating").setPredictionCol("prediction").evaluate(pred)
    val nTest = pred.count()
    Seq((rank, maxIter, regParam, math.rint(rmse * 10000) / 10000,
         math.rint(mae * 10000) / 10000, nTest))
      .toDF("rank", "max_iter", "reg_param", "rmse", "mae", "n_test")
  }

  /** K-fold cross-validation (the reference's 3-fold CV,
    * trainer.py:45 `find_best_params(cv=3)`): deterministic hash
    * folds, one distributed fit per fold, mean±range RMSE/MAE.
    */
  def crossValidate(spark: SparkSession, sfDir: String, folds: Int = 3,
                    rank: Int = 8, maxIter: Int = 5, regParam: Double = 0.1): DataFrame = {
    import spark.implicits._
    val all = trainingSet(spark, sfDir)
      .withColumn("fold", pmod(hash(col("user"), col("item")), lit(folds)))
      .cache()
    val evalRmse = new RegressionEvaluator().setMetricName("rmse")
      .setLabelCol("rating").setPredictionCol("prediction")
    val evalMae = new RegressionEvaluator().setMetricName("mae")
      .setLabelCol("rating").setPredictionCol("prediction")
    val rows = (0 until folds).map { f =>
      val model = fit(all.filter(col("fold") =!= f).drop("fold"), rank, maxIter, regParam)
      val pred = model.transform(all.filter(col("fold") === f).drop("fold")).cache()
      val r = (f, math.rint(evalRmse.evaluate(pred) * 10000) / 10000,
               math.rint(evalMae.evaluate(pred) * 10000) / 10000, pred.count())
      pred.unpersist()
      r
    }
    all.unpersist()
    rows.toDF("fold", "rmse", "mae", "n_test")
  }

  /** Joint grid × k-fold CV selection — the reference's exact
    * protocol (trainer.py:45-60 `find_best_params`: GridSearchCV with
    * cv=3 runs 3-fold CV PER GRID CELL and picks best-by-MEAN-RMSE,
    * not a single train/validation sweep). The grid covers all three
    * reference dimensions with an ALS analog — `n_factors` ↔ rank,
    * `reg_all` ↔ regParam, `n_epochs` ↔ maxIter (`lr_all` has no
    * analog: ALS solves normal equations, no learning rate). Output:
    * one row per (cell, fold) with its RMSE/MAE, plus one winner row
    * (fold = -1) carrying the winning cell's mean metrics —
    * |grid|·folds + 1 rows.
    *
    * Scale shape: folds are deterministic hash buckets (no
    * materialized splits); each of the |grid|·folds fits is itself a
    * distributed ALS job, so the sweep parallelizes across the
    * cluster one fit at a time — the same shape MLlib's own
    * CrossValidator schedules. Grid kept small so the verify gate
    * stays fast.
    */
  def gridSearch(spark: SparkSession, sfDir: String,
                 ranks: Seq[Int] = Seq(4, 8), regs: Seq[Double] = Seq(0.05, 0.1),
                 iters: Seq[Int] = Seq(5, 10), folds: Int = 3): DataFrame = {
    import spark.implicits._
    val all = trainingSet(spark, sfDir)
      .withColumn("fold", pmod(hash(col("user"), col("item")), lit(folds)))
      .cache()
    val evalRmse = new RegressionEvaluator().setMetricName("rmse")
      .setLabelCol("rating").setPredictionCol("prediction")
    val evalMae = new RegressionEvaluator().setMetricName("mae")
      .setLabelCol("rating").setPredictionCol("prediction")
    val cells = for (r <- ranks; reg <- regs; it <- iters) yield (r, reg, it)
    val perFold = cells.flatMap { case (r, reg, it) =>
      (0 until folds).map { f =>
        val m = fit(all.filter(col("fold") =!= f).drop("fold"), rank = r, maxIter = it, regParam = reg)
        val pred = m.transform(all.filter(col("fold") === f).drop("fold")).cache()
        val row = (r, reg, it, f.toLong,
          math.rint(evalRmse.evaluate(pred) * 10000) / 10000,
          math.rint(evalMae.evaluate(pred) * 10000) / 10000)
        pred.unpersist()
        row
      }
    }
    all.unpersist()
    // winner = min mean RMSE across folds (ties → smaller rank, then
    // smaller reg, then fewer iters — deterministic selection),
    // surfaced as fold = -1
    val means = perFold.groupBy(r => (r._1, r._2, r._3)).map { case ((r, reg, it), rows) =>
      (r, reg, it,
        math.rint(rows.map(_._5).sum / rows.size * 10000) / 10000,
        math.rint(rows.map(_._6).sum / rows.size * 10000) / 10000)
    }.toSeq
    val best = means.minBy(m => (m._4, m._1, m._2, m._3))
    val winner = (best._1, best._2, best._3, -1L, best._4, best._5)
    (perFold :+ winner)
      .toDF("rank", "reg_param", "max_iter", "fold", "rmse", "mae")
      .orderBy(col("fold").asc, col("rank").asc, col("reg_param").asc, col("max_iter").asc)
  }
}
