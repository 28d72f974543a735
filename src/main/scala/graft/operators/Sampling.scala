package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for training-data pipelines.
  *
  * `df.sample()` is seed-dependent on partitioning and engine-specific;
  * a reproducible corpus needs CONTENT-derived sampling: the decision
  * for a row must be a pure function of its key, identical across
  * engines, re-runs, and cluster layouts. We hash with md5 (available
  * and bit-identical in Spark and DuckDB) and compare hex prefixes —
  * a lexicographic threshold on the first two hex chars selects
  * thr/256 of the keyspace.
  */
object Sampling {

  /** True for ≈ thr/256 of keys, deterministically. */
  private def hashGate(key: Column, thr: Int): Column =
    substring(md5(key.cast("string")), 1, 2) < lit(f"$thr%02x")

  /** Reproducible ~10% document sample with per-language counts —
    * the sanity aggregate a sampling stage reports.
    */
  def sampleDocs(spark: SparkSession, sfDir: String, thr256: Int = 26): DataFrame =
    Tables.documents(spark, sfDir)
      .filter(hashGate(col("doc_id"), thr256))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), round(avg(col("n_chars")), 4).as("avg_chars"))

  /** Training-mix weighting: keep a per-SOURCE fraction of documents,
    * deterministically. This is the "mix weights" step of corpus
    * assembly (2× web, 0.5× forum, …) — upsampling is a separate
    * repeat-explode; here the thinning side. Entirely map-side: the
    * per-row decision is hashGate(doc_id) against the row's source
    * threshold, no shuffle at all, so at 100 TB it rides the ingest
    * scan. Unknown sources default to keep-nothing (explicit mix or
    * it's not in the corpus).
    */
  /** Default mix over the testdata's src0..src19: three weight tiers
    * (expressed identically in the SQL oracle's CASE).
    */
  val DefaultMix: Map[String, Double] =
    (0 until 20).map(i => s"src$i" ->
      (if (i < 7) 0.75 else if (i < 14) 0.5 else 0.25)).toMap

  def weightedSample(spark: SparkSession, sfDir: String,
                     weights: Map[String, Double] = DefaultMix): DataFrame = {
    val thr = weights.foldLeft(lit(0)) { case (acc, (src, frac)) =>
      when(col("source") === src, lit((frac * 256).toInt)).otherwise(acc)
    }
    Tables.documents(spark, sfDir)
      .withColumn("gate", substring(md5(col("doc_id").cast("string")), 1, 2))
      .filter(col("gate") < format_string("%02x", thr))
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"))
  }

  /** The upsampling half of mix weighting: weight 2.3 means every doc
    * appears twice and a deterministic 30% of docs a third time (the
    * fractional copy chosen by the hash gate, so the same docs repeat
    * on every engine/run). Map-side explode — row amplification with
    * no shuffle; `copy_idx` disambiguates repeats downstream (e.g. for
    * epoch-aware shuffling).
    */
  def weightedUpsample(spark: SparkSession, sfDir: String,
                       weights: Map[String, Double] = Map("src0" -> 2.5, "src1" -> 1.25)): DataFrame = {
    val base = weights.foldLeft(lit(0)) { case (acc, (src, w)) =>
      when(col("source") === src, lit(w.toInt)).otherwise(acc)
    }
    val fracThr = weights.foldLeft(lit(0)) { case (acc, (src, w)) =>
      when(col("source") === src, lit(((w - w.toInt) * 256).toInt)).otherwise(acc)
    }
    Tables.documents(spark, sfDir)
      .withColumn("n_reps", base +
        when(substring(md5(col("doc_id").cast("string")), 1, 2)
          < format_string("%02x", fracThr), 1).otherwise(0))
      .filter(col("n_reps") >= 1)
      .select(col("doc_id"), col("source"),
        explode(sequence(lit(1), col("n_reps"))).as("copy_idx"))
  }

  /** Class-balanced resample: k docs per language, chosen by hash
    * order (not "first k seen" — that depends on scan order). One
    * shuffle on the class key; the window input is already the
    * filtered corpus.
    */
  def balancedSample(spark: SparkSession, sfDir: String, perClass: Int = 30): DataFrame = {
    val w = Window.partitionBy(col("lang"))
      .orderBy(md5(col("doc_id").cast("string")).asc, col("doc_id").asc)
    Tables.documents(spark, sfDir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= perClass)
      .select(col("doc_id"), col("lang"), col("rn"))
  }

  /** Curriculum / quality-bucketed sampling: rank documents into
    * per-source quality quartiles (type-token ratio, ties broken by
    * doc_id) and keep a decaying fraction per quartile — all of the
    * best bucket, half of the next, then a quarter, then an eighth.
    * The keep decision is the same content-derived hash gate as every
    * sampler here, so the output is engine/layout/run independent.
    *
    * Scale shape: the quartile assignment is a per-SOURCE window
    * (sources are the parallel unit — one sort per source, no global
    * sort). ntile is chosen for EXACTNESS (it makes the operator
    * SQL-oracle-checkable); at corpus scale where one source may be
    * TBs, swap the ntile for approx_percentile quality thresholds —
    * one pass, no sort, same output contract, approximate bucket
    * boundaries.
    */
  def curriculumSample(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(col("ttr").desc, col("doc_id").asc)
    applyCurriculumGates(
      scoredDocs(spark, sfDir).withColumn("q_bucket", ntile(4).over(w).cast("long")))
  }

  /** Shared quality scoring for both curriculum paths — one ttr
    * definition, so exact and approx cannot silently diverge. */
  private def scoredDocs(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = split(col("text"), " ")
    Tables.documents(spark, sfDir)
      .withColumn("ttr",
        round(size(array_distinct(toks)).cast("double") / size(toks), 4))
  }

  /** Shared decaying keep gates over an assigned `q_bucket` — one set
    * of keep-rate literals for both curriculum paths (CurriculumSpec's
    * agreement contract depends on gate identity). */
  private def applyCurriculumGates(bucketed: DataFrame): DataFrame =
    bucketed
      .withColumn("gate", substring(md5(col("doc_id").cast("string")), 1, 2))
      .filter(col("q_bucket") === 1 ||
        col("gate") < when(col("q_bucket") === 2, lit("80"))
          .when(col("q_bucket") === 3, lit("40")).otherwise(lit("20")))
      .select(col("doc_id"), col("source"), col("q_bucket"), col("ttr"))

  /** The scale path of [[curriculumSample]]: quartile boundaries from
    * `approx_percentile` instead of an exact per-source ntile sort.
    * Two passes, both sort-free: a per-source aggregate computes the
    * three quality cutpoints (a tiny |sources|-row table, broadcast
    * back), then a map-side comparison assigns buckets and applies
    * the same decaying hash gates. A source of any size costs one
    * partial-aggregated scan — no per-source sort — at the price of
    * approximate bucket boundaries (CurriculumSpec pins ≥95% bucket
    * agreement with the exact path at test SF). Ties across a
    * cutpoint all land in the SAME bucket here, whereas ntile splits
    * them to equalize bucket sizes — that's the semantic difference,
    * not just sketch error.
    *
    * Reproducibility caveat: approx_percentile's sketch boundaries
    * can shift with partition layout, so unlike every other sampler
    * here the keep decision is NOT layout-independent unless the
    * cutpoints are FROZEN — compute them once, persist the tiny
    * |sources|-row table, and pass it as `cutpoints` on every rerun
    * (given fixed cutpoints, bucketing and gates are pure row
    * functions again). The default recomputes, for self-containment.
    */
  def curriculumSampleApprox(spark: SparkSession, sfDir: String,
                             accuracy: Int = 10000,
                             cutpoints: Option[DataFrame] = None): DataFrame = {
    val scored = scoredDocs(spark, sfDir)
    val cuts = cutpoints.getOrElse(computeCutpoints(spark, sfDir, accuracy))
    applyCurriculumGates(
      scored.join(broadcast(cuts), Seq("source"))
        .withColumn("q_bucket",
          when(col("ttr") >= col("cuts")(0), 1L)
            .when(col("ttr") >= col("cuts")(1), 2L)
            .when(col("ttr") >= col("cuts")(2), 3L)
            .otherwise(4L)))
  }

  /** The per-source quality cutpoints as a standalone (tiny,
    * |sources|-row) table — split out so it can be FROZEN.
    */
  private[graft] def computeCutpoints(spark: SparkSession, sfDir: String,
                                      accuracy: Int = 10000): DataFrame =
    scoredDocs(spark, sfDir).groupBy(col("source"))
      .agg(expr(s"approx_percentile(ttr, array(0.75, 0.5, 0.25), $accuracy)").as("cuts"))

  /** [[curriculumSampleApprox]] with the cutpoints FROZEN to a parquet
    * artifact — the registered scale path. approx_percentile's sketch
    * boundaries can shift with partition layout, so the cutpoints are
    * computed ONCE (first run writes the |sources|-row table under
    * `artifactDir`, keyed by the corpus dir) and every rerun reads
    * them back; given fixed cutpoints, bucketing and hash gates are
    * pure row functions, making the sample layout/rerun independent
    * end-to-end (CurriculumSpec pins identical output across
    * shuffle-partition settings). Concurrent first runs may both write
    * the artifact — last writer wins, and both observe valid sketch
    * cutpoints; at 100 TB the freeze is a one-time pipeline step, not
    * per-query.
    *
    * `artifactDir` must be a SHARED filesystem path in production (a
    * lake/DFS prefix all drivers and executors resolve identically):
    * the freeze contract is "every session reads the same boundaries",
    * which a driver-local default cannot provide across machines. The
    * local default exists for tests and single-node runs only.
    */
  def curriculumSampleApproxFrozen(spark: SparkSession, sfDir: String,
                                   accuracy: Int = 10000,
                                   artifactDir: String = "target/graft-artifacts"): DataFrame = {
    // keyed by (corpus dir, accuracy): a different sketch accuracy must
    // not reuse another's cutpoints. Freezing is intentionally sticky
    // across corpus REGENERATION at the same path — that is the
    // reproducibility contract (the frozen boundaries ARE the sample
    // definition); delete the artifact to re-freeze against new data.
    // The readable slug alone can collide (/data/sf1 and /data_sf1 both
    // slug to data_sf1 — another corpus's frozen cutpoints silently
    // reused), so an md5 prefix of the RAW dir string disambiguates.
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(sfDir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
    val slug = sfDir.replaceAll("[^A-Za-z0-9._-]", "_")
    val path = s"$artifactDir/curriculum_cutpoints_a${accuracy}_${slug}_$digest"
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // migration: artifacts frozen before the digest suffix existed live
    // at the digest-less path — honor them rather than silently
    // re-freezing boundaries against current data (the exact drift the
    // freeze contract forbids). A legacy artifact is only trusted when
    // no digest-suffixed one exists; delete it to re-freeze.
    val legacy = new org.apache.hadoop.fs.Path(
      s"$artifactDir/curriculum_cutpoints_a${accuracy}_$slug")
    val readPath =
      if (!fs.exists(hPath) && fs.exists(legacy)) legacy.toString
      else {
        if (!fs.exists(hPath))
          computeCutpoints(spark, sfDir, accuracy)
            .coalesce(1).write.mode("overwrite").parquet(path)
        path
      }
    curriculumSampleApprox(spark, sfDir, accuracy,
      cutpoints = Some(spark.read.parquet(readPath)))
  }

  /** Epoch shuffling — the last prep step before the trainer reads:
    * each epoch must present the corpus in a different pseudorandom
    * order, reproducibly. Deterministic two-level shuffle, no global
    * sort anywhere:
    *  - shard = first hex digit of md5(epoch:doc_id) mod `shards` —
    *    epoch-dependent, so documents MIX ACROSS shards between
    *    epochs (round-robin by doc_id would pin each doc to a shard
    *    forever);
    *  - within-shard order = rank by the same hash (window per
    *    (epoch, shard) — `shards`-way parallel, executor-sized).
    * The (epoch, doc) → (shard, rank) mapping is a pure function of
    * content keys: identical across engines, re-runs, and layouts —
    * the same reproducibility contract as every sampler here.
    */
  def epochShuffle(spark: SparkSession, sfDir: String, epochs: Int = 2,
                   shards: Int = 8): DataFrame = {
    // shard = first 8 hex chars of the hash as a 32-bit int, mod
    // shards: EXACTLY uniform when shards divides 2^32 (any power of
    // two up to the full 32-bit space — shard count scales with the
    // cluster, no parallelism ceiling), and off by at most
    // shards/2^32 < 1e-6 otherwise. The per-(epoch, shard) rank sort
    // is therefore corpus/shards rows per task at ANY cluster size.
    require(shards >= 1, "shards must be >= 1")
    val w = Window.partitionBy(col("epoch"), col("shard"))
      .orderBy(col("h").asc, col("doc_id").asc)
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        explode(sequence(lit(0), lit(epochs - 1))).as("epoch"))
      // concat (not concat_ws): a NULL key must propagate to a NULL
      // hash exactly as the oracle's || does, not be silently dropped
      .withColumn("h", md5(concat(col("epoch").cast("string"), lit(":"),
        col("doc_id").cast("string"))))
      // 8 hex chars → 0..2^32-1 (DuckDB oracle twin:
      // CAST('0x' || substr(h, 1, 8) AS BIGINT))
      .withColumn("shard",
        (expr("conv(substring(h, 1, 8), 16, 10)").cast("long") % shards)
          .cast("long"))
      .withColumn("shard_rank", row_number().over(w).cast("long"))
      .select(col("doc_id"), col("epoch").cast("long").as("epoch"),
        col("shard"), col("shard_rank"))
  }

  /** Training-mix planner: turn per-source token inventories plus mix
    * weights and a global token budget into per-source sampling rates
    * — the arithmetic that decides what [[weightedSample]] /
    * [[weightedUpsample]] are RUN WITH. target_s = budget·w_s/Σw;
    * rate_s = target_s/tokens_s (rate > 1 ⇒ the source upsamples,
    * n_epochs = ⌈rate⌉ passes). One small aggregate over the corpus
    * (per-source partial sums ride the scan); the plan itself is a
    * |sources|-row table.
    */
  def mixPlan(spark: SparkSession, sfDir: String,
              budgetTokens: Long = 3000000L): DataFrame = {
    // same three weight tiers as DefaultMix, keyed off the source
    // index (mirrored in the oracle's CASE)
    val srcIdx = substring(col("source"), 4, 8).cast("int")
    val weight = when(srcIdx < 7, 0.75).when(srcIdx < 14, 0.5).otherwise(0.25)
    val sumW = 0.75 * 7 + 0.5 * 7 + 0.25 * 6
    Tables.documents(spark, sfDir)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " "))).as("n_tokens"),
        first(weight).as("weight"))
      .withColumn("target_tokens",
        floor(lit(budgetTokens) * col("weight") / lit(sumW)).cast("long"))
      .withColumn("rate",
        round(col("target_tokens").cast("double") / col("n_tokens"), 6))
      .withColumn("n_epochs", ceil(col("rate")).cast("long"))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("weight"),
        col("target_tokens"), col("rate"), col("n_epochs"))
  }
}
