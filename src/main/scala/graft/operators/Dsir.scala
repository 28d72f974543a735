package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (Xie et al. 2023, DSIR) —
  * the published scale answer to "pick the 2% of a web crawl that
  * looks like the high-quality target corpus": fit two bag-of-hashed-
  * n-gram unigram models (target, raw), weight every raw document by
  * its log importance ratio Σ_tokens [ln p̂_target(bucket) −
  * ln p̂_raw(bucket)], and resample with Gumbel-top-k — which
  * a classifier-free, tokenizer-free pass selects (the fastText
  * quality-classifier alternative with no training loop).
  *
  * Spark shape, end to end:
  *  - the two LM fits are ONE token explode + hash-bucket groupBy
  *    each (NBuckets=4096 rows out — the feature table is tiny by
  *    construction, whatever the corpus size);
  *  - the log-ratio table λ rides to every task as a broadcast;
  *    per-doc weights are a map-side bucket lookup + one doc-keyed
  *    sum — corpus work ∝ tokens, one shuffle;
  *  - selection NEVER globally sorts: the Gumbel-perturbed key's
  *    (1−frac) quantile is estimated in-plan (percentile_approx, a
  *    sketch aggregate) and broadcast back as the cut — the
  *    derivedHotCut discipline. Gumbel noise is hash-derived from
  *    doc_id (u = (xxhash64(id,seed) mod 1e6 + 0.5)/1e6,
  *    g = −ln(−ln u)) so the sample is deterministic and
  *    parallelism-independent, no RNG.
  *
  * The λ table is a first-class artifact (`buildDsirArtifact` /
  * `scoreWithArtifact` — the bloom / BPE lifecycle): production fits
  * once on (target, raw sample) and scores many ingest batches
  * against the frozen table.
  */
object Dsir {

  /** Hashed-feature space size — DSIR's published 10^4-bucket scale;
    * a power of two keeps pmod cheap. Fixed regardless of corpus
    * size: the model is per-BUCKET, so its row count never grows.
    */
  val NBuckets = 4096

  private def bucketOf(tok: Column): Column = pmod(xxhash64(tok), lit(NBuckets))

  /** Per-bucket token counts of a corpus (bucket, n). */
  private def bucketCounts(docs: DataFrame, as: String): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("token"))
      .groupBy(bucketOf(col("token")).as("bucket"))
      .agg(count(lit(1)).as(as))

  /** Fit the log-importance-ratio table λ: for each hash bucket,
    * ln((ct+1)/(Tt+NBuckets)) − ln((cr+1)/(Tr+NBuckets)) — add-one
    * smoothed unigram log-likelihood ratio. Output (bucket, lambda,
    * cr, tr), ≤ NBuckets rows: λ is ROUNDED to the 1e-6 grid before
    * it ever enters a per-document sum (the BM25 rounding discipline
    * — grid addends keep the order-dependent FP add ~1e-14 from a
    * grid point, so [[scoreOf]]'s 4-decimal weight can never flip
    * with partitioning; DsirSpec pins repartition-invariance), and
    * the raw-side counts (cr, tr) ride along as the frozen ingest
    * distribution the staleness probe ([[dsirDriftProbe]]) compares
    * scored batches against.
    */
  def fitLogRatio(target: DataFrame, raw: DataFrame): DataFrame = {
    val ct = bucketCounts(target, "ct")
    val cr = bucketCounts(raw, "cr")
    val joined = ct.join(cr, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("ct"), lit(0L)).as("ct"),
        coalesce(col("cr"), lit(0L)).as("cr"))
    val totals = joined.agg(sum(col("ct")).as("tt"), sum(col("cr")).as("tr"))
    joined.crossJoin(broadcast(totals))
      .select(col("bucket"),
        round(log((col("ct") + 1) / (col("tt") + NBuckets)) -
          log((col("cr") + 1) / (col("tr") + NBuckets)), 6).as("lambda"),
        col("cr"), col("tt"), col("tr"))
  }

  /** Per-document log importance weight under a fitted λ table:
    * Σ_tokens λ(bucket(token)). The λ join is a broadcast on the
    * ≤-NBuckets-row table; the weight agg is the one doc-keyed
    * shuffle. Buckets the fit never observed score the add-one
    * SMOOTHING FLOOR λ₀ = ln((Tr+B)/(Tt+B)) — the published model's
    * unseen-event ratio, NOT zero: for a small target corpus λ₀ is
    * positive, which is exactly how a frozen table comes to prefer
    * out-of-distribution garbage (the staleness channel
    * [[dsirDriftProbe]] watches; DsirSpec plants it).
    */
  def scoreOf(docs: DataFrame, lambda: DataFrame): DataFrame = {
    val floor = lambda.agg(round(
      log((max(col("tr")) + NBuckets) / (max(col("tt")) + NBuckets)), 6).as("lambda0"))
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .withColumn("bucket", bucketOf(col("token")))
      .join(broadcast(lambda.select(col("bucket"), col("lambda"))), Seq("bucket"), "left")
      .crossJoin(broadcast(floor))
      .groupBy(col("doc_id"))
      .agg(round(sum(coalesce(col("lambda"), col("lambda0"))), 4).as("weight"))
  }

  /** Hash-derived standard Gumbel — deterministic, no RNG: resampling
    * with weight+Gumbel top-k draws without replacement proportional
    * to the (temperature-1) softmax of the weights, the DSIR sampler.
    */
  private def gumbelOf(id: Column, seed: Long): Column = {
    val u = (pmod(xxhash64(id, lit(seed)), lit(1000000L)) + 0.5) / 1000000.0
    -log(-log(u))
  }

  /** Select ≈`frac` of the raw corpus by Gumbel-perturbed weight,
    * threshold from an in-plan quantile sketch (no global sort, no
    * driver collect). Output: (doc_id, weight, key, selected) for
    * every scored doc — the audit shape (selection rate and weight
    * distribution are one filter away).
    *
    * The cut is a SKETCH quantile (`percentile_approx`): the selected
    * FRACTION is ≈frac, exact only up to sketch accuracy, and the
    * sketch's merge is partition-order-sensitive at the margin — keys
    * within sketch error of the cut can flip selection across
    * different parallelism. Per-doc weights and keys are fully
    * deterministic (grid-rounded λ, hash-derived Gumbel); only the
    * threshold is approximate. Callers needing a bit-stable SET
    * across replans should persist the cut with the selection run
    * (one scalar), not re-derive it.
    */
  def sampleOf(docs: DataFrame, lambda: DataFrame, frac: Double,
               seed: Long = 42L): DataFrame = {
    val keyed = scoreOf(docs, lambda)
      .withColumn("key", col("weight") + gumbelOf(col("doc_id"), seed))
    val cut = keyed.agg(
      percentile_approx(col("key"), lit(1.0 - frac), lit(10000)).as("cut"))
    keyed.crossJoin(broadcast(cut))
      .select(col("doc_id"), col("weight"), round(col("key"), 4).as("key"),
        (col("key") >= col("cut")).as("selected"))
  }

  /** Registered `q_dsir_sample`: target = the Spanish-language slice
    * of the corpus (the languages genuinely differ in marker-token
    * distribution — the same signal `text_langid` keys on), raw = the
    * whole corpus, select ≈20%. Rows-only (the hashed-LM weights have
    * no SQL oracle); the planted-signal spec drives an injectable
    * two-vocabulary corpus instead.
    */
  def dsirSample(spark: SparkSession, sfDir: String, frac: Double = 0.2): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    sampleOf(docs, fitLogRatio(docs.filter(col("lang") === "es"), docs), frac)
  }

  /** Persist the fitted λ table — the artifact lifecycle's build-once
    * half (the `buildBloomArtifact` shape; ≤ NBuckets rows).
    */
  def buildDsirArtifact(target: DataFrame, raw: DataFrame, dir: String): Unit =
    fitLogRatio(target, raw).write.mode("overwrite").parquet(dir)

  /** Score a batch against the frozen artifact: load (≤ NBuckets
    * rows) + broadcast — stateless ingest-time scoring, byte-equal to
    * in-query fit+score at equal inputs (parquet doubles round-trip
    * exactly; spec-pinned).
    */
  def scoreWithArtifact(spark: SparkSession, dir: String, docs: DataFrame): DataFrame =
    scoreOf(docs, spark.read.parquet(dir))

  /** Registered `q_dsir_store`: build → load → score round trip (the
    * fit phase PhaseTimer'd — production fits once, scores many).
    */
  def dsirStored(spark: SparkSession, sfDir: String,
                 artifactDir: String = "target/graft-artifacts"): DataFrame = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(sfDir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
    val dir = s"$artifactDir/dsir_lambda_$digest"
    val docs = Tables.documents(spark, sfDir)
    graft.PhaseTimer.timed("q_dsir_store", "fit") {
      buildDsirArtifact(docs.filter(col("lang") === "es"), docs, dir)
    }
    scoreWithArtifact(spark, dir, docs)
  }

  // ----- λ-table staleness probe (the semanticDriftProbe shape) ----

  /** One staleness measurement of a scored batch against the frozen
    * λ table's raw distribution.
    */
  case class DsirProbeResult(kl: Double, nTokens: Long, tripped: Boolean) {
    override def toString: String =
      f"dsirProbe[kl=$kl%.4f tokens=$nTokens tripped=$tripped]"
  }

  /** λ-staleness drift probe — the gap every other frozen-artifact
    * family already closed (`ivfRecallProbe`, `semanticDriftProbe`):
    * the λ table is fit ONCE on (target, raw-at-fit-time), and an
    * ingest-distribution shift silently degrades selection with no
    * signal anywhere — worst case, a vocabulary the fit never saw
    * scores λ = ln((Tr+B)/(Tt+B)) per token (both smoothing floors),
    * which for a small target corpus is POSITIVE: unseen garbage
    * outscores genuine target-like text (DsirSpec plants exactly
    * this). The probe measures the shift directly: add-one-smoothed
    * KL(batch ‖ frozen-raw) over the hashed-bucket space, summed over
    * the union of observed buckets (never-seen buckets contribute a
    * sizes-only constant, identical for drifted and faithful batches
    * — the probe is a drift SIGNAL with a calibrated ceiling, not an
    * exact divergence). Cost: one batch token pass + a ≤-NBuckets
    * join — probe every batch for free next to scoring. Above
    * `ceiling` it trips: the operator's signal to refit
    * ([[buildDsirArtifact]] on target + current raw) — the
    * rebuildSemanticIndex analog, spec-pinned to restore selection
    * preference after a planted shift.
    */
  def dsirDriftProbe(spark: SparkSession, dir: String, batch: DataFrame,
                     ceiling: Double = 0.5): DsirProbeResult = {
    val tab = spark.read.parquet(dir).select(col("bucket"), col("cr"), col("tr"))
    val bc = bucketCounts(batch, "n")
    val scal = tab.agg(max(col("tr")).as("tr"))
      .crossJoin(bc.agg(coalesce(sum(col("n")), lit(0L)).as("nn")))
    val joined = tab.select(col("bucket"), col("cr"))
      .join(bc, Seq("bucket"), "full_outer")
      .crossJoin(broadcast(scal))
      .select(
        ((coalesce(col("n"), lit(0L)) + 1) / (col("nn") + NBuckets)).as("pb"),
        ((coalesce(col("cr"), lit(0L)) + 1) / (col("tr") + NBuckets)).as("pr"),
        coalesce(col("n"), lit(0L)).as("n"))
    val r = joined.agg(
      sum(col("pb") * log(col("pb") / col("pr"))).as("kl"),
      sum(col("n")).as("ntok")).collect()(0)
    val kl = if (r.isNullAt(0)) 0.0 else r.getDouble(0)
    DsirProbeResult(kl, r.getLong(1), tripped = kl > ceiling)
  }

  /** Probe policy for [[scoreWithArtifactProbed]] — the
    * SemanticProbeConfig shape: `onDrift` is the refit trigger.
    */
  case class DsirProbeConfig(ceiling: Double = 0.5,
      onDrift: DsirProbeResult => Unit = _ => ())

  /** Score a batch against the frozen artifact WITH the staleness
    * probe riding along — the production ingest-scoring entry:
    * stateless scoring plus the per-batch drift measurement, firing
    * `onDrift` above the ceiling (refit + re-score is the operator's
    * move; the probe never blocks the batch).
    */
  def scoreWithArtifactProbed(spark: SparkSession, dir: String, docs: DataFrame,
      probe: DsirProbeConfig = DsirProbeConfig()): DataFrame = {
    val r = dsirDriftProbe(spark, dir, docs, probe.ceiling)
    if (r.tripped) probe.onDrift(r)
    scoreWithArtifact(spark, dir, docs)
  }
}
