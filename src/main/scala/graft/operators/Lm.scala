package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** N-gram language-model quality scoring — the CCNet filter (Wenzek
  * et al. 2020: score every crawled document under an LM trained on a
  * curated target corpus, bucket the corpus into head/middle/tail by
  * the score) with Stupid Backoff smoothing (Brants et al. 2007 — the
  * smoothing DESIGNED for distributed corpus-scale LMs: no discount
  * bookkeeping, score S(w|v) = c(vw)/c(v) if the bigram was seen,
  * else α·S(w) with α = 0.4; scores are deliberately unnormalized).
  * This is the third member of the targeted-selection family and the
  * classic one: DSIR reweights by a target/raw likelihood RATIO,
  * `q_quality_filter` applies hand rules; the LM filter ranks by
  * target-corpus likelihood alone — the fastText/KenLM production
  * standard, here tokenizer-free over hashed n-gram buckets.
  *
  * Hashed feature space (the DSIR hash-kernel discipline, but keyed
  * by md5 PREFIX strings so the whole computation — training counts,
  * backoff arithmetic, terciles — has an exact cross-engine SQL
  * oracle): unigram bucket = first 3 hex chars of md5(token) (4096
  * buckets), bigram bucket = first 4 of md5(prev ⊔ ' ' ⊔ cur) (65536).
  * Both count tables are BOUNDED by construction whatever the corpus
  * size — the model rides to every task as a broadcast.
  *
  * Spark shape:
  *  - fit = one token pass each for unigrams/bigrams, two bounded
  *    groupBys (≤ 4096 + 65536 rows out);
  *  - score = map-side array transform to (ub, bb, pb) triples,
  *    broadcast joins against the count tables, per-token log-score
  *    ROUNDED TO THE 1e-4 GRID before the per-doc sum (the BM25
  *    rounding discipline — FP add order can never flip the 4-decimal
  *    doc score), then ONE doc-keyed aggregate whose map-side partial
  *    agg collapses each doc's tokens before the shuffle (a doc's
  *    exploded tokens are partition-contiguous) — ~1 row/doc shuffled;
  *  - the head/middle/tail label is a PER-LANGUAGE ntile(3) window
  *    (CCNet buckets per language; per-lang windows parallelize). At
  *    100 TB the tercile cut is the one step to replace with frozen
  *    approx-quantile cutpoints — the `q_sample_curriculum_approx`
  *    rung demonstrates exactly that lifecycle; the exact window form
  *    here is the oracle-able contract.
  *
  * Backoff arithmetic under hashing, stated honestly: c(vw) and c(v)
  * live in INDEPENDENT hash spaces, so a collided bigram bucket can
  * exceed its context's unigram bucket (S > 1, log S > 0) — harmless,
  * Stupid Backoff scores were never probabilities (Brants et al. §3);
  * and a seen bigram bucket whose context bucket went unobserved
  * falls to the backoff arm (cb without cpb). The backoff arm is
  * add-one smoothed over the unigram space, so unseen vocabulary
  * scores the floor α·1/(N+B) instead of −∞.
  */
object Lm {

  /** Unigram hash space: 3 hex chars = 4096 buckets (the DSIR scale). */
  val UniBuckets = 4096

  /** Bigram hash space: 4 hex chars = 65536 buckets. */
  val BiBuckets = 65536

  /** Stupid Backoff's published back-off weight (Brants et al. 2007). */
  val Alpha = 0.4

  private def uniBucket(tok: Column): Column = substring(md5(tok), 1, 3)

  /** Fit the two hashed count tables on the target corpus.
    * @return (uni: (ub, cu) ≤ 4096 rows, bi: (bb, cb) ≤ 65536 rows)
    */
  def fitCounts(target: DataFrame): (DataFrame, DataFrame) = {
    val uni = target
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy(uniBucket(col("token")).as("ub"))
      .agg(count(lit(1)).as("cu"))
    val bi = target
      .select(split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(2, size(w)), i -> " +
        "substring(md5(concat(element_at(w, i - 1), ' ', element_at(w, i))), 1, 4))"))
        .as("bb"))
      .groupBy(col("bb"))
      .agg(count(lit(1)).as("cb"))
    (uni, bi)
  }

  /** Score docs under fitted count tables: per-doc (doc_id, lang,
    * n_tok, logsb) where logsb = round(−Σ round(ln S, 4), 4) / n_tok
    * — mean negative log Stupid-Backoff score, the log-perplexity
    * analog (lower = more target-like). Token i ≥ 2 scores the
    * bigram arm cb/cpb when BOTH buckets were observed, else
    * α·(cu+1)/(N+B); the first token scores the (α-free) add-one
    * unigram arm.
    *
    * ROUND-THEN-DIVIDE, never round the quotient: the token sum is a
    * (near-)exact multiple of 1e-4, so sum/n sits EXACTLY on a
    * x.xxxx5 rounding boundary whenever n divides a half-grid
    * rational — a true decimal TIE that each engine's ~1e-12
    * summation noise flips at random (measured: 5/500 docs mismatched
    * the oracle at sf0.01 under round-after-divide). Rounding the
    * grid-exact sum first is noise-immune, and IEEE division of the
    * identical rounded doubles by the identical count is bit-equal
    * across engines with no further rounding.
    */
  def scoreOf(docs: DataFrame, uni: DataFrame, bi: DataFrame): DataFrame = {
    // an EMPTY unigram table (target slice selected no documents —
    // possible at tiny SFs or on a foreign corpus) would make n_total
    // NULL and every score silently NULL on BOTH engines, so the SQL
    // oracle gate would pass on fully degenerate output; fail fast
    // instead (the check is one scan of a ≤ 4096-row frame)
    require(!uni.isEmpty,
      "LM unigram counts are empty — the target corpus slice selected no " +
        "documents; scoring would emit all-NULL scores")
    val totals = uni.agg(sum(col("cu")).as("n_total"))
    val toks = docs
      .select(col("doc_id"), col("lang"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), col("lang"), explode(expr(
        "transform(sequence(1, size(w)), i -> named_struct(" +
        "'ub', substring(md5(element_at(w, i)), 1, 3), " +
        "'bb', CASE WHEN i >= 2 THEN substring(md5(concat(element_at(w, i - 1), ' ', element_at(w, i))), 1, 4) END, " +
        "'pb', CASE WHEN i >= 2 THEN substring(md5(element_at(w, i - 1)), 1, 3) END))"))
        .as("t"))
      .select(col("doc_id"), col("lang"),
        col("t.ub").as("ub"), col("t.bb").as("bb"), col("t.pb").as("pb"))
    val scored = toks
      .join(broadcast(bi), Seq("bb"), "left")
      .join(broadcast(uni), Seq("ub"), "left")
      .join(broadcast(uni.select(col("ub").as("pb"), col("cu").as("cpb"))),
        Seq("pb"), "left")
      .crossJoin(broadcast(totals))
      .withColumn("s",
        when(col("cb").isNotNull && col("cpb").isNotNull,
          col("cb") / col("cpb"))
        .otherwise(
          (when(col("pb").isNull, lit(1.0)).otherwise(lit(Alpha))) *
          (coalesce(col("cu"), lit(0L)) + 1) / (col("n_total") + UniBuckets)))
      .withColumn("l", round(log(col("s")), 4))
    scored.groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("n_tok"),
        (round(-sum(col("l")), 4) / count(lit(1))).as("logsb"))
  }

  /** Attach the CCNet head/middle/tail label: per-LANGUAGE terciles
    * of logsb (ascending — tercile 1 is the head, the most
    * target-like third). Deterministic tie-break on doc_id.
    */
  def withTerciles(scores: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("logsb").asc, col("doc_id").asc)
    scores.withColumn("tercile", ntile(3).over(w))
  }

  /** Registered `text_lm_score`: fit on the curated target slice
    * (every 10th English doc — the "clean Wikipedia" stand-in), score
    * the WHOLE corpus, label per-lang terciles. Non-English docs
    * score far from the English-trained LM — the measured reason
    * CCNet trains one LM per language (LmSpec pins the separation).
    */
  def lmScore(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val (uni, bi) = fitCounts(
      docs.filter(col("lang") === "en" && col("doc_id") % 10 === 0))
    withTerciles(scoreOf(docs, uni, bi))
      .select(col("doc_id"), col("lang"), col("n_tok"), col("logsb"), col("tercile"))
  }

  /** Persist the fitted model as ONE bounded parquet artifact
    * (kind ∈ 'uni'|'bi', bucket, n — ≤ 4096 + 65536 rows; the
    * buildDsirArtifact lifecycle).
    */
  def buildLmArtifact(target: DataFrame, dir: String): Unit = {
    val (uni, bi) = fitCounts(target)
    uni.select(lit("uni").as("kind"), col("ub").as("bucket"), col("cu").as("n"))
      .unionByName(
        bi.select(lit("bi").as("kind"), col("bb").as("bucket"), col("cb").as("n")))
      .write.mode("overwrite").parquet(dir)
  }

  /** Score a batch against the frozen artifact — value-identical to
    * in-query fit+score at equal inputs (integer counts round-trip
    * parquet exactly; LmSpec pins row parity), so the stored rung is
    * gated by the SAME SQL oracle as `text_lm_score`.
    */
  def scoreWithArtifact(spark: SparkSession, dir: String, docs: DataFrame): DataFrame = {
    val tab = spark.read.parquet(dir)
    val uni = tab.filter(col("kind") === "uni")
      .select(col("bucket").as("ub"), col("n").as("cu"))
    val bi = tab.filter(col("kind") === "bi")
      .select(col("bucket").as("bb"), col("n").as("cb"))
    scoreOf(docs, uni, bi)
  }

  /** Registered `text_lm_store`: build → persist → load → score →
    * terciles (fit PhaseTimer'd apart — production fits once, scores
    * every ingest batch).
    */
  def lmStored(spark: SparkSession, sfDir: String,
               artifactDir: String = "target/graft-artifacts"): DataFrame = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(sfDir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
    val dir = s"$artifactDir/lm_counts_$digest"
    val docs = Tables.documents(spark, sfDir)
    graft.PhaseTimer.timed("text_lm_store", "fit") {
      buildLmArtifact(docs.filter(col("lang") === "en" && col("doc_id") % 10 === 0), dir)
    }
    withTerciles(scoreWithArtifact(spark, dir, docs))
      .select(col("doc_id"), col("lang"), col("n_tok"), col("logsb"), col("tercile"))
  }

  // ----- frozen tercile cutpoints (r12 verdict task #7) -------------

  /** Persist per-language APPROX-QUANTILE tercile cutpoints of logsb
    * as the artifact's third table — the production form of the
    * head/middle/tail cut: the exact `ntile(3)` window re-sorts every
    * scored batch AND moves the boundary as the batch mix drifts,
    * whereas CCNet's deployment freezes the cut once (on a reference
    * scoring of the seed corpus) so batches labeled on different days
    * are mutually consistent — the `q_sample_curriculum_approx`
    * lifecycle applied to the LM filter. One bounded row per
    * language: (lang, c1, c2).
    */
  def buildLmCutpoints(scores: DataFrame, dir: String): Unit = {
    scores.groupBy(col("lang"))
      .agg(percentile_approx(col("logsb"),
        array(lit(1.0 / 3), lit(2.0 / 3)), lit(10000)).as("cuts"))
      .select(col("lang"), col("cuts")(0).as("c1"), col("cuts")(1).as("c2"))
      .coalesce(1)
      .write.mode("overwrite").parquet(dir)
  }

  /** Label a scored batch against the FROZEN cutpoints — a broadcast
    * join + two comparisons per row, no window, no sort: the 100 TB
    * shape (the exact window stays as the oracle-able contract the
    * spec measures agreement against). A language absent from the
    * cutpoint table labels tercile 3 — an unknown language is maximal
    * "far from the target LM", the conservative tail.
    */
  def withStoredTerciles(spark: SparkSession, scores: DataFrame,
                         dir: String): DataFrame = {
    val cuts = spark.read.parquet(dir)
    scores.join(broadcast(cuts), Seq("lang"), "left")
      .withColumn("tercile",
        when(col("c1").isNull, lit(3))
          .when(col("logsb") <= col("c1"), lit(1))
          .when(col("logsb") <= col("c2"), lit(2))
          .otherwise(lit(3)))
      .drop("c1", "c2")
  }

  /** Registered `text_lm_frozen`: the full frozen lifecycle — counts
    * artifact + cutpoint artifact fit once (PhaseTimer'd), the batch
    * scored map-side and labeled against the frozen cuts. Rows-only
    * (approx-quantile cuts are engine-specific); LmSpec pins ≥95%
    * tercile agreement with the exact window plus exact agreement of
    * everything BELOW the tercile column (same scoring path as the
    * oracle-gated rungs).
    */
  def lmFrozen(spark: SparkSession, sfDir: String,
               artifactDir: String = "target/graft-artifacts"): DataFrame = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(sfDir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
    val countsDir = s"$artifactDir/lm_counts_$digest"
    val cutsDir = s"$artifactDir/lm_cuts_$digest"
    val docs = Tables.documents(spark, sfDir)
    graft.PhaseTimer.timed("text_lm_frozen", "fit") {
      buildLmArtifact(docs.filter(col("lang") === "en" && col("doc_id") % 10 === 0),
        countsDir)
      buildLmCutpoints(scoreWithArtifact(spark, countsDir, docs), cutsDir)
    }
    withStoredTerciles(spark, scoreWithArtifact(spark, countsDir, docs), cutsDir)
      .select(col("doc_id"), col("lang"), col("n_tok"), col("logsb"), col("tercile"))
  }
}
