package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Train/test decontamination — flag training documents that share
  * word n-grams with a held-out evaluation set, so benchmark text
  * never leaks into the training mix. The counterpart of the hygiene
  * pass the reference runs before modelling
  * (/root/reference/prototype/prepare_dataset.py:30-70 drops rows the
  * model must not see); at corpus scale the contract becomes "the
  * model must not see the eval suite".
  *
  * Shape, chosen for 100 TB:
  *  - the EVAL side is tiny (benchmark suites are MBs against a
  *    corpus of TBs): its distinct n-grams are broadcast, so the
  *    corpus-side scan never shuffles on the gram key — flagging is
  *    a map-side explode + broadcast hash join + per-doc aggregate;
  *  - the corpus side explodes grams lazily off the ingest scan; the
  *    only shuffle is the final per-doc count, keyed on doc_id (the
  *    table's natural key, no skew);
  *  - gram width n=4 keeps the FP rate low (4-gram collisions across
  *    independent docs are rare) while still catching verbatim leaks.
  *  If the eval side ever outgrows broadcast, the same plan degrades
  *  gracefully to a shuffled semi-join — flip the hint, nothing else.
  *
  * Here the "eval set" is carved from the corpus deterministically
  * (doc_id % evalMod == 0) so the operator is self-contained and
  * oracle-checkable; production passes a real benchmark table.
  */
object Decontamination {

  /** @return (doc_id, n_hits) for contaminated TRAIN docs only —
    *         n_hits = distinct eval n-grams the doc contains.
    */
  def flagContaminated(spark: SparkSession, sfDir: String, n: Int = 4,
                       evalMod: Int = 20): DataFrame =
    flagContaminatedOf(Tables.documents(spark, sfDir), n, evalMod)

  /** Core on an injectable corpus (docs: doc_id, text) — spec entry. */
  def flagContaminatedOf(docs: DataFrame, n: Int = 4,
                         evalMod: Int = 20): DataFrame = {
    val grams = docs
      .withColumn("w", split(col("text"), " "))
      .filter(size(col("w")) >= n)
      .select(col("doc_id"), explode(TextAnalysis.wordGrams(n)).as("gram"))
    val evalGrams = grams.filter(col("doc_id") % evalMod === 0)
      .select(col("gram")).distinct()
    // no output ordering: the driver's compare (and any sane consumer
    // of a flag table) is order-insensitive, and a global sort here is
    // a full-range exchange the contract doesn't require
    grams.filter(col("doc_id") % evalMod =!= 0)
      .join(broadcast(evalGrams), Seq("gram"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("gram")).as("n_hits"))
  }

  /** The bloom-prefiltered scale path of [[flagContaminated]]: when
    * the eval suite outgrows an exact-gram broadcast (a full holdout
    * battery is GBs of distinct grams; a Bloom filter of the same set
    * is MBs at 1% FPR), ship the FILTER, not the grams. The corpus
    * side drops non-candidate grams map-side with `might_contain`
    * (Spark's own Catalyst bloom expressions, the machinery behind
    * runtime row-group filtering, surfaced as `graft_bloom_agg` /
    * `graft_might_contain`); only the surviving ~1% join against the
    * exact gram set, which removes the false positives. Output is
    * therefore IDENTICAL to the exact operator — registered as
    * `q_decontaminate_bloom` against the SAME oracle, so the scale
    * path is value-gated, not approximated.
    */
  private val bloomViewSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  def flagContaminatedBloom(spark: SparkSession, sfDir: String, n: Int = 4,
                            evalMod: Int = 20, numBits: Long = 8388608L): DataFrame = {
    graft.functions.VectorFunctions.registerBloom(spark)
    val docs = Tables.documents(spark, sfDir)
    val grams = docs
      .withColumn("w", split(col("text"), " "))
      .filter(size(col("w")) >= n)
      .select(col("doc_id"), explode(TextAnalysis.wordGrams(n)).as("gram"))
    // cached: the eval-gram derivation (scan + explode + distinct)
    // feeds BOTH the bloom build and the exact verify join — without
    // the cache the scale path pays the eval side twice
    val evalGrams = grams.filter(col("doc_id") % evalMod === 0)
      .select(col("gram")).distinct()
      .cache()
    // the one-row bloom as a temp view: BloomFilterMightContain
    // requires its filter side to be a literal or scalar subquery.
    // Per-call unique names — a shared fixed name would let concurrent
    // invocations in one session build the filter over each other's
    // eval grams
    val seq = bloomViewSeq.incrementAndGet()
    val gramsView = s"graft_decon_eval_grams_$seq"
    val bloomView = s"graft_decon_bloom_$seq"
    evalGrams.createOrReplaceTempView(gramsView)
    spark.sql(
      s"SELECT graft_bloom_agg(xxhash64(gram), 1000000L, ${numBits}L) AS bf " +
       s"FROM $gramsView").createOrReplaceTempView(bloomView)
    val out = grams.filter(col("doc_id") % evalMod =!= 0)
      .filter(expr(s"graft_might_contain((SELECT bf FROM $bloomView), xxhash64(gram))"))
      .join(broadcast(evalGrams), Seq("gram"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("gram")).as("n_hits"))
    // Datasets analyze eagerly, so `out` holds the RESOLVED view
    // subtrees — the names can be dropped immediately; without this
    // every invocation leaked two catalog entries for the session's
    // lifetime. The evalGrams cache follows the repo-wide operator
    // convention: intermediates the plan consumes more than once stay
    // cached for the CALLER to drop (clearCache, as Bench/Verify do) —
    // unpersisting before `out` materializes would pay the eval-side
    // scan twice.
    spark.catalog.dropTempView(gramsView)
    spark.catalog.dropTempView(bloomView)
    out
  }

  // ---------------------------------------------------------------
  // persisted bloom artifact: the deployment shape of the scale path

  /** Build the eval-suite bloom ONCE and persist it as a small binary
    * artifact. In production the eval battery changes rarely while the
    * corpus streams continuously — rebuilding the filter per query (as
    * the self-contained [[flagContaminatedBloom]] must) would re-scan
    * the eval suite on every ingest tick; the artifact is built at
    * eval-release time and shipped to every filter site as a literal.
    * The driver-side pull is the filter itself — MBs, O(numBits/8),
    * never corpus-sized.
    */
  def buildBloomArtifact(spark: SparkSession, evalGrams: DataFrame,
                         path: String, numBits: Long = 8388608L): Unit = {
    graft.functions.VectorFunctions.registerBloom(spark)
    val seq = bloomViewSeq.incrementAndGet()
    val gramsView = s"graft_decon_artifact_grams_$seq"
    evalGrams.select(col("gram")).createOrReplaceTempView(gramsView)
    val bytes = spark.sql(
      s"SELECT graft_bloom_agg(xxhash64(gram), 1000000L, ${numBits}L) AS bf " +
        s"FROM $gramsView").collect()(0).getAs[Array[Byte]](0)
    spark.catalog.dropTempView(gramsView)
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(bytes) finally out.close()
  }

  /** Load a persisted bloom artifact (the whole file is the filter's
    * serialized bytes).
    */
  def loadBloomArtifact(spark: SparkSession, path: String): Array[Byte] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val b = new Array[Byte](1 << 16); var r = in.read(b)
      while (r >= 0) { buf.write(b, 0, r); r = in.read(b) }
      buf.toByteArray
    } finally in.close()
  }

  /** Map-side suspect flagging against a LOADED artifact: docs whose
    * n-grams hit the bloom, with the candidate-gram count. Zero
    * shuffles except the per-doc count (doc_id key, no skew); the
    * filter rides into every task as a binary literal — the shape a
    * streaming ingest runs ([[graft.streaming.DocStream.flagSuspects]]).
    * Bloom-only = conservative: false positives FLAG a clean doc
    * (~numBits-tunable rate), they never pass a leak — the exact
    * verify over suspects only is [[flagContaminatedStored]]'s second
    * (tiny) phase.
    */
  def flagWithArtifact(docs: DataFrame, bloom: Array[Byte], n: Int = 4): DataFrame = {
    graft.functions.VectorFunctions.registerBloom(docs.sparkSession)
    docs
      .withColumn("w", split(col("text"), " "))
      .filter(size(col("w")) >= n)
      .select(col("doc_id"), explode(TextAnalysis.wordGrams(n)).as("gram"))
      .filter(call_function("graft_might_contain", lit(bloom), xxhash64(col("gram"))))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_candidate_grams"))
  }

  /** The artifact lifecycle end-to-end (registered as
    * `q_decontaminate_store`): eval grams → bloom built and PERSISTED →
    * loaded back → train corpus flagged map-side against the loaded
    * literal → exact verify join over the (tiny) suspect set removes
    * the false positives. Output is identical to [[flagContaminated]]
    * and gated by the SAME oracle — the artifact round-trip is
    * hash-checked, not assumed.
    */
  def flagContaminatedStored(spark: SparkSession, sfDir: String, n: Int = 4,
      evalMod: Int = 20, numBits: Long = 8388608L,
      artifactDir: String = "target/graft-artifacts"): DataFrame = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(sfDir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
    val path = s"$artifactDir/decon_bloom_$digest"
    val docs = Tables.documents(spark, sfDir)
    val grams = docs
      .withColumn("w", split(col("text"), " "))
      .filter(size(col("w")) >= n)
      .select(col("doc_id"), explode(TextAnalysis.wordGrams(n)).as("gram"))
    val evalGrams = grams.filter(col("doc_id") % evalMod === 0)
      .select(col("gram")).distinct()
      .cache()
    graft.PhaseTimer.timed("q_decontaminate_store", "seed") {
      buildBloomArtifact(spark, evalGrams, path, numBits)
    }
    val bloom = loadBloomArtifact(spark, path)
    // suspects via the loaded artifact (doc granularity), then the
    // exact per-gram verify on only their grams
    val suspects = flagWithArtifact(
      docs.filter(col("doc_id") % evalMod =!= 0), bloom, n)
      .select(col("doc_id"))
    grams.filter(col("doc_id") % evalMod =!= 0)
      .join(broadcast(suspects), Seq("doc_id"), "left_semi")
      .join(broadcast(evalGrams), Seq("gram"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("gram")).as("n_hits"))
  }

  /** FUZZY decontamination — the near-dup regime of the same hygiene
    * pass: [[flagContaminated]] catches verbatim n-gram leakage, but a
    * benchmark item that was lightly rewritten (whitespace churn, a
    * swapped sentence, an appended answer key) slips past exact grams
    * while its shingle-Jaccard to the eval doc stays high. This
    * operator reuses the [[Dedup]] MinHash machinery WHOLE — same
    * 64-perm signatures, same 16×4 banding, same exact-Jaccard
    * verification — but joins train bands against EVAL bands only:
    * the eval side is a benchmark battery, orders of magnitude smaller
    * than the corpus, so its band index ships size-gated
    * ([[Hints.broadcastIfSmall]]) and candidate work is train-bands ×
    * colliding eval buckets — never train × train. Verification is the
    * exact Jaccard over the true shingle sets (candidates only), so
    * every reported hit is a real ≥-threshold overlap, not an LSH
    * guess. At 100 TB: one map-side signature pass over the corpus +
    * a broadcast band probe + per-candidate verify; no corpus-sized
    * shuffle at all.
    *
    * Output: (doc_id, n_eval_hits, max_jaccard) per contaminated
    * TRAIN doc. Like [[flagContaminated]], the eval set is carved
    * deterministically (doc_id % evalMod == 0) and — because the gate
    * corpus has no natural near-dups — contaminated train docs are
    * PLANTED as near-verbatim eval copies (suffix-mutated so exact
    * text equality does NOT hold; the same planted-corpus pattern as
    * [[Dedup.dupPlantedDocs]]). Production passes a real benchmark
    * table and an unmodified corpus.
    */
  def flagContaminatedFuzzy(spark: SparkSession, sfDir: String,
                            threshold: Double = 0.5, evalMod: Int = 20): DataFrame = {
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    // near-verbatim leak of every eval doc; +10000001 keeps the copy
    // OUT of the eval partition (offset ≡ 1 mod evalMod)
    val planted = docs.filter(col("doc_id") % evalMod === 0)
      .select((col("doc_id") + 10000001L).as("doc_id"),
        concat(col("text"), lit(" benchmark answer key appended")).as("text"))
    flagContaminatedFuzzyOf(spark, docs.unionByName(planted), threshold, evalMod)
  }

  /** Core on an injectable corpus (docs: doc_id, text) — spec entry.
    * Eval membership: doc_id % evalMod == 0.
    */
  private[graft] def flagContaminatedFuzzyOf(spark: SparkSession, docs: DataFrame,
      threshold: Double = 0.5, evalMod: Int = 20): DataFrame = {
    graft.functions.VectorFunctions.register(spark)
    val sets = Dedup.minhashSets(spark, docs).cache()
    val bands = Dedup.minhashBands(sets)
    val isEval = col("doc_id") % evalMod === 0
    val cand = bands.filter(!isEval).as("a")
      .join(Hints.broadcastIfSmall(bands.filter(isEval)
          .select(col("doc_id").as("eval_id"), col("band"), col("key"))),
        Seq("band", "key"))
      .select(col("a.doc_id").as("doc_a"), col("eval_id").as("doc_b"))
      .distinct()
    val out = Dedup.verifyMinhashPairs(cand, sets, threshold)
      .groupBy(col("doc_a"))
      .agg(countDistinct(col("doc_b")).as("n_eval_hits"),
        max(col("jaccard")).as("max_jaccard"))
      .select(col("doc_a").as("doc_id"), col("n_eval_hits"), col("max_jaccard"))
      .cache()
    // materialize the (small — flagged docs only) result eagerly so
    // the per-doc shingle sets — the job's LARGEST intermediate, read
    // by three plan branches — can be released right here instead of
    // staying pinned for the life of the session; long-lived callers
    // (gate + bench + repeated invocations) then accumulate only the
    // flagged rows, not the corpus
    out.count()
    sets.unpersist()
    out
  }
}
