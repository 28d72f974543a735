package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times the headline queries at
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Each query is forced through a `noop` sink — a bare `count()` would
  * let Catalyst prune computed columns and understate the work. The
  * slow ML sweeps (als_eval/als_grid) stay out of the headline so the
  * bench measures engine throughput, not model-training repetitions;
  * als_top_n remains as the ML headline.
  */
object Bench {

  private val headline: Seq[String] = Seq(
    "q1_agg", "q3_join", "q_ratings_etl", "q_movie_stats", "q_top_movies",
    "q_user_top_ratings", "q_user_latest", "q_recs_fallback",
    "q_implicit_backfill", "q_events_window", "q_sessionize", "q_interval_join",
    "q5_nation", "q1_rollup", "q_moving_avg", "q_events_props", "q_asof_join",
    "q_skew_join",
    "q_item_cooc", "q_item_cooc_salted", "q_item_cooc_inc", "q_item_sim", "q_user_sim",
    "q_item_cf_recs", "q_recs_serve",
    "q_user_mutations", "text_tfidf",
    "q_user_topk_agg", "q_approx_stats",
    "q_corpus_prep", "q_sample_weighted", "q_sample_upsample",
    "q_sample_curriculum", "q_mix_plan", "q_epoch_shuffle",
    "dedup_exact", "dedup_exact_inc", "dedup_exact_delta", "dedup_exact_store",
    "dedup_minhash", "dedup_minhash_inc", "dedup_minhash_store",
    "dedup_simhash", "dedup_simhash_inc", "dedup_simhash_store",
    "dedup_ngram_jaccard", "dedup_ngram_inc",
    "dedup_embed_cosine", "dedup_embed_lsh", "dedup_embed_lsh_wide", "dedup_embed_lsh_inc",
    "dedup_clusters", "dedup_clusters_star",
    "knn_brute", "knn_ivf", "knn_sq8",
    "text_quality", "text_tokens", "text_token_count", "text_repetition",
    "text_langid", "text_fingerprint", "text_redact",
    "q_ngram_topk", "q_quality_filter",
    "text_line_dedup", "text_line_dedup_inc",
    "q_decontaminate", "q_decontaminate_bloom", "q_decontaminate_minhash",
    "q_seq_pack",
    "mm_features", "mm_resize", "mm_frames", "mm_phash",
    "als_top_n", "als_implicit")

  /** Only the ALS hyper-parameter SWEEPS stay out of the bench (each
    * trains many models to measure one engine); every other
    * registered query runs — the explicit ordering above first, then
    * whatever else `SparkEntry.queries` registers, alphabetically.
    * That includes the `*_store` lifecycle rungs (each seeds a full
    * store in-query, so they land in the heavy-rep budget): a
    * store-path regression must show up in BENCH_r{N}, not only in
    * the correctness gate. Registering a new query makes it benched
    * by construction — the r9 gap (seven registered rungs invisible
    * to the bench) cannot re-open.
    */
  private val excluded = Set("als_eval", "als_cv", "als_grid")
  private def allRegistered: Seq[String] =
    headline ++ SparkEntry.queries.keys.toSeq.sorted
      .filterNot(k => excluded.contains(k) || headline.contains(k))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // local[32] with shuffle.partitions=32: post-shuffle coalescing
      // can only drop below core count and idle cores (measured
      // ~1.5 s/query on the pair joins). On a real cluster — where
      // partitions >> cores — leave it on.
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // JVM/codegen warm-up on the smallest SF so headline timings
    // measure the query, not first-touch class loading.
    try SparkEntry.queries("q1_agg")(spark, "/root/testdata/sf0.001")
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }

    // Per-query shuffle-bytes-written, accumulated from task metrics:
    // wall time carries host noise, shuffle bytes do not — the bytes
    // column lets a reader separate "the plan got heavier" from "the
    // host was contended" mechanically. The listener bus is async;
    // snapshots drain for a beat after each action, which bounds the
    // skew to far below plan-change magnitude.
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(taskEnd: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = taskEnd.taskMetrics
        if (m != null) shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    })

    // SPARK_GRAFT_BENCH_ONLY=q_a,q_b restricts the run (local iteration)
    val selected = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
      .map(only => allRegistered.filter(only))
      .getOrElse(allRegistered)
    // SPARK_GRAFT_BENCH_REPS=n: repeat each query and report the MIN,
    // so a transiently contended host cannot fake a regression. To keep
    // total wall bounded, full reps apply only to queries whose first
    // run came in under repCutoffSec; heavier queries get at most one
    // extra rep from a shared heavyBudgetSec pool.
    // DEFAULT 2 — single-shot numbers have shipped ±10× host noise
    // (r3: q_events_props 5.5 s driver vs 0.46 s re-measured); a
    // non-numeric env value falls back to the default with a warning.
    val reps = sys.env.get("SPARK_GRAFT_BENCH_REPS") match {
      case Some(v) => scala.util.Try(v.trim.toInt).toOption match {
        case Some(n) => n.max(1)
        case None =>
          System.err.println(s"[bench] ignoring non-numeric SPARK_GRAFT_BENCH_REPS='$v', using 2")
          2
      }
      case None => 2
    }
    val repCutoffSec = 10.0
    // Heavy queries (first run > repCutoffSec) used to be single-shot,
    // which put the full brunt of host contention on exactly the
    // numbers that matter most (r4: als_top_n reported 2× its idle-box
    // time). They now get ONE extra rep each, drawn from a shared
    // wall-clock budget so the total stays bounded. Admission requires
    // first <= remaining/2 (the rerun costs about another `first`) and
    // the budget is charged with the MEASURED extra-rep time — one
    // near-budget query can no longer consume the pool up front and
    // then overshoot it with an uncharged rerun.
    var heavyBudgetSec = sys.env.get("SPARK_GRAFT_BENCH_HEAVY_BUDGET")
      .flatMap(v => scala.util.Try(v.trim.toDouble).toOption)
      .getOrElse(90.0)
    // A failed rep must NEVER surface as a timing: r7 shipped six
    // analysis-crashed queries as ~0.06 s "successes" (the fastest
    // numbers on the board) and the total quietly lost their real
    // work. A failure records NaN, drops the query from the JSON
    // maps, lands it in a "failed" list, and flips the exit code —
    // mirroring Verify's contract.
    val failedQueries = scala.collection.mutable.LinkedHashSet.empty[String]
    // per-phase timings for the store-lifecycle rungs (seed vs tick vs
    // search — see PhaseTimer): reset before each rep, keep the LAST
    // completed rep's phases per query; emitted as "phases" so a
    // tick-path regression is visible without untangling it from the
    // seed's noise in the folded wall
    val phases = scala.collection.mutable.LinkedHashMap.empty[String, Map[String, Double]]
    val results = selected.flatMap { name =>
      SparkEntry.queries.get(name).map { fn =>
        def once(): Double = {
          PhaseTimer.reset()
          val t0 = System.nanoTime()
          val ok =
            try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
            catch { case e: Throwable =>
              System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
              failedQueries += name
              false
            }
          val dt = (System.nanoTime() - t0) / 1e9
          // operators cache intermediates (sig tables, sim chains) for
          // intra-query reuse; drop them between queries or 34 queries'
          // worth of cached blocks pile up and GC-thrash the tail
          spark.catalog.clearCache()
          if (ok) {
            PhaseTimer.snapshot().get(name).foreach(ph => phases(name) = ph)
            dt
          } else Double.NaN
        }
        // per-query warm-up at the smallest SF: the q1_agg warm-up
        // above only touches ITS plan's classes — a heavy query's
        // first rep otherwise pays whole-plan codegen + class loading,
        // and the rep-cutoff admission gives exactly those queries the
        // fewest reps to amortize it (measured: q_recs_serve reported
        // 12 s while its warm steady-state is ~9 s). Costs well under
        // a second per query at sf0.001.
        try {
          fn(spark, "/root/testdata/sf0.001")
            .write.format("noop").mode("overwrite").save()
          spark.catalog.clearCache()
        } catch { case _: Throwable => () }
        Thread.sleep(30) // drain warm-up tasks off the async listener bus
        val bytes0 = shuffleBytes.get()
        val first = once()
        Thread.sleep(30) // let the async listener bus drain this query
        val qShuffleBytes = shuffleBytes.get() - bytes0
        val best =
          if (first.isNaN) first // no reruns of a crashing plan
          else if (reps > 1 && first <= repCutoffSec)
            (first +: Seq.fill(reps - 1)(once())).filterNot(_.isNaN).min
          else if (reps > 1 && first <= heavyBudgetSec / 2) {
            val extra = once()
            if (extra.isNaN) first
            else { heavyBudgetSec -= extra; math.min(first, extra) }
          } else first
        (name, best, qShuffleBytes)
      }
    }.filterNot { case (n, t, _) => t.isNaN || failedQueries.contains(n) }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val sb = results.map { case (k, _, b) => "\"" + k + "\":" + b }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val failedJson = failedQueries.map("\"" + _ + "\"").mkString("[", ",", "]")
    val phasesJson = phases.map { case (q, ph) =>
      "\"" + q + "\":" + ph.toSeq.sortBy(_._1)
        .map { case (p, t) => "\"" + p + "\":" + f"$t%.3f" }
        .mkString("{", ",", "}")
    }.mkString("{", ",", "}")
    // The stdout CONTRACT line carries exactly the driver-contract keys
    // ({"metric","value","unit","queries","sf"} + the failure list); the
    // diagnostic columns (per-query shuffle bytes, store-phase splits)
    // stay in the bench_out.json record below — r01..r17 shipped them
    // inline and the 8+ KB line was unparseable in the driver's
    // 2000-char artifact tail. "sf" is emitted as the numeric scale
    // factor parsed from the data directory's trailing sf<N> component
    // (the directory path itself is preserved in bench_out.json).
    val sfNum = "sf([0-9.]+)/*$".r.findFirstMatchIn(sfDir).map(_.group(1))
    val sfJson = sfNum.getOrElse("\"" + sfDir + "\"")
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":$sfJson}"""
    // Full record (contract keys + diagnostics) to a file the judges
    // read directly ($SPARK_GRAFT_BENCH_OUT if set, else bench_out.json)
    val fullLine = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"shuffle_bytes":$sb,"phases":$phasesJson,"failed":$failedJson,"sf":"$sfDir"}"""
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(outPath),
      (fullLine + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outPath: ${e.getMessage}")
    }
    // Quiet the shutdown and print the contract line LAST, after
    // spark.stop(), so no concurrently-logged stderr WARN can interleave
    // with it in a merged stdout+stderr capture.
    spark.sparkContext.setLogLevel("ERROR")
    spark.stop()
    println(line)
    System.out.flush()
    if (failedQueries.nonEmpty) {
      System.err.println(
        s"[bench] ${failedQueries.size} quer${if (failedQueries.size == 1) "y" else "ies"} FAILED: ${failedQueries.mkString(", ")}")
      sys.exit(1)
    }
  }
}
