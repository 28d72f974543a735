package graft

/** Plan-review helper: dumps formatted physical plans for the headline
  * queries (run with `sbt "Test/runMain graft.ExplainAll [out]"`).
  * Used to audit pushdown / broadcast / partial-agg before each round.
  */
object ExplainAll {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/plans.txt")
    val spark = TestSpark.spark
    val sf = "/root/testdata/sf0.01"
    val w = new java.io.PrintWriter(out)
    val interesting = Seq(
      "q1_agg", "q3_join", "q_movie_stats", "q_top_movies",
      "q_user_top_ratings", "q_recs_fallback", "q_implicit_backfill",
      "q_ratings_etl", "dedup_exact", "knn_brute", "text_tokens",
      "q_decontaminate", "q_seq_pack", "text_repetition",
      "q_sample_curriculum", "q_mix_plan", "q_recs_serve",
      "q_top_movies_paged", "text_redact", "dedup_exact_inc", "dedup_exact_delta",
      "q_skew_join", "dedup_exact_store", "q_item_cooc_store",
      "dedup_minhash_store", "als_implicit",
      "q_ratings_cdc_store", "knn_ivf_store",
      "q_item_cooc_salted", "q_events_props", "q_decontaminate_store",
      "dedup_embed_lsh_wide")
    interesting.foreach { name =>
      w.println(s"========== $name ==========")
      w.println(SparkEntry.queries(name)(spark, sf).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    w.close()
    println(s"plans written to $out")
    spark.stop()
  }
}
