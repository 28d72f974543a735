package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The recommendation SERVING blend — the endpoint every user of the
  * reference hits on every request
  * (controller.get_recommendations, /root/reference/web/app/controller.py:180-315):
  *
  *  1. look up the user's PRECOMPUTED recommendations (redis `u<id>`,
  *     written by the periodic recompute);
  *  2. drop any the user has rated/watched SINCE the recompute;
  *  3. if fewer than top-N survive, PAD from the popularity fallback
  *     (top movies by votes then avg rating), excluding both the
  *     user's seen items and the already-recommended ids;
  *  4. a user with no precomputed entry gets the pure fallback.
  *
  * Batch re-expression, generalized to ALL users at once: the
  * "recompute moment" is a train-time cutoff — CF recommendations are
  * computed on interactions with ts < cutoff (the snapshot the last
  * model run saw), while serving filters against the FULL history, so
  * post-cutoff activity knocks out stale recs exactly like the
  * reference's recently-watched filter. Pure relational algebra
  * (union + anti-joins + window re-rank) → fully SQL-oracle-checkable.
  *
  * Scale shape: the fallback pool is a global top-`poolSize` aggregate
  * (TakeOrderedAndProject → broadcast); pad candidates are
  * users × pool via broadcast join — linear in users, never a shuffle
  * of the fact table beyond the aggregates already computed.
  */
object Serving {

  def recsServe(spark: SparkSession, sfDir: String, topN: Int = 10,
                poolSize: Int = 200, cutoff: String = "2000-07-01",
                minCommon: Int = 3, maxDegree: Int = ItemCF.DefaultMaxDegree): DataFrame =
    recsServeOn(
      Tables.interactions(spark, sfDir)
        .select(col("user_id"), col("item_id"), col("rating"), col("ts")),
      topN, poolSize, cutoff, minCommon, maxDegree)

  /** [[recsServe]] over an explicit (user_id, item_id, rating, ts)
    * interactions frame — the seam the scale bench
    * ([[graft.BenchScale]]) drives with generator facts.
    */
  private[graft] def recsServeOn(interactions: DataFrame, topN: Int = 10,
                poolSize: Int = 200, cutoff: String = "2000-07-01",
                minCommon: Int = 3, maxDegree: Int = ItemCF.DefaultMaxDegree): DataFrame = {
    val spark = interactions.sparkSession
    // full history: serve-time seen filter + fallback aggregates
    val base = interactions.cache()
    // train-time snapshot: what the last recompute saw
    val snap = base.filter(col("ts") < lit(cutoff).cast("timestamp"))
    val capped = Tables.capDegree(snap, "user_id", "item_id", maxDegree)
      .select(col("user_id"), col("item_id"), col("rating"))
      .cache()

    // 1. precomputed per-user top-N: item-CF scores on the snapshot,
    //    anti-joined against snapshot-seen (as the recompute would)
    val scores = ItemCF.cfScores(capped, minCommon)
    val snapSeen = snap.select(col("user_id"), col("item_id").as("item_j"))
    // top-N via the heap aggregate (see ItemCF.recommend): partial
    // aggregation ships ≤ N rows per user per map partition instead of
    // window-sorting the full scored candidate set; same
    // (score desc, id asc) total order. The later windows here run
    // over ≤ topN (or ≤ poolSize) rows per user — those stay windows.
    graft.functions.TopKAgg.register(spark)
    val cfRecs = scores.join(snapSeen, Seq("user_id", "item_j"), "left_anti")
      .groupBy(col("user_id"))
      .agg(expr(s"graft_topk(score, item_j, $topN)").as("topk"))
      .select(col("user_id"), explode(col("topk")).as("kv"))
      .select(col("user_id"), col("kv.id").as("item_id"), col("kv.score").as("score"))

    // 2. serve-time filter: drop recs rated/watched since the cutoff
    val seen = base.select(col("user_id"), col("item_id"))
    val wSurv = Window.partitionBy(col("user_id"))
      .orderBy(col("score").desc, col("item_id").asc)
    val survivors = cfRecs.join(seen, Seq("user_id", "item_id"), "left_anti")
      .withColumn("rec_rank", row_number().over(wSurv))
      .cache() // feeds the output union AND the pad exclusion/count

    val nSurv = survivors.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_surv"))

    // 3. popularity fallback pool (controller.get_avg_recommendations):
    //    global top items over the FULL history — tiny, broadcast
    val pool = base.filter(col("rating") >= 3.5)
      .groupBy(col("item_id"))
      .agg(round(avg(col("rating")), 4).as("avg_rating"), count(col("user_id")).as("votes"))
      .orderBy(col("votes").desc, col("avg_rating").desc, col("item_id").asc)
      .limit(poolSize)

    // pad candidates: only DEFICIT users (fewer than topN surviving
    // recs — including users with no precomputed entry at all, n_surv
    // null → 0, the reference's pure-fallback branch) ever produce a
    // pad row, so restrict the candidate build to them up front: in a
    // healthy recommender most users have a full top-N, and the
    // users×pool cross, both anti joins, and the pad window all
    // shrink from |users|×pool to |deficit|×pool
    val users = base.select(col("user_id")).distinct()
      .join(nSurv, Seq("user_id"), "left")
      .withColumn("n_surv", coalesce(col("n_surv"), lit(0L)))
      .filter(col("n_surv") < topN)
    val wPad = Window.partitionBy(col("user_id"))
      .orderBy(col("votes").desc, col("avg_rating").desc, col("item_id").asc)
    // the pad exclusion only ever tests pool items, so pre-filter the
    // seen table to them: the anti-join side shrinks from the full
    // fact table to ≤ users×poolSize rows — at 100 TB this is the
    // difference between re-shuffling the corpus and a bounded join.
    // Both exclusion sides then union into ONE anti-join: two separate
    // sort-merge antis re-shuffle the users×pool cross twice before the
    // pad window shuffles it a third time, where the single anti
    // shuffles it once and leaves AQE free to convert to broadcast from
    // the union's RUNTIME size (no eager driver-side size probe, no
    // unconditional-broadcast OOM at 10⁹ users). Measured on the pad
    // branch at sf0.1: 2.6 s → 1.0 s warm. (r17 re-audit: an explicit
    // size-gated broadcast hint — cache + count + broadcastIfSmall —
    // was A/B-measured AGAINST this plan at sf0.1 and lost, 12.3-12.6 s
    // → 13.1-16.4 s full-query: the eager materialization the count
    // needs costs more than the anti's exchange, precisely because AQE
    // already converts it to a broadcast anti at runtime. Left as is.)
    val seenInPool = seen.join(broadcast(pool.select(col("item_id"))), Seq("item_id"), "left_semi")
    val excluded = seenInPool
      .unionByName(survivors.select(col("user_id"), col("item_id")))
    val padded = users.join(broadcast(pool), lit(true))
      .join(excluded, Seq("user_id", "item_id"), "left_anti")
      .withColumn("pad_rn", row_number().over(wPad))
      .filter(col("pad_rn") <= lit(topN) - col("n_surv"))
      .select(
        col("user_id"), col("item_id"),
        (col("n_surv") + col("pad_rn")).as("rec_rank"),
        lit(null).cast("double").as("score"),
        lit("fallback").as("source"))

    // 4. blend: surviving precomputed recs first, fallback pad after
    survivors
      .select(col("user_id"), col("item_id"), col("rec_rank").cast("long").as("rec_rank"),
        col("score"), lit("cf").as("source"))
      .unionByName(padded.select(col("user_id"), col("item_id"),
        col("rec_rank").cast("long").as("rec_rank"), col("score"), col("source")))
  }
}
