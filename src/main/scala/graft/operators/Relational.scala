package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Spark-first re-expressions of the reference service's SQL surface
  * (anskarl/movie_rec, /root/reference/web/app/controller.py and
  * recommender/statistics.py). Each query is a pure logical plan over
  * [[graft.Tables.interactions]]; aggregates surfaced to the oracle are
  * rounded to 4 decimals for cross-engine float parity.
  */
object Relational {

  /** The interactions ETL itself (SURVEY §2 `q_ratings_etl`): the
    * reference's ratings table materialization (prepare_dataset.py:170).
    */
  def ratingsEtl(spark: SparkSession, sfDir: String): DataFrame =
    Tables.interactions(spark, sfDir)
      .select(col("user_id"), col("item_id"), col("rating"), col("is_implicit"))

  /** statistics.py:19 `calc_rating_stats`: per-item explicit-rating
    * stats with a minimum-voter threshold. Single shuffle on item_id
    * with map-side partial aggregation; HAVING is a post-agg filter.
    */
  def movieStats(spark: SparkSession, sfDir: String, usersLowerLimit: Int = 5): DataFrame =
    Tables.interactions(spark, sfDir)
      .filter(!col("is_implicit"))
      .groupBy(col("item_id"))
      .agg(
        count(col("user_id")).as("count_users"),
        round(avg(col("rating")), 4).as("avg_rating"))
      .filter(col("count_users") > usersLowerLimit)

  /** controller.py:77 `get_top_movies`: most-voted, highest-rated items
    * with the item dimension joined in. Aggregate-then-broadcast-join:
    * the agg shrinks the fact side to |items| before the dim join, and
    * TakeOrderedAndProject keeps the global top-N merge at N rows per
    * partition. Ties broken by item_id for determinism.
    */
  def topMovies(spark: SparkSession, sfDir: String, topN: Int = 100, ratingLimit: Double = 3.5): DataFrame = {
    val agg = Tables.interactions(spark, sfDir)
      .filter(col("rating") >= ratingLimit)
      .groupBy(col("item_id"))
      .agg(
        round(avg(col("rating")), 4).as("avg_rating"),
        count(col("user_id")).as("votes"))
    agg.join(broadcast(Tables.part(spark, sfDir)), agg("item_id") === col("p_partkey"))
      .select(col("item_id"), col("avg_rating"), col("votes"), col("p_name"), col("p_brand"))
      .orderBy(col("votes").desc, col("avg_rating").desc, col("item_id").asc)
      .limit(topN)
  }

  /** Paged [[topMovies]] — the reference's listing endpoints take a
    * `limit` request arg (api/v1/routes.py:77 `request.args.get(
    * 'limit', 100)`); generalized to (skip, count) pages. The page is
    * carved AFTER a `limit(skip + count)`: Spark plans
    * TakeOrderedAndProject for orderBy+limit (per-partition top-(skip
    * +count) + driver merge), so the subsequent global window ranks
    * only skip+count rows — never a full-table single-partition sort.
    */
  def topMoviesPaged(spark: SparkSession, sfDir: String, skip: Int = 10, count: Int = 10,
                     ratingLimit: Double = 3.5): DataFrame = {
    val page = Window.orderBy(
      col("votes").desc, col("avg_rating").desc, col("item_id").asc)
    topMovies(spark, sfDir, topN = skip + count, ratingLimit = ratingLimit)
      .withColumn("rn", row_number().over(page))
      .filter(col("rn") > skip && col("rn") <= skip + count)
  }

  /** controller.py:60 `get_user_top_ratings`, generalized to ALL users
    * at once (per-user top-k via window rank — one shuffle by user_id,
    * no global sort). The reference does ORDER BY rating DESC, ts DESC
    * LIMIT k for a single user; at 100 TB the all-users form is the
    * operator that matters.
    */
  def userTopRatings(spark: SparkSession, sfDir: String, k: Int = 5): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("rating").desc, col("ts").desc, col("item_id").asc)
    Tables.interactions(spark, sfDir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("user_id"), col("item_id"), col("rating"), col("rn"))
  }

  /** [[userTopRatings]] re-expressed with the heap-based
    * [[graft.functions.TopKAgg]] aggregate: identical results (modulo
    * the ts tiebreak), but map-side partial top-k instead of a full
    * per-user sort — at scale the shuffle carries ≤ k rows per user
    * per map partition instead of every interaction.
    */
  def userTopKAgg(spark: SparkSession, sfDir: String, k: Int = 5): DataFrame = {
    graft.functions.TopKAgg.register(spark)
    Tables.interactions(spark, sfDir)
      .groupBy(col("user_id"))
      .agg(expr(s"graft_topk(rating, item_id, $k)").as("topk"))
      .select(col("user_id"), posexplode(col("topk")))
      .select(
        col("user_id"),
        col("col.id").as("item_id"),
        col("col.score").as("rating"),
        (col("pos") + 1).as("rn"))
  }

  /** Paged [[userTopRatings]] (api/v1/routes.py:61's `limit` arg as a
    * (skip, count) page): the window rank is already per-user, so a
    * page is just a rank band — same single shuffle by user_id, rows
    * `skip+1 .. skip+count` per user.
    */
  def userTopRatingsPaged(spark: SparkSession, sfDir: String, skip: Int = 5, count: Int = 5): DataFrame =
    userTopRatings(spark, sfDir, k = skip + count)
      .filter(col("rn") > skip)

  /** controller.py:47 `get_user_ratings` (latest first), generalized to
    * all users: latest-k events per user from the event stream.
    * Timestamps surfaced as epoch millis (ns-precision parquet would
    * otherwise diverge between Spark µs and DuckDB ns).
    */
  def userLatest(spark: SparkSession, sfDir: String, k: Int = 5): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(spark, sfDir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(
        col("user_id"), col("event_id"),
        unix_millis(col("ts")).as("ts_ms"),
        col("event_type"), col("rn"))
  }

  /** Paged [[userLatest]] (api/v1/routes.py:52's `limit` arg as a
    * (skip, count) page over the latest-first per-user ranking).
    */
  def userLatestPaged(spark: SparkSession, sfDir: String, skip: Int = 5, count: Int = 5): DataFrame =
    userLatest(spark, sfDir, k = skip + count)
      .filter(col("rn") > skip)

  /** controller.py:262 `get_avg_recommendations`: cold-start fallback —
    * globally top items (votes desc, avg desc) LEFT ANTI JOIN the
    * target user's already-seen items, limit N. The anti side (one
    * user's history) is broadcast-small by construction.
    */
  def recsFallback(spark: SparkSession, sfDir: String, userId: Long = 1L, topN: Int = 20, defaultRating: Double = 3.5): DataFrame = {
    val inter = Tables.interactions(spark, sfDir)
    val top = inter
      .filter(col("rating") >= defaultRating)
      .groupBy(col("item_id"))
      .agg(
        round(avg(col("rating")), 4).as("avg_rating"),
        count(col("user_id")).as("votes"))
    val seen = inter.filter(col("user_id") === userId).select(col("item_id")).distinct()
    top.join(broadcast(seen), Seq("item_id"), "left_anti")
      .orderBy(col("votes").desc, col("avg_rating").desc, col("item_id").asc)
      .limit(topN)
  }

  /** controller.py:150 `set_movie_watched`: implicit interactions take
    * the item's explicit average rating when stats exist, else the 3.5
    * default. Expressed as a left join onto the stats aggregate +
    * coalesce — the reference's redis lookup becomes a broadcast join
    * against the (much smaller) per-item aggregate.
    */
  def implicitBackfill(spark: SparkSession, sfDir: String, usersLowerLimit: Int = 5, defaultRating: Double = 3.5): DataFrame = {
    val inter = Tables.interactions(spark, sfDir)
    val stats = inter
      .filter(!col("is_implicit"))
      .groupBy(col("item_id"))
      .agg(round(avg(col("rating")), 4).as("item_avg"), count(col("user_id")).as("cnt"))
      .filter(col("cnt") > usersLowerLimit)
      .select(col("item_id"), col("item_avg"))
    inter.filter(col("is_implicit"))
      .join(broadcast(stats), Seq("item_id"), "left")
      .select(
        col("user_id"), col("item_id"),
        coalesce(col("item_avg"), lit(defaultRating)).as("implicit_rating"))
  }

  /** controller.py:330 `round_rating`: half-star normalization of a raw
    * score stream — distinct normalized values of events.value scaled
    * into the 0.5..5.0 band.
    */
  def roundHalf(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(
        col("event_id"),
        round(least(lit(5.0), greatest(lit(0.5), round(col("value") / 40.0 * 2.0) / 2.0)), 1).as("half_star"))

  /** controller.py:19/73 point lookups (user info, movie info) — fused
    * into one result: the customer row and its nation, keyed. At scale
    * this is a partition-pruned / index-like read, expressed relationally.
    */
  def pointLookup(spark: SparkSession, sfDir: String, custkey: Long = 1L): DataFrame = {
    val c = Tables.customer(spark, sfDir).filter(col("c_custkey") === custkey)
    c.join(broadcast(Tables.nation(spark, sfDir)), c("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"), col("n_name"))
  }
}
