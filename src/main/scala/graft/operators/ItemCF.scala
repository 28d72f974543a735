package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Neighborhood (item-item) collaborative filtering — the classic
  * complement to the matrix-factorization path in
  * [[graft.recommender.Als]]. The reference README frames its engine
  * as "user-item collaborative filtering" with SVD as the chosen
  * variant; the item-item neighborhood variant is the other standard
  * member of that family, and at scale it is a pure sparse-join
  * computation (no training loop at all).
  *
  * All arithmetic is exact in binary (half-star ratings → quarter-step
  * products), so the cosine similarities are engine-deterministic and
  * fully SQL-oracle-checkable — unlike the ALS path.
  */
object ItemCF {

  /** Market-basket co-occurrence: item pairs sharing users. The pair
    * space forms ONLY through the per-user self-join (sparse — never
    * |items|² ), with map-side pruning of single-interaction users
    * implicit in the join itself.
    */
  def cooccurrence(spark: SparkSession, sfDir: String, minUsers: Int = 3): DataFrame = {
    val i = Tables.interactions(spark, sfDir).select(col("user_id"), col("item_id"))
    val a = i.select(col("user_id"), col("item_id").as("item_a"))
    val b = i.select(col("user_id"), col("item_id").as("item_b"))
    a.join(b, Seq("user_id"))
      .filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("n_users"))
      .filter(col("n_users") >= minUsers)
  }

  /** Item-item cosine similarity over user-rating vectors:
    * sim(i,j) = Σ_u r_ui·r_uj / (‖r_i‖·‖r_j‖), pairs formed through
    * shared users only, norms precomputed per item (broadcastable).
    */
  def itemSimilarity(spark: SparkSession, sfDir: String, minCommon: Int = 3, minSim: Double = 0.0): DataFrame = {
    val i = Tables.interactions(spark, sfDir)
      .select(col("user_id"), col("item_id"), col("rating"))
    val norms = i.groupBy(col("item_id"))
      .agg(sqrt(sum(col("rating") * col("rating"))).as("norm"))
    val a = i.select(col("user_id"), col("item_id").as("item_a"), col("rating").as("ra"))
    val b = i.select(col("user_id"), col("item_id").as("item_b"), col("rating").as("rb"))
    val dots = a.join(b, Seq("user_id"))
      .filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(sum(col("ra") * col("rb")).as("dot"), count(lit(1)).as("n_common"))
      .filter(col("n_common") >= minCommon)
    dots
      .join(broadcast(norms.withColumnRenamed("item_id", "item_a").withColumnRenamed("norm", "na")), Seq("item_a"))
      .join(broadcast(norms.withColumnRenamed("item_id", "item_b").withColumnRenamed("norm", "nb")), Seq("item_b"))
      .withColumn("sim", round(col("dot") / (col("na") * col("nb")), 4))
      .filter(col("sim") >= minSim)
      .select(col("item_a"), col("item_b"), col("n_common"), col("sim"))
  }

  /** User-user cosine similarity over item-rating vectors — the third
    * member of the CF family (MF in [[graft.recommender.Als]],
    * item-item above). Same sparse-join shape with the roles swapped:
    * pairs form through shared items, norms broadcast per user.
    */
  def userSimilarity(spark: SparkSession, sfDir: String, minCommon: Int = 3, minSim: Double = 0.0): DataFrame = {
    val i = Tables.interactions(spark, sfDir)
      .select(col("user_id"), col("item_id"), col("rating"))
    val norms = i.groupBy(col("user_id"))
      .agg(sqrt(sum(col("rating") * col("rating"))).as("norm"))
    val a = i.select(col("item_id"), col("user_id").as("user_a"), col("rating").as("ra"))
    val b = i.select(col("item_id"), col("user_id").as("user_b"), col("rating").as("rb"))
    val dots = a.join(b, Seq("item_id"))
      .filter(col("user_a") < col("user_b"))
      .groupBy(col("user_a"), col("user_b"))
      .agg(sum(col("ra") * col("rb")).as("dot"), count(lit(1)).as("n_common"))
      .filter(col("n_common") >= minCommon)
    dots
      .join(broadcast(norms.withColumnRenamed("user_id", "user_a").withColumnRenamed("norm", "na")), Seq("user_a"))
      .join(broadcast(norms.withColumnRenamed("user_id", "user_b").withColumnRenamed("norm", "nb")), Seq("user_b"))
      .withColumn("sim", round(col("dot") / (col("na") * col("nb")), 4))
      .filter(col("sim") >= minSim)
      .select(col("user_a"), col("user_b"), col("n_common"), col("sim"))
  }

  /** Item-CF recommendations for all users: score(u, j) =
    * Σ_{i ∈ rated(u)} sim(i, j) · r_ui over the top-similar pairs,
    * excluding already-seen items — the neighborhood twin of
    * Als.topN's anti-testset semantics.
    */
  def recommend(spark: SparkSession, sfDir: String, topN: Int = 10, minCommon: Int = 3): DataFrame = {
    // cache: the union below consumes sims twice — uncached, the whole
    // shared-user dots chain would recompute per branch
    val sims = itemSimilarity(spark, sfDir, minCommon).cache()
    // symmetrize: sim table stores item_a < item_b only
    val sym = sims.select(col("item_a").as("item_i"), col("item_b").as("item_j"), col("sim"))
      .unionAll(sims.select(col("item_b").as("item_i"), col("item_a").as("item_j"), col("sim")))
    val ratings = Tables.interactions(spark, sfDir)
      .select(col("user_id"), col("item_id").as("item_i"), col("rating"))
    // decimal product keeps the weighted sum exact (sim is a rounded
    // 4-decimal value, rating a half-star), and the final round happens
    // IN the decimal domain — rounding after a double cast diverges
    // between engines when the exact sum sits on a .xxxx5 boundary
    val scores = ratings.join(sym, Seq("item_i"))
      .groupBy(col("user_id"), col("item_j"))
      .agg(round(sum(col("sim").cast("decimal(12,4)") * col("rating").cast("decimal(8,2)")), 4)
        .cast("double").as("score"))
    val seen = ratings.select(col("user_id"), col("item_i").as("item_j"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("score").desc, col("item_j").asc)
    scores.join(seen, Seq("user_id", "item_j"), "left_anti")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= topN)
      .select(col("user_id"), col("item_j").as("item_id"), col("score"), col("rn"))
  }
}
