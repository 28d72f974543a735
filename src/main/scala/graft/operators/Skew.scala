package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins.
  *
  * When one join key carries a disproportionate share of rows, the
  * task holding that key's partition straggles (or OOMs) while the
  * rest of the cluster idles. Two standard answers, both provided:
  *
  *  1. AQE's runtime skew-join splitting
  *     (`spark.sql.adaptive.skewJoin.enabled`, on by default in our
  *     sessions) — handles skew detected at shuffle-read time for
  *     sort-merge joins.
  *  2. Explicit salting (this object) — deterministic, works for any
  *     join the optimizer can't rescue (e.g. aggregation-after-join
  *     pipelines, or when statistics mislead AQE): the skewed fact
  *     side gets a salt in [0, salts) derived from stable row content,
  *     the dimension side is replicated `salts` times, and the join
  *     key becomes (key, salt) — splitting each hot key across
  *     `salts` tasks.
  */
object Skew {

  /** Deterministic salt from stable columns (NOT rand(): retries and
    * speculative tasks must re-derive the same salt or the join drops/
    * duplicates rows).
    */
  def salt(salts: Int, stableCols: Column*): Column =
    pmod(hash(stableCols: _*), lit(salts))

  /** Inner equi-join of a skewed fact to a (small-ish) table,
    * hot keys split across `salts` partitions. `factSaltSource`
    * should be stable, high-cardinality fact columns.
    */
  def saltedJoin(fact: DataFrame, other: DataFrame, key: String, salts: Int,
                 factSaltSource: Seq[String] = Nil): DataFrame = {
    val src: Seq[Column] =
      if (factSaltSource.nonEmpty) factSaltSource.map(col)
      else fact.columns.toIndexedSeq.map(col)
    val saltedFact = fact.withColumn("__salt", salt(salts, src: _*))
    val replicated = other
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** [[saltedJoin]] registered end-to-end (query `q_skew_join`) so the
    * mitigation is VALUE-gated like every other operator, not just
    * spec-sampled: lineitem is mapped onto a deliberately skewed key
    * (80% of rows collapse onto hot_key 0 — the one-customer-dominates
    * shape that straggles or OOMs an unsalted shuffle join), joined to
    * a derived 100-row dimension through the salted (key, salt) pair —
    * each hot key split across `salts` tasks — then aggregated per
    * dimension attribute. The SQL oracle is the PLAIN join + aggregate:
    * the gate passes only if salting changed the distribution of work
    * and nothing else.
    */
  def saltedJoinDemo(spark: SparkSession, sfDir: String, salts: Int = 16): DataFrame = {
    val fact = graft.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
      .withColumn("hot_key",
        when(col("l_orderkey") % 100 < 80, lit(0L))
          .otherwise(col("l_orderkey") % 100))
    val dim = spark.range(0, 100).select(
      col("id").as("hot_key"),
      concat(lit("seg"), (col("id") % 4).cast("string")).as("segment"))
    saltedJoin(fact, dim, "hot_key", salts, Seq("l_orderkey", "l_partkey"))
      .groupBy(col("segment"))
      .agg(
        count(lit(1)).as("n_rows"),
        round(sum(col("l_quantity")), 2).as("sum_qty"))
  }
}
