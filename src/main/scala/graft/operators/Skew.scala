package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
}
