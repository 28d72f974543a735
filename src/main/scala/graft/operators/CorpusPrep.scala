package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The end-to-end training-corpus preparation pipeline — the
  * composition a 100 TB prep run actually executes, as ONE query:
  * quality gate → deterministic subsample → exact dedup.
  *
  * Counterpart of the reference's dataset hygiene pass
  * (prototype/prepare_dataset.py:30-70 drops unusable rows before
  * modelling); here the corpus analogue over `documents`.
  *
  * Stage order is chosen for scale, not narrative:
  *  1. quality gate — pure per-row column arithmetic, prunes map-side
  *     before anything shuffles;
  *  2. sample gate on the CONTENT hash prefix — also map-side. Gating
  *     on md5(text) rather than doc_id makes the gate commute with the
  *     content-keyed dedup (a duplicate group is kept or dropped as a
  *     unit), so it can run before the shuffle instead of after;
  *  3. exact dedup keep-min-doc_id — the single shuffle, over rows
  *     already thinned by both gates.
  */
object CorpusPrep {

  def prep(spark: SparkSession, sfDir: String, minTokens: Int = 10,
           minTtr: Double = 0.3, thr256: Int = 128): DataFrame = {
    val toks = split(col("text"), " ")
    val w = Window.partitionBy(col("text_md5")).orderBy(col("doc_id").asc)
    Tables.documents(spark, sfDir)
      .withColumn("n_tokens", size(toks))
      .withColumn("type_token_ratio",
        round(size(array_distinct(toks)).cast("double") / size(toks), 4))
      .filter(col("n_tokens") >= minTokens && col("type_token_ratio") >= minTtr)
      .withColumn("text_md5", md5(col("text")))
      .filter(substring(col("text_md5"), 1, 2) < lit(f"$thr256%02x"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        col("n_tokens"), col("type_token_ratio"))
  }
}
