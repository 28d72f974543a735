package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — lay documents end-to-end into fixed token-budget
  * training rows (context windows), the step that turns a cleaned
  * corpus into the batches a trainer actually consumes. Contiguous
  * fill: documents are concatenated in deterministic order and cut
  * every `budget` tokens; a document straddling a cut is flagged
  * `is_split` (the trainer truncates or carries it over).
  *
  * Scale shape — the naive version (one global ORDER BY + running
  * sum) funnels the whole corpus through a single-partition window
  * sort: a non-starter at 100 TB. Instead documents are first dealt
  * into `buckets` deterministic groups (doc_id mod buckets) and packed
  * independently per bucket:
  *  - the window (cumulative token sum) partitions by bucket, so each
  *    bucket sorts in parallel — one shuffle, `buckets`-way parallel,
  *    no global sort anywhere;
  *  - sequence ids are made globally unique by offsetting with
  *    bucket * SeqStride, so downstream consumers see one flat id
  *    space;
  *  - determinism: (bucket, within-bucket doc order) is a pure
  *    function of doc_id, so the packing is layout- and
  *    parallelism-independent — the reproducibility contract the
  *    sampling operators in [[Sampling]] also keep.
  *  In production `buckets` scales with the cluster (≈ total cores);
  *  each bucket's sort is then executor-memory sized.
  */
object SeqPack {

  /** Sequence-id stride per bucket — an upper bound on sequences one
    * bucket can produce. 1e6 sequences × budget tokens per bucket is
    * ample headroom; raise together with `buckets` at larger SFs.
    */
  val SeqStride = 1000000L

  /** @return one row per document: the sequence it starts in, its
    *         token offset inside that sequence, and whether it
    *         straddles a sequence boundary.
    */
  def pack(spark: SparkSession, sfDir: String, budget: Int = 512,
           buckets: Int = 16): DataFrame =
    packOf(Tables.documents(spark, sfDir), budget, buckets)

  /** Core on an injectable corpus (docs: doc_id, text) — spec entry. */
  def packOf(docs: DataFrame, budget: Int = 512, buckets: Int = 16): DataFrame = {
    val w = Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col("doc_id"),
        (col("doc_id") % buckets).as("bucket"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .select(
        col("doc_id"),
        col("bucket"),
        expr(s"bucket * $SeqStride + (cum - n_tokens) div $budget").as("seq_id"),
        ((col("cum") - col("n_tokens")) % budget).as("seq_offset"),
        col("n_tokens"),
        expr(s"((cum - n_tokens) div $budget) != ((cum - 1) div $budget)").as("is_split"))
      .orderBy(col("doc_id"))
  }
}
