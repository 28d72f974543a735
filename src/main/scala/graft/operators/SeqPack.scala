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

  // ----- truncation-free packing (best-fit decreasing) --------------

  /** One placed piece of the best-fit packing: `piece` indexes a
    * long document's budget-sized chunks (0 for whole docs), `seq_id`
    * the training row it landed in, `seq_offset` its token offset
    * there.
    */
  private[graft] case class Placed(doc_id: Long, piece: Int, n_tokens: Int,
      seq_id: Long, seq_offset: Int)

  /** Truncation-free sequence packing via BEST-FIT DECREASING —
    * the published alternative to contiguous fill (Ding et al. 2024,
    * "Fewer Truncations Improve Language Modeling": mid-document cuts
    * measurably hurt the trained model; pack whole documents
    * bin-packing style and pad the slack instead). Documents longer
    * than the budget are first chunked into budget-sized pieces (the
    * paper's rule — only a document that cannot fit any window is
    * ever cut); every piece then lands WHOLE in some sequence:
    * `is_split` by construction never happens below `budget`.
    *
    * Scale shape — bin packing is sequential, so it runs per BUCKET
    * (the [[packOf]] deal): pieces deal into `buckets` deterministic
    * groups and each group packs independently inside one
    * `flatMapGroups` task. The HONEST per-task memory bound is the
    * whole bucket's piece list, not just its open bins: the
    * length-DESC sort materializes ~`pieces/buckets` 16-byte structs
    * in one array before packing begins (inherent to sequential bin
    * packing — BFD must see its longest piece first). That is why
    * `buckets` must scale with the CORPUS, not stay a constant: the
    * registered entry derives it from the exact piece count
    * ([[deriveBfdBuckets]], ~[[PiecesPerBucket]] pieces → a few MB of
    * sort buffer per task), the [[Similarity.deriveSemanticNlist]]
    * precedent. Within a bucket: pieces sorted by length DESC
    * (doc_id, piece tie-break), each placed into the bin with the
    * SMALLEST sufficient remainder (a TreeSet ceiling query — O(n log
    * n) per bucket, the classic BFD), new bin when none fits.
    * Deterministic: ordering and tie-breaks are pure functions of
    * (length, doc_id, piece), so the packing is layout- and
    * parallelism-independent.
    *
    * Output: one row per PIECE — (doc_id, piece, n_tokens, seq_id,
    * seq_offset); seq ids globally unique via the bucket stride.
    */
  /** Target pieces per BFD bucket — sized so one task's sort buffer
    * (16-byte piece structs) stays a few MB and its bin count stays
    * far under [[SeqStride]].
    */
  val PiecesPerBucket = 262144L

  /** Scale-derived BFD bucket count: ~[[PiecesPerBucket]] pieces per
    * bucket, next power of two, clamped to [16, 2^20]. 4.2M pieces
    * derive 16 (the old constant); 1e10 pieces (a ~100 TB corpus at
    * 512-token docs) derive 65536 — per-task state flat either way.
    */
  private[graft] def deriveBfdBuckets(nPieces: Long): Int = {
    val want = (nPieces + PiecesPerBucket - 1) / PiecesPerBucket
    var p = 1L
    while (p < want) p <<= 1
    math.min(1 << 20, math.max(16, p)).toInt
  }

  /** Registered entry: `buckets` ≤ 0 derives from the EXACT piece
    * count (one narrow aggregate over token counts — the only scan
    * added by the derivation, and the honest input: a long-document
    * corpus has many more pieces than documents).
    */
  def packBestFit(spark: SparkSession, sfDir: String, budget: Int = 512,
                  buckets: Int = -1): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val b =
      if (buckets > 0) buckets
      else {
        val nPieces = docs
          .select(size(split(col("text"), " ")).cast("long").as("n"))
          .agg(coalesce(sum(expr(s"(n + $budget - 1) div $budget")), lit(0L)))
          .head.getLong(0)
        deriveBfdBuckets(nPieces)
      }
    packBestFitOf(docs, budget, b)
  }

  /** Core on an injectable corpus — spec entry. */
  def packBestFitOf(docs: DataFrame, budget: Int = 512,
                    buckets: Int = 16): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val pieces = docs
      .select(col("doc_id"), size(split(col("text"), " ")).as("n_tokens"))
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(0, (n_tokens - 1) div $budget), p -> " +
        s"named_struct('piece', cast(p as int), " +
        s"'len', cast(least(n_tokens - p * $budget, $budget) as int)))")).as("e"))
      .select(col("doc_id"), col("e.piece").as("piece"), col("e.len").as("len"))
      .as[(Long, Int, Int)]
    pieces
      .groupByKey { case (docId, _, _) => (docId % buckets).toInt }
      .flatMapGroups { (bucket: Int, it: Iterator[(Long, Int, Int)]) =>
        val sorted = it.toArray.sortBy { case (id, p, len) => (-len, id, p) }
        // open bins by (remaining, binId): ceiling query = best fit
        val open = scala.collection.mutable.TreeSet.empty[(Int, Int)]
        val fill = scala.collection.mutable.ArrayBuffer.empty[Int] // binId -> used
        sorted.map { case (id, p, len) =>
          val slot = open.minAfter((len, -1))
          val bin = slot match {
            case Some((rem, b)) => open.remove((rem, b)); b
            case None => fill += 0; fill.length - 1
          }
          val off = fill(bin)
          fill(bin) = off + len
          if (budget - fill(bin) > 0) open.add((budget - fill(bin), bin))
          Placed(id, p, len, bucket.toLong * SeqStride + bin, off)
        }.iterator
      }
      .toDF()
  }
}
