package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding subword vocabulary — training and encoding
  * (Sennrich, Haddow, Birch 2016, "Neural Machine Translation of Rare
  * Words with Subword Units"; the tokenizer-training step every LLM
  * data pipeline runs after cleaning/dedup).
  *
  * The 100 TB shape: BPE training never iterates over the corpus —
  * every published trainer (the reference implementation's
  * learn_bpe, HF tokenizers, sentencepiece) trains from the WORD
  * FREQUENCY TABLE, because merge counts are a pure function of it.
  * So the corpus-scale work here is ONE distributed word count (a
  * single shuffle, map-side partial-agg'd), truncated to the
  * `maxWords` most frequent words (standard practice — rare-word
  * tails contribute ~0 to pair counts); the merge loop then runs
  * driver-side over that bounded table (≤ maxWords rows — the one
  * sanctioned driver pull, same contract as the O(nlist) centroid
  * collects). Encoding is map-side: the learned merge ranks broadcast
  * to every task, each word segmented independently.
  */
object Bpe {

  /** End-of-word marker (the Sennrich convention): distinguishes
    * "est</w>" in "widest" from "est" in "estimate".
    */
  private val Eow = "</w>"

  /** Learn `nMerges` BPE merges from the corpus word counts.
    * Output: (rank, left, right, merged, pair_count) — rank is merge
    * order, pair_count the frequency that won the rank. Deterministic:
    * ties break lexicographically on (left, right), so the learned
    * vocabulary is engine- and partitioning-independent.
    */
  def bpeTrain(spark: SparkSession, sfDir: String, nMerges: Int = 50,
               maxWords: Int = 100000): DataFrame =
    bpeTrainOf(spark, Tables.documents(spark, sfDir), nMerges, maxWords)

  /** Core on an injectable (doc_id, text) corpus — spec entry. */
  private[graft] def bpeTrainOf(spark: SparkSession, docs: DataFrame,
      nMerges: Int, maxWords: Int): DataFrame = {
    import spark.implicits._
    val counts = wordCounts(docs, maxWords)
    val merges = learnMerges(counts, nMerges)
    merges.zipWithIndex
      .map { case ((l, r, f), i) => (i, l, r, l + r, f) }
      .toDF("rank", "left", "right", "merged", "pair_count")
  }

  /** The one corpus-scale pass: distributed word count, truncated to
    * the `maxWords` most frequent (ties by word — deterministic).
    */
  private def wordCounts(docs: DataFrame, maxWords: Int): Seq[(String, Long)] =
    docs.select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word").asc)
      .limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  /** Classic BPE merge loop over the word table: words as symbol
    * sequences (chars + [[Eow]]), repeatedly merge the most frequent
    * adjacent pair. Pure driver compute over ≤ maxWords rows.
    */
  private[graft] def learnMerges(counts: Seq[(String, Long)],
      nMerges: Int): Seq[(String, String, Long)] = {
    var words: Seq[(Array[String], Long)] = counts.map { case (w, n) =>
      ((w.map(_.toString) :+ Eow).toArray, n)
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var i = 0
    while (i < nMerges) {
      val pairs = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, n) =>
        var j = 0
        while (j + 1 < syms.length) {
          val k = (syms(j), syms(j + 1))
          pairs(k) = pairs.getOrElse(k, 0L) + n
          j += 1
        }
      }
      if (pairs.isEmpty) i = nMerges
      else {
        val ((l, r), f) = pairs.minBy { case ((a, b), n) => (-n, a, b) }
        out += ((l, r, f))
        words = words.map { case (syms, n) =>
          val merged = scala.collection.mutable.ArrayBuffer.empty[String]
          var j = 0
          while (j < syms.length) {
            if (j + 1 < syms.length && syms(j) == l && syms(j + 1) == r) {
              merged += (l + r); j += 2
            } else { merged += syms(j); j += 1 }
          }
          (merged.toArray, n)
        }
        i += 1
      }
    }
    out.toSeq
  }

  /** Segment one word with learned merges, by rank (the standard
    * greedy-by-rank BPE encode): repeatedly apply the lowest-rank
    * applicable merge until none applies.
    */
  private[graft] def encodeWord(word: String,
      ranks: Map[(String, String), Int]): Array[String] = {
    var syms: Array[String] = (word.map(_.toString) :+ Eow).toArray
    var done = false
    while (!done && syms.length > 1) {
      var best = Int.MaxValue
      var bestAt = -1
      var j = 0
      while (j + 1 < syms.length) {
        val rk = ranks.getOrElse((syms(j), syms(j + 1)), Int.MaxValue)
        if (rk < best) { best = rk; bestAt = j }
        j += 1
      }
      if (bestAt < 0) done = true
      else {
        val merged = new Array[String](syms.length - 1)
        System.arraycopy(syms, 0, merged, 0, bestAt)
        merged(bestAt) = syms(bestAt) + syms(bestAt + 1)
        System.arraycopy(syms, bestAt + 2, merged, bestAt + 1,
          syms.length - bestAt - 2)
        syms = merged
      }
    }
    syms
  }

  /** Tokenize the corpus with a TRAINED vocabulary — the production
    * counterpart of `text_token_count`'s regex approximation: per-doc
    * subword count plus the exact char/token compression ratio.
    * Encoding is map-side (merge ranks broadcast, each word segmented
    * independently — mapPartitions like the binary codecs: greedy
    * rank-loop segmentation has no Catalyst form); one corpus scan,
    * zero shuffle. Registered `text_bpe_encode` trains on the SAME
    * corpus first (self-contained at any SF); production would load
    * persisted merges instead.
    */
  def bpeEncode(spark: SparkSession, sfDir: String, nMerges: Int = 50,
                maxWords: Int = 100000): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val merges = bpeTrainOf(spark, docs, nMerges, maxWords)
      .select(col("rank"), col("left"), col("right"))
      .collect().map(r => ((r.getString(1), r.getString(2)), r.getInt(0))).toMap
    bpeEncodeOf(spark, docs, merges)
  }

  /** Persist a trained merge table as a tiny parquet artifact —
    * the tokenizer's [[graft.operators.Decontamination.buildBloomArtifact]]
    * twin: train ONCE (the corpus-scale word count + driver merge
    * loop), freeze the result, and let every later encode load it.
    * The artifact is ≤ `nMerges` rows of (rank, left, right, merged,
    * pair_count) — driver/broadcast scale by construction.
    */
  def buildBpeArtifact(spark: SparkSession, docs: DataFrame, path: String,
      nMerges: Int = 50, maxWords: Int = 100000): Unit =
    bpeTrainOf(spark, docs, nMerges, maxWords)
      .coalesce(1).write.mode("overwrite").parquet(path)

  /** Load a persisted merge table back as the encode-side rank map.
    * The collect is bounded by the artifact's nMerges row count —
    * the same sanctioned pull as the bloom-bytes / centroid loads.
    */
  def loadBpeArtifact(spark: SparkSession, path: String): Map[(String, String), Int] =
    spark.read.parquet(path)
      .select(col("rank"), col("left"), col("right"))
      .collect().map(r => ((r.getString(1), r.getString(2)), r.getInt(0))).toMap

  /** Encode against a LOADED artifact — [[bpeEncodeOf]] with the
    * merge table coming from disk instead of an in-query retrain.
    */
  def encodeWithArtifact(spark: SparkSession, docs: DataFrame,
      artifactPath: String): DataFrame =
    bpeEncodeOf(spark, docs, loadBpeArtifact(spark, artifactPath))

  /** The vocabulary-artifact LIFECYCLE as a registered query
    * (`text_bpe_store`): train + persist the merge table, then
    * encode the corpus from the LOADED artifact — the deployment
    * regime [[bpeEncode]]'s scaladoc promises ("production would
    * load persisted merges"), now a first-class rung like the bloom
    * decontamination artifact. Output is byte-identical to
    * [[bpeEncode]] at the same knobs (BpeSpec round-trips the
    * artifact and pins the parity); rows-only — the greedy merge
    * loop is not SQL-expressible.
    */
  def bpeEncodeStored(spark: SparkSession, sfDir: String, nMerges: Int = 50,
      maxWords: Int = 100000,
      artifactDir: String = "target/graft-artifacts"): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest((sfDir + s"#bpe$nMerges").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(8)
    val path = s"$artifactDir/bpe_merges_$digest"
    graft.PhaseTimer.timed("text_bpe_store", "train") {
      buildBpeArtifact(spark, docs, path, nMerges, maxWords)
    }
    encodeWithArtifact(spark, docs, path)
  }

  /** Core on an injectable corpus + trained ranks — spec entry. */
  private[graft] def bpeEncodeOf(spark: SparkSession, docs: DataFrame,
      ranks: Map[(String, String), Int]): DataFrame = {
    import spark.implicits._
    val b = spark.sparkContext.broadcast(ranks)
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val rk = b.value
        it.map { case (id, text) =>
          val words = text.split(" ").filter(_.nonEmpty)
          var n = 0
          words.foreach { w => n += encodeWord(w, rk).length }
          (id, n, text.length)
        }
      }
      .toDF("doc_id", "n_bpe_tokens", "n_chars")
      .withColumn("chars_per_token",
        when(col("n_bpe_tokens") > 0,
          round(col("n_chars").cast("double") / col("n_bpe_tokens"), 4)))
  }
}
