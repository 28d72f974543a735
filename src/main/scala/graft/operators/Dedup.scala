package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators over the `documents` corpus — the
  * training-data-pipeline counterpart of the reference's data hygiene
  * (its prepare_dataset.py dedups users by id; a 100 TB corpus needs
  * content dedup). All signatures are computed map-side with built-in
  * higher-order functions (whole-stage codegen, no UDFs); only the
  * candidate-pair joins shuffle, and those are bucketed by
  * band/shingle so no full cross-join ever forms.
  */
object Dedup {

  private def words(c: Column): Column = split(c, "\\s+")

  /** 3-word shingles (distinct); docs shorter than 3 words fall back to
    * the whole text as a single shingle.
    */
  private val shinglesExpr: Column = {
    val w = words(col("text"))
    when(size(w) >= 3,
      expr("transform(sequence(0, size(split(text, '\\\\s+')) - 3), i -> array_join(slice(split(text, '\\\\s+'), i + 1, 3), ' '))"))
      .otherwise(array(col("text")))
  }

  private def shingled(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), array_distinct(shinglesExpr).as("shingles"))

  /** Exact dedup: group by content hash, keep the smallest doc_id.
    * Output covers every group (n_copies=1 for uniques) so the result
    * is non-empty on corpora without exact dups. One shuffle on the
    * 128-bit content hash; at 100 TB this is the standard
    * hash-partitioned keep-first pass.
    */
  def exact(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .groupBy(md5(col("text")).as("text_md5"))
      .agg(
        min(col("doc_id")).as("keep_doc_id"),
        count(lit(1)).as("n_copies"))

  /** MinHash (64 permutations via seeded xxhash64) + LSH banding
    * (16 bands × 4 rows): signatures map-side, candidate pairs only
    * within equal (band, band-hash) buckets, estimated Jaccard =
    * matching signature positions / 64, thresholded.
    */
  def minhashLsh(spark: SparkSession, sfDir: String, threshold: Double = 0.5): DataFrame = {
    val sigs = shingled(spark, sfDir)
      .select(col("doc_id"), expr(
        "transform(sequence(0, 63), i -> " +
        "  array_min(transform(shingles, s -> xxhash64(concat(s, '#', i)))))"
      ).as("sig"))
      .cache()
    val bands = sigs.select(col("doc_id"), explode(expr(
      "transform(sequence(0, 15), b -> " +
      "  named_struct('band', b, 'bh', xxhash64(array_join(slice(sig, b * 4 + 1, 4), ','))))"
    )).as("e")).select(col("doc_id"), col("e.band"), col("e.bh"))
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val withEst = cand
      .join(sigs.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sig", "sig_a"), Seq("doc_a"))
      .join(sigs.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sig", "sig_b"), Seq("doc_b"))
      .withColumn("est_jaccard", round(
        expr("aggregate(zip_with(sig_a, sig_b, (x, y) -> IF(x = y, 1, 0)), 0, (acc, v) -> acc + v)") / 64.0, 4))
    withEst.filter(col("est_jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("est_jaccard"))
  }

  /** 64-bit SimHash per document (token-hash bit votes, computed
    * per-row with higher-order functions — zero shuffle), plus
    * near-dup pairs found by 4×16-bit band blocking with a Hamming
    * distance cap. Output: one row per near-dup pair.
    */
  def simhash(spark: SparkSession, sfDir: String, maxHamming: Int = 6): DataFrame = {
    val fp = Tables.documents(spark, sfDir)
      .select(col("doc_id"), words(col("text")).as("toks"))
      .withColumn("hs", expr("transform(toks, t -> xxhash64(t))"))
      .withColumn("fp", expr(
        "aggregate(sequence(0, 63), 0L, (acc, i) -> acc | IF(" +
        "  aggregate(hs, 0L, (a, h) -> a + IF((shiftright(h, i) & 1) = 1, 1, -1)) > 0, " +
        "  shiftleft(1L, i), 0L))"))
      .select(col("doc_id"), col("fp"))
      .cache()
    val bands = fp.select(col("doc_id"), col("fp"), explode(expr(
      "transform(sequence(0, 3), b -> named_struct('band', b, 'key', shiftright(fp, b * 16) & 65535))"
    )).as("e")).select(col("doc_id"), col("fp"), col("e.band"), col("e.key"))
    bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.fp").bitwiseXOR(col("b.fp"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact n-gram Jaccard similarity join via a shingle inverted
    * index: pairs form only through shared shingles (the
    * sim-join standard at scale — never all-pairs), then
    * |A∩B| / (|A|+|B|-|A∩B|) thresholded.
    */
  def ngramJaccard(spark: SparkSession, sfDir: String, threshold: Double = 0.8): DataFrame = {
    val sh = shingled(spark, sfDir)
      .select(col("doc_id"), explode(col("shingles")).as("shingle"))
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = sh.as("a").join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(broadcast(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "n_a")), Seq("doc_a"))
      .join(broadcast(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "n_b")), Seq("doc_b"))
      .withColumn("jaccard", round(col("inter") / (col("n_a") + col("n_b") - col("inter")), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** Embedding-cosine near-dup pairs. Norms are precomputed per row
    * (map-side); the pair join is a self-join thresholded on cosine.
    * Brute-force all-pairs is intentional here — it is the exactness
    * baseline; the scale path is [[Similarity.ivfSearch]]'s bucketing.
    */
  def embedCosine(spark: SparkSession, sfDir: String, threshold: Double = 0.45): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("norm", expr("sqrt(aggregate(v, 0D, (acc, x) -> acc + x * x))"))
    val a = e.select(col("vec_id").as("vec_a"), col("v").as("va"), col("norm").as("na"))
    val b = e.select(col("vec_id").as("vec_b"), col("v").as("vb"), col("norm").as("nb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .withColumn("cos", round(
        expr("aggregate(zip_with(va, vb, (x, y) -> x * y), 0D, (acc, x) -> acc + x)") /
          (col("na") * col("nb")), 4))
      .filter(col("cos") >= threshold)
      .select(col("vec_a"), col("vec_b"), col("cos"))
  }
}
