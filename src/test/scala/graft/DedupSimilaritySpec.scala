package graft

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupSimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("exact dedup partitions the corpus (group sizes sum to doc count)") {
    val total = Dedup.exact(spark, sf).agg(sum("n_copies")).head().getLong(0)
    assert(total === Tables.documents(spark, sf).count())
  }

  test("minhash estimate tracks exact ngram jaccard on shared pairs") {
    val est = Dedup.minhashLsh(spark, sf).withColumnRenamed("est_jaccard", "est")
    val exact = Dedup.ngramJaccard(spark, sf, threshold = 0.5)
    val joined = est.join(exact, Seq("doc_a", "doc_b")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(math.abs(r.getAs[Double]("est") - r.getAs[Double]("jaccard")) < 0.2)
    }
  }

  test("simhash near-dup pairs have symmetric, bounded hamming") {
    val rows = Dedup.simhash(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
      assert(r.getAs[Int]("hamming") <= 6)
    }
  }

  test("knnBrute returns k ranked neighbors per query, no self-match") {
    val df = Similarity.knnBrute(spark, sf, nQueries = 3, k = 5).cache()
    assert(df.count() === 15)
    assert(df.filter(col("query_id") === col("neighbor_id")).count() === 0)
    val worstFirst = df.filter(col("rn") === 1).agg(min("cos")).head().getDouble(0)
    val bestLast = df.filter(col("rn") === 5).agg(max("cos")).head().getDouble(0)
    assert(worstFirst >= bestLast)
    df.unpersist()
  }

  test("IVF results are a subset of the brute-force ranking universe") {
    val brute = Similarity.knnBrute(spark, sf, nQueries = 3, k = 50)
      .select("query_id", "neighbor_id")
    val ivf = Similarity.ivfSearch(spark, sf, nQueries = 3, k = 5)
      .select("query_id", "neighbor_id")
    // every IVF hit is a real corpus vector scored the same way
    assert(ivf.join(brute, Seq("query_id", "neighbor_id"), "left_anti").count() < 15)
  }
}
