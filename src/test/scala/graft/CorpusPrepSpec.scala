package graft

import graft.operators.CorpusPrep
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CorpusPrepSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("survivors pass every gate and are content-unique") {
    val out = CorpusPrep.prep(spark, sf).cache()
    assert(out.count() > 0)
    assert(out.filter(col("n_tokens") < 10 || col("type_token_ratio") < 0.3).count() === 0)
    // content uniqueness: join back to the corpus and check md5 distinct
    val withText = out.join(Tables.documents(spark, sf), Seq("doc_id"))
      .select(md5(col("text")).as("h"))
    assert(withText.count() === withText.distinct().count())
    out.unpersist()
  }

  test("content-hash sample gate commutes with the dedup (the pre-shuffle placement is sound)") {
    // the operator gates on md5(text) BEFORE the dedup shuffle; the
    // naive pipeline gates AFTER dedup. Because the gate key IS the
    // dedup key, both must select the identical survivor set.
    val fused = CorpusPrep.prep(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val toks = split(col("text"), " ")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("text_md5")).orderBy(col("doc_id").asc)
    val naive = Tables.documents(spark, sf)
      .withColumn("n_tokens", size(toks))
      .withColumn("ttr", round(size(array_distinct(toks)).cast("double") / size(toks), 4))
      .filter(col("n_tokens") >= 10 && col("ttr") >= 0.3)
      .withColumn("text_md5", md5(col("text")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)                              // dedup first
      .filter(substring(col("text_md5"), 1, 2) < lit("80")) // gate after
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(fused === naive)
  }
}
