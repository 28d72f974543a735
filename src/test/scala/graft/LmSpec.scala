package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Lm

/** Gates for the Stupid-Backoff hashed-bigram LM filter (operators.Lm).
  * The registered queries ARE SQL-oracled (md5-prefix buckets exist in
  * both engines), so this spec pins what the hash-compare can't see:
  * the backoff arithmetic itself (hand-computed per-token scores on a
  * fixture where every arm — bigram hit, backoff to seen unigram,
  * backoff to unseen floor, α-free first token — fires), the planted
  * two-vocabulary separation that makes the score a QUALITY signal,
  * artifact ≡ in-query parity, and partitioning-invariance of the
  * 1e-4-grid rounding discipline.
  */
class LmSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def r4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("hand-computed Stupid Backoff: every arm of the per-token score") {
    // target: one doc "a b a b" → cu(a)=2, cu(b)=2, N=4;
    // bigrams: c(a b)=2, c(b a)=1
    val target = Seq((0L, "a b a b", "en")).toDF("doc_id", "text", "lang")
    val (uni, bi) = Lm.fitCounts(target)
    // sanity: the three test tokens land in distinct hash buckets
    assert(uni.count() === 2 && bi.count() === 2)

    // score "a b z":
    //  t1 "a"  (no ctx):   s = (2+1)/(4+4096)          [α-free first token]
    //  t2 "b"  (ctx a):    s = c(a b)/cu(a) = 2/2 = 1  [bigram arm]
    //  t3 "z"  (ctx b):    s = 0.4·(0+1)/(4+4096)      [unseen backoff floor]
    val l1 = r4(math.log(3.0 / 4100))
    val l2 = r4(math.log(1.0))
    val l3 = r4(math.log(0.4 / 4100))
    // round-then-divide (the operator's tie-immune discipline)
    val expected = r4(-(l1 + l2 + l3)) / 3

    val doc = Seq((7L, "a b z", "en")).toDF("doc_id", "text", "lang")
    val row = Lm.scoreOf(doc, uni, bi).collect()(0)
    assert(row.getAs[Long]("n_tok") === 3L)
    assert(row.getAs[Double]("logsb") === expected)
  }

  test("backoff to a SEEN unigram whose bigram is novel") {
    val target = Seq((0L, "a b a b", "en")).toDF("doc_id", "text", "lang")
    val (uni, bi) = Lm.fitCounts(target)
    // "b b": bigram unseen, but "b" itself was trained → α·(2+1)/(4+B)
    val l1 = r4(math.log(3.0 / 4100))          // first "b", α-free
    val l2 = r4(math.log(0.4 * 3.0 / 4100))    // second "b", backoff arm
    val expected = r4(-(l1 + l2)) / 2
    val doc = Seq((9L, "b b", "en")).toDF("doc_id", "text", "lang")
    assert(Lm.scoreOf(doc, uni, bi).collect()(0).getAs[Double]("logsb") === expected)
  }

  // disjoint vocabularies, cycled deterministically (the DsirSpec corpus)
  private val vocabA = Seq("alpha", "bravo", "charlie", "delta", "echo", "foxtrot")
  private val vocabB = Seq("zulu", "yankee", "xray", "whiskey", "victor", "uniform")
  private def textOf(vocab: Seq[String], shift: Int): String =
    (0 until 24).map(i => vocab((i + shift) % vocab.size)).mkString(" ")

  private lazy val corpus = (0 until 200).map { id =>
    val v = if (id < 100) vocabA else vocabB
    (id.toLong, textOf(v, id % 6), if (id < 100) "aa" else "bb")
  }.toDF("doc_id", "text", "lang")

  private lazy val targetA = (1000 until 1020).map { id =>
    (id.toLong, textOf(vocabA, id % 6), "aa")
  }.toDF("doc_id", "text", "lang")

  test("planted two-vocabulary separation: target-vocabulary docs score strictly lower logsb") {
    val (uni, bi) = Lm.fitCounts(targetA)
    val scores = Lm.scoreOf(corpus, uni, bi)
      .select("doc_id", "logsb").as[(Long, Double)].collect()
    val (a, b) = scores.partition(_._1 < 100L)
    // every vocab-A doc scores below every vocab-B doc: the trained
    // bigram arm vs the unseen floor is a multi-nat/token gap
    assert(a.map(_._2).max < b.map(_._2).min,
      s"A max ${a.map(_._2).max} vs B min ${b.map(_._2).min}")
  }

  test("per-language terciles: balanced 1/2/3 labels within each lang") {
    val (uni, bi) = Lm.fitCounts(targetA)
    val labeled = Lm.withTerciles(Lm.scoreOf(corpus, uni, bi))
    val counts = labeled.groupBy("lang", "tercile").count()
      .as[(String, Int, Long)].collect().toSet
    // 100 docs per lang → ntile(3) gives 34/33/33
    assert(counts === Set(("aa", 1, 34L), ("aa", 2, 33L), ("aa", 3, 33L),
      ("bb", 1, 34L), ("bb", 2, 33L), ("bb", 3, 33L)))
  }

  test("artifact lifecycle: frozen-counts scoring is row-identical to in-query fit+score") {
    val dir = java.nio.file.Files.createTempDirectory("lm_spec").toString
    Lm.buildLmArtifact(targetA, dir)
    val (uni, bi) = Lm.fitCounts(targetA)
    val inQuery = Lm.scoreOf(corpus, uni, bi)
      .as[(Long, String, Long, Double)].collect().toSet
    val fromArtifact = Lm.scoreWithArtifact(spark, dir, corpus)
      .as[(Long, String, Long, Double)].collect().toSet
    assert(fromArtifact === inQuery)
    // bounded-artifact contract: ≤ UniBuckets + BiBuckets rows ever
    assert(spark.read.parquet(dir).count() <= (Lm.UniBuckets + Lm.BiBuckets).toLong)
  }

  test("scoring is partitioning-independent: 1e-4-grid per-token rounding before the doc sum") {
    val (uni, bi) = Lm.fitCounts(targetA)
    val base = Lm.scoreOf(corpus, uni, bi)
      .as[(Long, String, Long, Double)].collect().toSet
    val repart = Lm.scoreOf(corpus.repartition(7), uni, bi)
      .as[(Long, String, Long, Double)].collect().toSet
    assert(repart === base)
  }

  test("frozen cutpoints: stored-cut labels agree >=95% with the exact window; scores untouched") {
    val dir = java.nio.file.Files.createTempDirectory("lm_cuts").toString
    // a corpus with per-doc-DISTINCT scores (m trained tokens + one
    // unseen, m unique per doc within a lang): the shared two-vocab
    // fixture has only 6 distinct texts per lang, and a value-based
    // cut legitimately disagrees with a rank-based ntile on massive
    // tie blocks — real corpora score near-continuously, which is the
    // regime the frozen-cut contract is stated for
    val target = Seq((0L, "a a a a", "en")).toDF("doc_id", "text", "lang")
    val (uni, bi) = Lm.fitCounts(target)
    val docs = (0 until 200).map { i =>
      val m = 1 + (i % 100)
      ((i.toLong, (Seq.fill(m)("a") :+ s"novel$i").mkString(" "),
        if (i < 100) "aa" else "bb"))
    }.toDF("doc_id", "text", "lang")
    val scores = Lm.scoreOf(docs, uni, bi).cache()
    Lm.buildLmCutpoints(scores, dir)
    val exact = Lm.withTerciles(scores)
      .select("doc_id", "tercile").as[(Long, Int)].collect().toMap
    val frozen = Lm.withStoredTerciles(spark, scores, dir)
      .select("doc_id", "tercile").as[(Long, Int)].collect().toMap
    assert(frozen.keySet === exact.keySet)
    val agree = exact.count { case (id, t) => frozen(id) == t }
    assert(agree >= (exact.size * 0.95).toInt,
      s"only $agree/${exact.size} tercile labels agree with the exact window")
    // the cutpoint artifact is one bounded row per language
    assert(spark.read.parquet(dir).count() === 2L)
    // an unknown language (no cutpoint row) labels the conservative
    // tail, never NULL
    import spark.implicits._
    val foreign = Seq((9999L, "zz", 3L, 5.0)).toDF("doc_id", "lang", "n_tok", "logsb")
    val t = Lm.withStoredTerciles(spark, foreign, dir)
      .select("tercile").as[Int].collect().toSeq
    assert(t === Seq(3))
    scores.unpersist()
    ()
  }
}
