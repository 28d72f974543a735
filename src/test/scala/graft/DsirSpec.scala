package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dsir

/** The planted two-vocabulary preference gate for the DSIR sampler
  * (`q_dsir_sample` is rows-only — hashed-LM importance weights have
  * no SQL oracle, so this spec IS its correctness gate): two disjoint
  * synthetic vocabularies, the target drawn purely from one; the
  * selected set must (a) hit the configured fraction and (b) consist
  * entirely of target-vocabulary documents — the per-token log-ratio
  * gap (~4 nats/token ≈ 100 nats/doc) dwarfs the bounded hash-Gumbel
  * noise (g ∈ [−2.7, 14.5] on the 1e6 grid), so the preference is
  * deterministic, not statistical. Plus the artifact lifecycle's
  * parity claim (`scoreWithArtifact` byte-equal to in-query
  * fit+score), partitioning-invariance of the weights (λ rounded to
  * the 1e-6 grid BEFORE the per-doc sum — the BM25 rounding
  * discipline), and the λ-staleness drift probe: a faithful batch
  * stays under the ceiling, a planted vocabulary shift trips it, and
  * refitting on the shifted corpus restores selection preference.
  */
class DsirSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // disjoint 6-word vocabularies; text = 24 tokens cycling the
  // vocabulary (deterministic, no RNG)
  private val vocabA = Seq("alpha", "bravo", "charlie", "delta", "echo", "foxtrot")
  private val vocabB = Seq("zulu", "yankee", "xray", "whiskey", "victor", "uniform")
  private val vocabC = Seq("kilo", "lima", "mike", "november", "oscar", "papa")
  private def textOf(vocab: Seq[String], shift: Int): String =
    (0 until 24).map(i => vocab((i + shift) % vocab.size)).mkString(" ")

  // 300 raw docs: ids 0..149 vocabulary A, ids 150..299 vocabulary B
  private lazy val raw = (0 until 300).map { id =>
    val v = if (id < 150) vocabA else vocabB
    (id.toLong, textOf(v, id % 6))
  }.toDF("doc_id", "text")

  // target: 20 pure-vocabulary-A docs (fresh ids — the target corpus
  // is a SEPARATE exemplar set, the DSIR deployment shape)
  private lazy val target = (1000 until 1020).map { id =>
    (id.toLong, textOf(vocabA, id % 6))
  }.toDF("doc_id", "text")

  test("planted two-vocabulary preference: selection hits frac and picks only target-vocabulary docs") {
    val lambda = Dsir.fitLogRatio(target, raw)
    val sel = Dsir.sampleOf(raw, lambda, frac = 0.4)
      .filter(col("selected")).select("doc_id").as[Long].collect().toSet
    // ≈ frac·n selected (the cut is a sketch quantile — exact at 300
    // rows, but the operator contract is "≈ frac", so gate with margin)
    assert(sel.size >= 100 && sel.size <= 140, s"selected ${sel.size} of 300")
    // every selected doc is vocabulary-A: the weight gap between the
    // vocabularies (~100 nats/doc) is far past max Gumbel noise
    assert(sel.forall(_ < 150L), s"non-target docs selected: ${sel.filter(_ >= 150L)}")
  }

  test("artifact lifecycle: frozen-lambda scoring is byte-equal to in-query fit+score") {
    val dir = java.nio.file.Files.createTempDirectory("dsir_spec").toString
    Dsir.buildDsirArtifact(target, raw, dir)
    val inQuery = Dsir.scoreOf(raw, Dsir.fitLogRatio(target, raw))
      .as[(Long, Double)].collect().toSet
    val fromArtifact = Dsir.scoreWithArtifact(spark, dir, raw)
      .as[(Long, Double)].collect().toSet
    assert(fromArtifact === inQuery)
    // the artifact is bounded by construction: ≤ NBuckets rows however
    // large the corpora — the broadcast-table contract
    assert(spark.read.parquet(dir).count() <= Dsir.NBuckets)
  }

  test("scoring is partitioning-independent: 1e-6-grid lambda rounding before the per-doc sum") {
    val lambda = Dsir.fitLogRatio(target, raw)
    val base = Dsir.scoreOf(raw, lambda).as[(Long, Double)].collect().toSet
    val repart = Dsir.scoreOf(raw.repartition(7), lambda)
      .as[(Long, Double)].collect().toSet
    assert(repart === base)
  }

  test("λ drift probe: faithful batch under ceiling, vocabulary shift trips, refit restores preference") {
    val dir = java.nio.file.Files.createTempDirectory("dsir_probe").toString
    Dsir.buildDsirArtifact(target, raw, dir)

    // faithful batch: every 3rd raw doc — the fit-time A/B mix
    val faithful = raw.filter(col("doc_id") % 3 === 0)
    val r0 = Dsir.dsirDriftProbe(spark, dir, faithful)
    assert(!r0.tripped, r0.toString)

    // shifted batch: a vocabulary the fit never saw
    val cBatch = (2000 until 2100).map(id => (id.toLong, textOf(vocabC, id % 6)))
      .toDF("doc_id", "text")
    val r1 = Dsir.dsirDriftProbe(spark, dir, cBatch)
    assert(r1.tripped, r1.toString)
    assert(r1.kl > r0.kl)

    // the probed scoring entry fires onDrift on the shifted batch
    var fired = false
    Dsir.scoreWithArtifactProbed(spark, dir, cBatch,
      Dsir.DsirProbeConfig(onDrift = _ => fired = true)).collect()
    assert(fired)

    // the staleness failure the probe catches: under the FROZEN λ,
    // unseen-vocabulary docs score the positive smoothing-floor ratio
    // and OUTRANK genuine target-like docs
    val mixed = raw.filter(col("doc_id") < 50).unionByName(cBatch)
    val staleTop = Dsir.scoreWithArtifact(spark, dir, mixed)
      .orderBy(col("weight").desc, col("doc_id").asc).limit(50)
      .select("doc_id").as[Long].collect()
    assert(staleTop.forall(_ >= 2000L),
      s"stale λ should (wrongly) prefer the unseen vocabulary: ${staleTop.take(5).mkString(",")}")

    // refit on target + CURRENT raw (fit-time corpus ∪ shifted batch)
    // — the onDrift move — restores target-vocabulary preference
    val dir2 = java.nio.file.Files.createTempDirectory("dsir_refit").toString
    Dsir.buildDsirArtifact(target, raw.unionByName(cBatch), dir2)
    val freshTop = Dsir.scoreWithArtifact(spark, dir2, mixed)
      .orderBy(col("weight").desc, col("doc_id").asc).limit(50)
      .select("doc_id").as[Long].collect()
    assert(freshTop.forall(_ < 150L),
      s"refit λ should prefer target-vocabulary docs: ${freshTop.take(5).mkString(",")}")
  }
}
