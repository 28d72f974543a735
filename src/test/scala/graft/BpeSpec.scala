package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BPE vocabulary training + encoding. Gates:
  *  - the merge loop reproduces the hand-derivable sequence on the
  *    Sennrich et al. fixture (low/lower/newest/widest), including
  *    the lexicographic tie-break;
  *  - greedy-by-rank encoding segments an UNSEEN word with the
  *    learned vocabulary ("lowest" → low + est</w> — the paper's
  *    rare-word compositionality example);
  *  - registered queries: train returns exactly nMerges ranked rows,
  *    encode covers every doc with a sane compression ratio.
  */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private val fixture = Seq(
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  test("merge loop reproduces the hand-derived sequence with deterministic tie-breaks") {
    val merges = Bpe.learnMerges(fixture, 6)
    // (e,s) 9; (es,t) 9; (est,</w>) 9; (l,o) 7; (lo,w) 7;
    // then a 6-way count tie among (e,w),(n,e),(w,est</w>) →
    // lexicographic min (e,w)
    assert(merges === Seq(
      ("e", "s", 9L), ("es", "t", 9L), ("est", "</w>", 9L),
      ("l", "o", 7L), ("lo", "w", 7L), ("e", "w", 6L)))
  }

  test("greedy-by-rank encode segments an unseen word compositionally") {
    val ranks = Bpe.learnMerges(fixture, 6).zipWithIndex
      .map { case ((l, r, _), i) => (l, r) -> i }.toMap
    assert(Bpe.encodeWord("lowest", ranks).toSeq === Seq("low", "est</w>"))
    assert(Bpe.encodeWord("low", ranks).toSeq === Seq("low", "</w>"))
    // no merge applies to an all-novel word: pure characters
    assert(Bpe.encodeWord("xyz", ranks).toSeq === Seq("x", "y", "z", "</w>"))
  }

  test("registered text_bpe_train returns exactly nMerges ranked rows over the corpus") {
    val out = Bpe.bpeTrain(spark, sf).collect()
    assert(out.length === 50)
    assert(out.map(_.getInt(0)).toSeq === (0 until 50))
    // counts never increase with rank beyond ties: each merge wins by
    // being the current max, and merging cannot create a pair more
    // frequent than an earlier winner at the time it won — but later
    // merges CAN tie; just require positive counts and no blowup
    assert(out.forall(_.getLong(4) > 0))
  }

  test("artifact lifecycle: persisted merges load back exactly; stored encode ≡ in-query encode") {
    val docs = Tables.documents(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("bpe_art").toString
    Bpe.buildBpeArtifact(spark, docs, s"$dir/merges")
    // the loaded rank map is exactly the trained one
    val loaded = Bpe.loadBpeArtifact(spark, s"$dir/merges")
    val trained = Bpe.bpeTrain(spark, sf).collect()
      .map(r => ((r.getString(1), r.getString(2)), r.getInt(0))).toMap
    assert(loaded === trained)
    // the registered store rung (build → persist → load → encode) is
    // byte-identical to the in-query-retrain rung
    val stored = Bpe.bpeEncodeStored(spark, sf).collect().map(_.toSeq).toSet
    val direct = Bpe.bpeEncode(spark, sf).collect().map(_.toSeq).toSet
    assert(stored === direct)
  }

  test("registered text_bpe_encode covers every doc; trained tokens compress chars") {
    val docs = Tables.documents(spark, sf)
    val out = Bpe.bpeEncode(spark, sf)
    assert(out.count() === docs.count())
    // average compression: trained subwords should beat characters
    val meanCpt = out.agg(avg(col("chars_per_token"))).head().getDouble(0)
    assert(meanCpt > 1.5, s"chars per trained token $meanCpt")
  }
}
