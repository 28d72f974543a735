package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Planted-case specs for the training-prep trio: repetition scoring,
  * decontamination, and sequence packing — each checked against
  * hand-computed expectations (the DuckDB oracle gates the same ops on
  * the real corpus).
  */
class TrainingPrepSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  test("repetition: duplicate-trigram fraction matches hand computation") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b a b"),        // grams: aba, bab, aba, bab → 4 total, 2 distinct
      (2L, "x y z w"),            // grams: xyz, yzw → no dups
      (3L, "t u")                 // shorter than n → excluded
    ).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionOf(docs).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getDouble(3)))).toMap
    assert(r.keySet === Set(1L, 2L))
    assert(r(1L) === ((4L, 2L, 0.5)))
    assert(r(2L) === ((2L, 2L, 0.0)))
  }

  test("decontamination flags exactly the train docs sharing an eval 4-gram") {
    import spark.implicits._
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon"),       // eval (0 % 20 == 0)
      (1L, "zzz alpha beta gamma delta yyy"),       // train, contains eval gram
      (2L, "one two three four five"),              // train, clean
      (3L, "alpha beta gamma delta beta gamma delta epsilon") // train, 2 distinct hits
    ).toDF("doc_id", "text")
    val r = Decontamination.flagContaminatedOf(docs).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r === Map(1L -> 1L, 3L -> 2L))
  }

  test("bloom-prefiltered decontamination equals the exact operator") {
    // the bloom pass only PREFILTERS (false positives removed by the
    // exact verify join), so outputs must be identical — on the real
    // corpus, not a toy
    val exact = Decontamination.flagContaminated(spark, graft.TestSpark.sf)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val bloom = Decontamination.flagContaminatedBloom(spark, graft.TestSpark.sf)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(exact.nonEmpty)
    assert(bloom === exact)
  }

  test("persisted bloom artifact: round-trip flags equal the exact operator; stream flagging quarantines every leak") {
    import spark.implicits._
    // artifact lifecycle on the real corpus: build+persist+load+flag+
    // verify must reproduce the exact operator byte-for-byte
    val exact = Decontamination.flagContaminated(spark, graft.TestSpark.sf)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val stored = Decontamination.flagContaminatedStored(spark, graft.TestSpark.sf,
      artifactDir = java.nio.file.Files.createTempDirectory("decon_art").toString)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(exact.nonEmpty)
    assert(stored === exact)

    // the stateless ingest-side flagging: every planted leak is
    // quarantined (bloom has no false negatives), and at this filter
    // size no clean doc false-positives
    val dir = java.nio.file.Files.createTempDirectory("decon_art2").toString
    val evalDocs = Seq((0L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val evalGrams = evalDocs
      .withColumn("w", split(col("text"), " "))
      .select(explode(TextAnalysis.wordGrams(4)).as("gram")).distinct()
    Decontamination.buildBloomArtifact(spark, evalGrams, s"$dir/bloom")
    val bloom = Decontamination.loadBloomArtifact(spark, s"$dir/bloom")
    val ingest = Seq(
      (10L, "xx alpha beta gamma delta yy"),   // one leaked 4-gram
      (11L, "clean words entirely different"), // clean, too short for overlap
      (12L, "beta gamma delta epsilon zeta"),  // two leaked 4-grams
      (13L, "unrelated text with many plain words here")
    ).toDF("doc_id", "text")
    val flagged = graft.streaming.DocStream.flagSuspects(ingest, bloom)
      .collect().map(x => x.getLong(0) -> x.getInt(1)).toMap
    assert(flagged === Map(10L -> 1, 12L -> 2))

    // and the expression is fully stateless/streamable: the same
    // transform binds to a streaming source without analysis errors
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val sq = graft.streaming.DocStream.flagSuspects(
        mem.toDF().toDF("doc_id", "text"), bloom)
      .writeStream.format("memory").queryName("decon_suspects").start()
    mem.addData((20L, "alpha beta gamma delta trailing"), (21L, "totally clean"))
    sq.processAllAvailable(); sq.stop()
    val streamed = spark.table("decon_suspects").collect()
      .map(x => x.getLong(0) -> x.getInt(1)).toMap
    assert(streamed === Map(20L -> 1))
  }

  test("sequence packing: offsets, boundary split, per-bucket independence") {
    import spark.implicits._
    def words(k: Int): String = Seq.fill(k)("w").mkString(" ")
    // bucket 0: 300 + 300 + 100 tokens against budget 512
    val docs = Seq(
      (0L, words(300)),   // seq 0, offset 0, ends 299 → no split
      (16L, words(300)),  // starts 300 → seq 0, crosses 512 → split
      (32L, words(100)),  // starts 600 → seq 1, offset 88, no split
      (1L, words(600))    // bucket 1: own id space, splits 512
    ).toDF("doc_id", "text")
    val r = SeqPack.packOf(docs).collect()
      .map(x => x.getLong(0) ->
        ((x.getLong(2), x.getLong(3), x.getBoolean(5)))).toMap
    assert(r(0L) === ((0L, 0L, false)))
    assert(r(16L) === ((0L, 300L, true)))
    assert(r(32L) === ((1L, 88L, false)))
    assert(r(1L) === ((SeqPack.SeqStride, 0L, true)))
  }

  test("epoch shuffle mixes docs across shards between epochs") {
    val r = Sampling.epochShuffle(spark, "/root/testdata/sf0.001",
      epochs = 2, shards = 8).collect()
    val e0 = r.filter(_.getLong(1) == 0).map(x => x.getLong(0) -> x.getLong(2)).toMap
    val e1 = r.filter(_.getLong(1) == 1).map(x => x.getLong(0) -> x.getLong(2)).toMap
    assert(e0.size === 500 && e1.size === 500)
    // epoch-dependent hashing: ~7/8 of docs should change shard
    val moved = e0.keys.count(id => e0(id) != e1(id)).toDouble / e0.size
    assert(moved > 0.7, f"only $moved%.2f of docs changed shard between epochs")
    // every shard populated, no shard grossly over-loaded
    val sizes = r.filter(_.getLong(1) == 0).groupBy(_.getLong(2)).map(_._2.length)
    assert(sizes.size === 8 && sizes.max < 3 * sizes.min,
      s"imbalanced shards: ${sizes.toSeq.sorted}")
  }

  test("epoch shuffle scales past 16 shards: uniform and mixing at shards=64") {
    val r = Sampling.epochShuffle(spark, "/root/testdata/sf0.1",
      epochs = 2, shards = 64).collect()
    val e0 = r.filter(_.getLong(1) == 0)
    // sf0.1 = 5000 docs over 64 shards (mean ~78/shard): the 32-bit hash
    // residue must keep every shard within a 5-sigma Poisson deviation of
    // the mean (the old single-hex-digit scheme could not even form 64
    // shards). A ratio bound like max < 2*min is statistically fragile at
    // this occupancy; the sqrt(mean) bound is not.
    val sizes = e0.groupBy(_.getLong(2)).map(_._2.length)
    assert(sizes.size === 64, s"only ${sizes.size} shards populated")
    val mean = e0.length.toDouble / 64
    val tol = 5 * math.sqrt(mean)
    assert(sizes.max - mean < tol && mean - sizes.min < tol,
      s"imbalanced shards: min=${sizes.min} max=${sizes.max} mean=$mean")
    // cross-epoch mixing: with 64 shards ~63/64 of docs should move
    val m0 = e0.map(x => x.getLong(0) -> x.getLong(2)).toMap
    val m1 = r.filter(_.getLong(1) == 1).map(x => x.getLong(0) -> x.getLong(2)).toMap
    val moved = m0.keys.count(id => m0(id) != m1(id)).toDouble / m0.size
    assert(moved > 0.9, f"only $moved%.2f of docs changed shard between epochs")
    // non-power-of-two shard counts are accepted (bias < shards/2^32)
    assert(Sampling.epochShuffle(spark, "/root/testdata/sf0.001", shards = 9)
      .select("shard").distinct().count() === 9)
  }

  test("sequence packing is parallelism-independent (repartition invariance)") {
    import spark.implicits._
    val docs = (0L until 64L).map(i => (i, Seq.fill((i % 7 + 1).toInt * 40)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val a = SeqPack.packOf(docs).collect().toSeq
    val b = SeqPack.packOf(docs.repartition(13)).collect().toSeq
    assert(a === b)
  }

  test("best-fit packing: hand-traced BFD placement, zero slack on the fixture") {
    import spark.implicits._
    def words(k: Int): String = Seq.fill(k)("w").mkString(" ")
    // all bucket 0, budget 512; BFD trace: 300→bin0, 300→bin1 (bin0's
    // 212 can't fit 300), 212→bin0 (exact), 200→bin1 (rem 12),
    // 12→bin1 (exact) — two full bins, zero padding
    val docs = Seq((0L, 300), (16L, 300), (32L, 212), (48L, 200), (64L, 12))
      .map { case (id, k) => (id, words(k)) }.toDF("doc_id", "text")
    val r = SeqPack.packBestFitOf(docs).collect()
      .map(x => x.getLong(0) -> ((x.getLong(3), x.getInt(4)))).toMap
    assert(r(0L) === ((0L, 0)))
    assert(r(16L) === ((1L, 0)))
    assert(r(32L) === ((0L, 300)))
    assert(r(48L) === ((1L, 300)))
    assert(r(64L) === ((1L, 500)))
  }

  test("best-fit packing: oversized docs chunk at the budget, pieces land whole") {
    import spark.implicits._
    def words(k: Int): String = Seq.fill(k)("w").mkString(" ")
    val docs = Seq((1L, words(1100)), (17L, words(70))).toDF("doc_id", "text")
    val r = SeqPack.packBestFitOf(docs).collect()
      .map(x => ((x.getLong(0), x.getInt(1)), (x.getInt(2), x.getLong(3), x.getInt(4))))
      .toMap
    // 1100 = 512 + 512 + 76 (bucket 1); BFD desc: the two full chunks
    // fill their own bins, 76 and 70 share the third
    assert(r((1L, 0)) === ((512, SeqPack.SeqStride + 0L, 0)))
    assert(r((1L, 1)) === ((512, SeqPack.SeqStride + 1L, 0)))
    assert(r((1L, 2)) === ((76, SeqPack.SeqStride + 2L, 0)))
    assert(r((17L, 0)) === ((70, SeqPack.SeqStride + 2L, 76)))
  }

  test("best-fit packing invariants: budget respected, tokens preserved, repartition-invariant") {
    import spark.implicits._
    val docs = (0L until 64L).map(i =>
      (i, Seq.fill((i % 9 + 1).toInt * 71)("w").mkString(" "))).toDF("doc_id", "text")
    val out = SeqPack.packBestFitOf(docs)
    // no sequence over budget, no piece over budget
    assert(out.groupBy("seq_id").agg(sum(col("n_tokens")).as("s"))
      .filter(col("s") > 512).count() === 0)
    // token mass preserved piece-by-piece
    val perDoc = out.groupBy("doc_id").agg(sum(col("n_tokens")).as("t"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    (0L until 64L).foreach(i => assert(perDoc(i) === (i % 9 + 1) * 71))
    // deterministic under repartition
    val a = SeqPack.packBestFitOf(docs).collect().map(_.toSeq).toSet
    val b = SeqPack.packBestFitOf(docs.repartition(13)).collect().map(_.toSeq).toSet
    assert(a === b)
  }

  test("BFD bucket count scale-derives from the piece count") {
    // ~PiecesPerBucket pieces per bucket, pow2, clamped [16, 2^20]:
    // per-task sort buffer stays a few MB at ANY corpus size
    assert(SeqPack.deriveBfdBuckets(0L) === 16)
    assert(SeqPack.deriveBfdBuckets(4L * 1000 * 1000) === 16)
    assert(SeqPack.deriveBfdBuckets(10L * 1000 * 1000) === 64)
    assert(SeqPack.deriveBfdBuckets(10L * 1000 * 1000 * 1000) === 65536)
    assert(SeqPack.deriveBfdBuckets(Long.MaxValue / 4) === (1 << 20))
    // the registered entry's exact piece-count aggregate: a 1100-token
    // doc at budget 512 is 3 pieces, a 70-token doc 1 — and the
    // derived knob at this size is the floor clamp
    import spark.implicits._
    def words(k: Int): String = Seq.fill(k)("w").mkString(" ")
    val docs = Seq((1L, words(1100)), (17L, words(70))).toDF("doc_id", "text")
    assert(SeqPack.packBestFitOf(docs, 512, SeqPack.deriveBfdBuckets(4))
      .count() === 4)
  }
}
