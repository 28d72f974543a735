package graft

import graft.multimodal.Multimodal
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextMultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("quality ratios stay in [0, 1] and token counts are positive") {
    val df = TextAnalysis.quality(spark, sf).cache()
    assert(df.filter(col("n_tokens") <= 0).count() === 0)
    assert(df.filter(col("type_token_ratio") < 0 || col("type_token_ratio") > 1).count() === 0)
    df.unpersist()
  }

  test("term frequencies sum is bounded by total token count") {
    val top = TextAnalysis.termFrequencies(spark, sf, topK = 1000)
    val freqSum = top.agg(sum("freq")).head().getLong(0)
    val tokens = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " "))).count()
    assert(freqSum === tokens) // vocab < 1000 here, so top-k covers all
  }

  test("fingerprint is deterministic and order-sensitive") {
    val a = TextAnalysis.fingerprint(spark, sf).orderBy("doc_id").limit(5).collect()
    val b = TextAnalysis.fingerprint(spark, sf).orderBy("doc_id").limit(5).collect()
    assert(a.sameElements(b))
  }

  test("real WAV roundtrip: javax.sound decode returns the generated rate and duration") {
    Seq(1L, 3L, 41L, 123457L).foreach { seed =>
      val wav = Multimodal.makeWav(seed)
      // a real RIFF/WAVE container, not a fake blob
      assert(new String(wav.take(4), "US-ASCII") === "RIFF")
      assert(new String(wav.slice(8, 12), "US-ASCII") === "WAVE")
      val (rate, durMs, hist) = Multimodal.decodeWav(wav)
      assert(rate === Multimodal.wavSampleRate(seed))
      assert(durMs === Multimodal.wavDurationMs(seed))
      assert(math.abs(hist.sum - 1.0f) < 1e-4) // true amplitude histogram
      // a ±12000 sine never reaches the top bins (|s| >> 12 ≤ 2)
      assert(hist.drop(3).forall(_ === 0f))
    }
    // a corrupt payload flags the row (0 Hz / 0 ms), never kills the task
    val (br, bd, bh) = Multimodal.decodeWav("not a wav".getBytes("UTF-8"))
    assert(br === 0 && bd === 0 && bh.forall(_ === 0f))
  }

  test("PII redaction scrubs every planted email/phone and only those docs") {
    val rows = TextAnalysis.redactPii(spark, sf).collect()
    assert(rows.length === Tables.documents(spark, sf).count())
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("n_emails") === (if (id % 5 == 0) 1L else 0L))
      assert(r.getAs[Long]("n_phones") === (if (id % 7 == 0) 1L else 0L))
    }
    // the rewritten strings are really scrubbed: no raw PII survives
    import spark.implicits._
    val scrubbed = TextAnalysis.redactPiiOn(
      Seq((1L, "reach user1@example.com or 555-0001 now")).toDF("doc_id", "text"))
      .collect().head
    assert(scrubbed.getAs[Long]("n_emails") === 1L)
    assert(scrubbed.getAs[Long]("n_phones") === 1L)
    // md5 of the fully-redacted literal, computed independently
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest("reach [EMAIL] or [PHONE] now".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(scrubbed.getAs[String]("clean_md5") === expected)
  }

  test("real PNG roundtrip: ImageIO decode returns the generated dimensions") {
    Seq(0L, 2L, 40L, 123456L).foreach { seed =>
      val png = Multimodal.makePng(seed)
      // a real PNG container, not a fake blob
      assert(png.take(4).sameElements(Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte)))
      val (w, h, hist) = Multimodal.decodeImage(png)
      assert(w === Multimodal.pngWidth(seed))
      assert(h === Multimodal.pngHeight(seed))
      assert(math.abs(hist.sum - 1.0f) < 1e-4) // true luminance histogram, L1-normalized
    }
    // a corrupt payload flags the row (0×0), never NPEs the task
    val (bw, bh, bhist) = Multimodal.decodeImage("not a png".getBytes("UTF-8"))
    assert(bw === 0 && bh === 0 && bhist.forall(_ === 0f))
  }

  test("mm_features keeps one row per document; PNG rows carry real decoded dims") {
    val df = Multimodal.features(spark, sf).cache()
    assert(df.count() === Tables.documents(spark, sf).count())
    // image rows: dimensions decoded from the actual PNG bytes
    val png = df.filter(col("mime") === "image/png").collect()
    assert(png.nonEmpty)
    png.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Int]("width") === Multimodal.pngWidth(id))
      assert(r.getAs[Int]("height") === Multimodal.pngHeight(id))
    }
    // audio rows: rate/duration decoded from the actual WAV container
    val wav = df.filter(col("mime") === "audio/wav").collect()
    assert(wav.nonEmpty)
    wav.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Int]("width") === Multimodal.wavSampleRate(id))
      assert(r.getAs[Int]("height") === Multimodal.wavDurationMs(id))
    }
    df.unpersist()
  }

  test("resize plan clamps the long side, preserves aspect, never upscales") {
    val rows = Multimodal.resizePlan(spark, sf, maxDim = 224).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (w, h) = (r.getAs[Int]("width"), r.getAs[Int]("height"))
      val (ow, oh) = (r.getAs[Int]("out_width"), r.getAs[Int]("out_height"))
      val s = r.getAs[Double]("scale")
      assert(math.max(ow, oh) <= 224 || s === 1.0)
      assert(s <= 1.0) // no upscale
      // aspect preserved within integer rounding: ow = round(w·s) and
      // oh = round(h·s) each contribute at most half a pixel
      val ratio = w.toDouble / h
      assert(math.abs(ow - oh * ratio) <= 0.5 + 0.5 * ratio + 1e-9,
        s"w=$w h=$h ow=$ow oh=$oh")
    }
  }

  test("AVI round-trip: demuxed frame count, dims, and brightness match generated") {
    for (seed <- Seq(1L, 7L, 42L, 1001L)) {
      val frames = Multimodal.demuxAvi(Multimodal.makeAvi(seed))
      assert(frames.length === Multimodal.aviFrameCount(seed))
      frames.zipWithIndex.foreach { case (jpeg, i) =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpeg))
        assert(img.getWidth === Multimodal.aviWidth(seed))
        assert(img.getHeight === Multimodal.aviHeight(seed))
        // uniform-gray frames survive lossy JPEG to within a few levels
        val px = img.getRGB(0, 0, img.getWidth, img.getHeight, null, 0, img.getWidth)
        val mean = px.map(p => (p >> 16) & 0xff).sum.toDouble / px.length
        assert(math.abs(mean - Multimodal.aviFrameLevel(seed, i)) <= 3.0,
          s"seed=$seed frame=$i mean=$mean level=${Multimodal.aviFrameLevel(seed, i)}")
      }
    }
  }

  test("AVI demux rejects corrupt containers instead of returning partial frames") {
    val good = Multimodal.makeAvi(5L)
    assert(Multimodal.demuxAvi(good).nonEmpty)
    // bad magic
    val badMagic = good.clone(); badMagic(9) = 'X'.toByte
    assert(Multimodal.demuxAvi(badMagic).isEmpty)
    // truncated mid-movi
    assert(Multimodal.demuxAvi(good.take(good.length / 2)).isEmpty)
    // garbage
    assert(Multimodal.demuxAvi(Array.fill[Byte](64)(0x5a)).isEmpty)
  }

  test("frame sampling demuxes real AVI payloads at the stride") {
    val frames = Multimodal.frameSample(spark, sf, stride = 10).cache()
    // no corrupt flags on the generated corpus
    assert(frames.filter(col("frame_idx") < 0).count() === 0)
    // 8..32 container frames → 1..4 sampled rows per doc at stride 10
    val perDoc = frames.groupBy(col("doc_id")).count()
    assert(perDoc.filter(col("count") < 1 || col("count") > 4).count() === 0)
    // deterministic: a second run produces the identical frame set
    val a = frames.collect().map(r => (r.getLong(0), r.getInt(1), r.getFloat(3))).toSet
    val b = Multimodal.frameSample(spark, sf, stride = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getFloat(3))).toSet
    assert(a === b)
    // indices respect the stride, timestamps the fps, and each decoded
    // brightness sits within JPEG tolerance of the GENERATED level
    frames.collect().foreach { r =>
      assert(r.getInt(1) % 10 === 0)
      assert(r.getLong(2) === r.getInt(1) * 1000L / 24)
      val want = Multimodal.aviFrameLevel(r.getLong(0), r.getInt(1)) / 255f
      assert(math.abs(r.getFloat(3) - want) <= 3.5f / 255f,
        s"doc=${r.getLong(0)} frame=${r.getInt(1)}")
    }
    frames.unpersist()
  }
}
