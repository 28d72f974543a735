package graft.multimodal

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

// Top-level (not object-nested) so the Catalyst encoder's generated
// code can access them — private nested case classes fail codegen.
case class MmAsset(doc_id: Long, mime: String, payload: Array[Byte])
case class MmDecoded(doc_id: Long, mime: String, width: Int, height: Int,
                     n_bytes: Int, features: Array[Float])
case class MmFrame(doc_id: Long, frame_idx: Int, ts_ms: Long, brightness: Float)

/** Multimodal-column plumbing: opaque binary payloads + typed metadata
  * + a partition-batched decode/feature-extract pass.
  *
  * The Spark-side structure is real and tested — binary column, typed
  * metadata struct, `mapPartitions` batch decode (the JVM analog of a
  * Pandas-UDF `mapInPandas` stage), stable output schema — while the
  * codec itself is a clearly-marked deterministic STUB (this container
  * has no image/audio libraries). Swapping `stubDecode` for a real
  * JNI/FFmpeg/ImageIO call changes no plan shape: decode stays
  * partition-local, no shuffle, batch-sized by the input splits.
  */
object Multimodal {

  /** STUB codec: stands in for image decode. Deterministic pure
    * function of the payload bytes so results are reproducible across
    * runs/engines. A real implementation replaces ONLY this body.
    */
  private[graft] def stubDecode(payload: Array[Byte]): (Int, Int, Array[Float]) = {
    val h = payload.foldLeft(1125899906842597L)((acc, b) => acc * 31 + b)
    val width = 64 + math.floorMod(h, 1921L).toInt        // fake 64..1984 px
    val height = 64 + math.floorMod(h >> 11, 1081L).toInt // fake 64..1144 px
    // fake feature vector: 8-bin byte histogram, L1-normalized
    val hist = new Array[Float](8)
    payload.foreach(b => hist(math.floorMod(b, 8)) += 1f)
    val n = math.max(1f, payload.length.toFloat)
    (width, height, hist.map(_ / n))
  }

  /** Build the multimodal table (binary payload column + metadata) and
    * run the batched decode → feature-extraction pass. The payload here
    * is the document text's bytes — a stand-in blob with realistic
    * per-row variance; in production this column comes from the lake.
    */
  def features(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val assets = Tables.documents(spark, sfDir)
      .select(
        col("doc_id"),
        when(col("doc_id") % 2 === 0, lit("image/png")).otherwise(lit("audio/wav")).as("mime"),
        col("text").cast("binary").as("payload"))
      .as[MmAsset]
    assets.mapPartitions { it =>
      // partition-local batch: one decoder instance per partition, the
      // same amortization a Pandas-UDF batch gives in PySpark
      it.map { a =>
        val (w, hgt, feats) = stubDecode(a.payload)
        MmDecoded(a.doc_id, a.mime, w, hgt, a.payload.length, feats)
      }
    }.toDF()
      .withColumn("feat_l1", round(expr("aggregate(features, 0D, (acc, x) -> acc + x)"), 2))
      .select(col("doc_id"), col("mime"), col("width"), col("height"), col("n_bytes"), col("feat_l1"))
  }

  /** Aspect-preserving resize planning: clamp the longer decoded side
    * to `maxDim`, scale the other to match, estimate the re-encoded
    * byte count as bytes × scale². The geometry is REAL column math
    * over the decoded dimensions (the part a pipeline gets wrong —
    * rounding, no-upscale clamping); only the pixel work is behind the
    * stub codec. Pure per-row expressions, zero shuffle.
    */
  def resizePlan(spark: SparkSession, sfDir: String, maxDim: Int = 224): DataFrame = {
    val scale = least(lit(1.0), lit(maxDim) / greatest(col("width"), col("height")).cast("double"))
    features(spark, sfDir)
      .withColumn("scale", round(scale, 6))
      .withColumn("out_width", greatest(lit(1), round(col("width") * col("scale")).cast("int")))
      .withColumn("out_height", greatest(lit(1), round(col("height") * col("scale")).cast("int")))
      .withColumn("est_bytes", greatest(lit(1L),
        round(col("n_bytes") * col("scale") * col("scale")).cast("long")))
      .select(col("doc_id"), col("width"), col("height"),
        col("out_width"), col("out_height"), col("scale"), col("est_bytes"))
  }

  /** Frame sampling: each video asset fans out to every-`stride`-th
    * frame with a per-frame feature. The plumbing concern this
    * exercises is ROW AMPLIFICATION — one asset becomes dozens of
    * frame rows, all emitted partition-locally (flatMap inside
    * mapPartitions, no shuffle), which is exactly why frame extraction
    * must size input splits by expected output, not input, rows. Frame
    * count and per-frame values come from the stub codec
    * (deterministic functions of payload + frame index — a real
    * FFmpeg demux replaces only those two lambdas).
    */
  def frameSample(spark: SparkSession, sfDir: String, stride: Int = 10,
                  fps: Int = 24): DataFrame = {
    import spark.implicits._
    val assets = Tables.documents(spark, sfDir)
      .select(col("doc_id"), lit("video/mp4").as("mime"),
        col("text").cast("binary").as("payload"))
      .as[MmAsset]
    assets.mapPartitions { it =>
      it.flatMap { a =>
        // stub "container header parse": deterministic frame count
        val h = a.payload.foldLeft(1125899906842597L)((acc, b) => acc * 31 + b)
        val nFrames = 24 + math.floorMod(h, 240L).toInt
        (0 until nFrames by stride).iterator.map { i =>
          // stub per-frame decode: brightness as a pure fn of (payload hash, i)
          val fh = math.floorMod(h * 6364136223846793005L + i * 1442695040888963407L, 1000L)
          MmFrame(a.doc_id, i, i * 1000L / fps, fh / 1000f)
        }
      }
    }.toDF()
  }
}
