package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off measurement driver replicating BENCH_scale_docs'
  * `videofp_100k` scenario so the r14 native VideoBandKeys/AlignDiff
  * expressions can be compared against the r13 HOF number (226 s)
  * without a full bench run. Same corpus, same planted copies, same
  * precision gate.
  */
object VideoFpProbe {
  def main(args: Array[String]): Unit = {
    val nVid = sys.env.get("SPARK_GRAFT_SCALE_CLIPS").map(_.toLong).getOrElse(100000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val scaleDir = "target/graft-video-probe"
    locally {
      val hp = new org.apache.hadoop.fs.Path(scaleDir)
      hp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(hp, true)
      ()
    }
    val base = spark.range(0L, nVid, 1L, 64).as[Long]
      .map(i => graft.multimodal.MmAsset(i, "video/avi", graft.multimodal.Multimodal.makeAvi(i)))
    val plants = spark.range(0L, nVid, 10L, 64).as[Long]
      .map(i => graft.multimodal.MmAsset(i + 10000000L, "video/avi",
        graft.multimodal.Multimodal.reencodeTrimAvi(graft.multimodal.Multimodal.makeAvi(i), 2)))
    val t0 = System.nanoTime()
    graft.multimodal.Multimodal.videoDupsOn(spark, base.union(plants))
      .write.mode("overwrite").parquet(s"$scaleDir/videofp")
    val dt = (System.nanoTime() - t0) / 1e9
    val pairs = spark.read.parquet(s"$scaleDir/videofp")
    val nPairs = pairs.count()
    val nPlanted = pairs.filter(col("doc_b") - col("doc_a") === 10000000L).count()
    println(f"[video-probe] videofp_${nVid / 1000}k  $dt%8.1f s  pairs=$nPairs planted=$nPlanted/${nVid / 10} false=${nPairs - nPlanted}")
    spark.stop()
  }
}
