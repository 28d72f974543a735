package graft

import org.apache.spark.sql.SparkSession

/** One-off measurement driver for the r14 verdict's watch item: the
  * official bench's `knn_ivfpq_store` TRAIN phase moved 1.12 s (r13)
  * → 10.57 s (r14) at sf0.1 while the 2M-scale receipts improved
  * 730 → 25 s. Hypothesis to test: the delta is per-SESSION warm-up
  * (first-use codegen compile / class loading of the new native
  * expressions landing in whichever phase runs them first at tiny
  * SF), not per-RUN work — so a second invocation in the same session
  * should read near the r13 number. Mirrors the Bench session (same
  * master/shuffle knobs, same sf0.001 warm-up discipline) and prints
  * PhaseTimer per invocation.
  */
object TrainPhaseProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def once(tag: String, sfDir: String): Unit = {
      PhaseTimer.reset()
      val t0 = System.nanoTime()
      graft.operators.Similarity.ivfPqStoreSearch(spark, sfDir,
          artifactDir = "target/graft-trainprobe")
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      val ph = PhaseTimer.snapshot().getOrElse("knn_ivfpq_store", Map.empty)
      println(f"[train-probe] $tag%-14s total=$dt%6.2f s phases=" +
        ph.toSeq.sortBy(_._1).map { case (p, t) => f"$p=$t%.2f" }.mkString(" "))
    }
    once("warmup_sf0001", "/root/testdata/sf0.001")
    for (i <- 1 to 3) once(s"sf01_run$i", "/root/testdata/sf0.1")
    spark.stop()
  }
}
