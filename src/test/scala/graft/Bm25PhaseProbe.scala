package graft

import org.apache.spark.sql.SparkSession

/** One-off measurement driver for the r15 verdict's watch item #2:
  * the official bench's `text_bm25_inc` / `text_bm25_cdc` phases
  * roughly doubled at sf0.1 between r14 and r15 (inc seed/tick
  * 1.40/1.70 → 2.80/3.88 s; walls 10.9/10.4 s) while NO r15 commit
  * touched the BM25 write path and the shuffle bytes stayed
  * byte-identical — the same contention-shaped profile as r14's
  * `knn_ivfpq_store` train blip, which [[TrainPhaseProbe]]
  * exonerated (solo 2.44 s vs 10.57 s in-session). This applies the
  * same treatment: run both BM25 store rungs solo in a fresh mirror
  * of the Bench session (same master/shuffle knobs, same sf0.001
  * warm-up) and print PhaseTimer per invocation — if the solo
  * seed/tick numbers sit near r14's, the official delta is session
  * debris, not a write-path regression.
  */
object Bm25PhaseProbe {
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

    def once(tag: String, name: String, sfDir: String)(run: => Unit): Unit = {
      PhaseTimer.reset()
      val t0 = System.nanoTime()
      run
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      val ph = PhaseTimer.snapshot().getOrElse(name, Map.empty)
      println(f"[bm25-probe] $tag%-18s $name%-14s total=$dt%6.2f s phases=" +
        ph.toSeq.sortBy(_._1).map { case (p, t) => f"$p=$t%.2f" }.mkString(" "))
    }
    def inc(tag: String, sfDir: String): Unit =
      once(tag, "text_bm25_inc", sfDir) {
        graft.operators.Retrieval.bm25Incremental(spark, sfDir,
            artifactDir = "target/graft-bm25probe")
          .write.format("noop").mode("overwrite").save()
      }
    def cdc(tag: String, sfDir: String): Unit =
      once(tag, "text_bm25_cdc", sfDir) {
        graft.operators.Retrieval.bm25Cdc(spark, sfDir,
            artifactDir = "target/graft-bm25probe")
          .write.format("noop").mode("overwrite").save()
      }
    inc("warmup_sf0001", "/root/testdata/sf0.001")
    cdc("warmup_sf0001", "/root/testdata/sf0.001")
    for (i <- 1 to 3) {
      inc(s"sf01_run$i", "/root/testdata/sf0.1")
      cdc(s"sf01_run$i", "/root/testdata/sf0.1")
    }
    spark.stop()
  }
}
