package graft

/** r18: capture the EXECUTED plan of a merge tick's generation write
  * (Test/runMain graft.R18TickPlanDump <outFile>) — the applyTick
  * internals the registered queries' returned-frame plans cannot show.
  * Builds a small bucketed store, applies one broadcast-gated merge
  * tick (changes + a tombstone), and writes the gen write's executed
  * plan string captured off the QueryExecutionListener. Run against
  * HEAD and against a stash to produce the before/after pair in
  * plans/r18.
  */
object R18TickPlanDump {
  def main(args: Array[String]): Unit = {
    val outFile = args(0)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    import graft.streaming.BucketStore
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("r18_tickplan").toString + "/store"
    BucketStore.seed(
      spark.range(0L, 100000L).select(col("id").as("k"), (col("id") * 2).as("v")),
      BucketStore.longBucket(col("k"), 8), dir, n = 8)
    val plans = scala.collection.mutable.ArrayBuffer.empty[String]
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        plans.synchronized { plans += qe.executedPlan.toString; () }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit = ()
    })
    BucketStore.applyTick(spark, dir,
      Seq((1L, 99L), (9L, 90L)).toDF("k", "v")
        .withColumn("bucket", BucketStore.longBucket(col("k"), 8)),
      Seq("k"), batchId = 1L, n = 8,
      removed = Some(Seq((2L, 0L)).toDF("k", "v")
        .select(col("k"), BucketStore.longBucket(col("k"), 8).as("bucket"))))
    def genWrite(): Option[String] = plans.synchronized {
      plans.find(p => p.contains("gen-1") && p.contains("InsertIntoHadoopFsRelation"))
    }
    var spins = 0
    while (genWrite().isEmpty && spins < 100) { Thread.sleep(50); spins += 1 }
    val w = new java.io.PrintWriter(outFile)
    w.println(genWrite().getOrElse(sys.error("gen write plan not captured")))
    w.close()
    println(s"[r18-tickplan] wrote $outFile")
    spark.stop()
  }
}
