package graft

/** r17: dump formatted plans for named queries at a given SF
  * (Test/runMain graft.R17Explain <outDir> <sfDir> <q1,q2,...>).
  */
object R17Explain {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val sfDir = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    new java.io.File(outDir).mkdirs()
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val w = new java.io.PrintWriter(s"$outDir/$name.txt")
      w.println(SparkEntry.queries(name)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      w.close()
      println(s"[r17-explain] wrote $outDir/$name.txt")
    }
    spark.stop()
  }
}
