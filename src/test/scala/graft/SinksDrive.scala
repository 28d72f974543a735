package graft

import graft.sources.Sinks
import org.apache.spark.sql.functions._

/** Manual smoke drive for the sink layer (`sbt "Test/runMain
  * graft.SinksDrive"`): partitioned write + pruned read, bucketed
  * shuffle-free join plan, and the redis-format KV exports.
  */
object SinksDrive {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val sf = TestSpark.sf

    val dir = java.nio.file.Files.createTempDirectory("sinks_drive").toString
    Sinks.writePartitioned(Tables.interactions(spark, sf), dir, Seq("is_implicit"))
    println("partition dirs: " + new java.io.File(dir).listFiles().map(_.getName).sorted.mkString(", "))
    val prunedFiles = spark.read.parquet(dir).filter(col("is_implicit") === true)
      .select(input_file_name()).distinct().collect().map(_.getString(0))
    println(s"pruned read touched ${prunedFiles.length} files, all under is_implicit=true: " +
      prunedFiles.forall(_.contains("is_implicit=true")))

    spark.sql("DROP TABLE IF EXISTS drive_bucketed")
    val whDir = new java.io.File("spark-warehouse/drive_bucketed")
    if (whDir.exists()) new scala.reflect.io.Directory(whDir).deleteRecursively()
    Sinks.writeBucketed(Tables.interactions(spark, sf), "drive_bucketed", "item_id")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val self = spark.table("drive_bucketed")
      .join(spark.table("drive_bucketed").groupBy("item_id").count(), "item_id")
    println("bucketed self-join has shuffle: " +
      self.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")

    Sinks.topNKeyValue(graft.operators.Relational.userTopRatings(spark, sf, 3))
      .orderBy("key").show(3, false)
    Sinks.statsKeyValue(graft.operators.Relational.movieStats(spark, sf))
      .orderBy("key").show(4, false)
    spark.stop()
  }
}
