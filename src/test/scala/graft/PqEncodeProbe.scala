package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** One-off measurement driver for the r14 native PQ expressions:
  * replicates BENCH_scale_docs' `knn_pq_2m` / `ivfpq_inquery_2m`
  * scenarios (same 2M synthetic vectors, same knobs) so the codegen'd
  * PqEncode/PqAdc path can be compared against the r13 HOF numbers
  * (199 s / 608 s) without a full 49-minute bench run.
  */
object PqEncodeProbe {
  def main(args: Array[String]): Unit = {
    val nVecs = sys.env.get("SPARK_GRAFT_SCALE_VECS").map(_.toLong).getOrElse(2000000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorFunctions.register(spark)

    val scaleDir = "target/graft-pq-probe"
    locally {
      val hp = new org.apache.hadoop.fs.Path(scaleDir)
      hp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(hp, true)
      ()
    }
    val dim = 64
    spark.range(0L, nVecs, 1L, 64)
      .select(col("id").as("vec_id"))
      .withColumn("bv", when(pmod(col("vec_id"), lit(40)) === 39, col("vec_id") - 1)
        .otherwise(col("vec_id")))
      .withColumn("c", pmod(xxhash64(col("bv") * 2654435761L), lit(256)))
      .withColumn("embedding", expr(
        s"transform(sequence(0, ${dim - 1}), i -> " +
        s"(pmod(xxhash64(c * 64 + i), 2000) - 1000) / 1000.0 " +
        s"+ 1.2 * (pmod(xxhash64(bv * 64 + i), 2000) - 1000) / 1000.0 " +
        s"+ CASE WHEN bv <> vec_id THEN 0.01 * (pmod(xxhash64(vec_id * 64 + i), 2000) - 1000) / 1000.0 ELSE 0.0 END)"))
      .select(col("vec_id"), col("embedding"))
      .write.parquet(s"$scaleDir/vecs")
    def corpus(): DataFrame = spark.read.parquet(s"$scaleDir/vecs")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("norm", sqrt(expr("graft_dot(v, v)")))

    def timed(name: String)(work: => Unit): Unit = {
      val t0 = System.nanoTime()
      work
      println(f"[pq-probe] $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
    }

    var books: Seq[(Int, Int, Seq[Double])] = Seq.empty
    timed("pq_train_2m") {
      books = Similarity.trainPqCodebooks(spark, corpus(), m = 16, ncent = 32)
    }
    timed("knn_pq_2m") {
      Similarity.knnPqOn(spark, corpus(), books, nQueries = 64, k = 10,
        m = 16, ncent = 32, oversample = 8)
        .write.mode("overwrite").parquet(s"$scaleDir/pq_hits")
    }
    timed("ivfpq_inquery_2m") {
      Similarity.knnIvfPqOn(spark, corpus(), nQueries = 64, k = 10,
        nlist0 = 256, nprobe0 = 8, m = 16, ncent0 = -1, oversample0 = -1)
        .write.mode("overwrite").parquet(s"$scaleDir/ivfpq_inq_hits")
    }
    spark.stop()
  }
}
