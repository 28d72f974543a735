package graft

/** File-level helpers for store-layout assertions. */
object TestFiles {

  /** Whether a store file path lives in partition dir `bucket=<b>`
    * (any generation). */
  def inBucket(path: String, b: Int): Boolean =
    path.split('/').contains("bucket=" + b)

  /** Relative path → md5 for every parquet file in the store's
    * CURRENT snapshot (resolved through the store's own
    * marker → manifest → generation paths) — the fingerprint the
    * touched-bucket specs compare across ticks. Only live files
    * count: retention-window leftovers from older generations are
    * garbage awaiting gc, not part of the store's state.
    */
  def bucketFileHashes(spark: org.apache.spark.sql.SparkSession,
                       root: String): Map[String, String] = {
    val base = java.nio.file.Paths.get(root).toAbsolutePath
    graft.streaming.BucketStore.readAll(spark, root).inputFiles.map { uri =>
      val p = java.nio.file.Paths.get(new java.net.URI(uri))
      val md = java.security.MessageDigest.getInstance("MD5")
      base.relativize(p).toString ->
        md.digest(java.nio.file.Files.readAllBytes(p)).map("%02x".format(_)).mkString
    }.toMap
  }
}
