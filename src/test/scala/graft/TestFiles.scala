package graft

/** File-level helpers for store-layout assertions. */
object TestFiles {

  /** Relative path → md5 for every regular file inside the store's
    * `bucket=*` partition dirs — the fingerprint the touched-bucket
    * specs compare across ticks.
    */
  def bucketFileHashes(root: String): Map[String, String] = {
    import scala.jdk.CollectionConverters._
    val base = java.nio.file.Paths.get(root)
    java.nio.file.Files.walk(base).iterator().asScala
      .filter(p => java.nio.file.Files.isRegularFile(p) &&
        p.getParent.getFileName.toString.startsWith("bucket="))
      .map { p =>
        val md = java.security.MessageDigest.getInstance("MD5")
        base.relativize(p).toString ->
          md.digest(java.nio.file.Files.readAllBytes(p)).map("%02x".format(_)).mkString
      }.toMap
  }
}
