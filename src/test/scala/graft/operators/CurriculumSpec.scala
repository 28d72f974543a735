package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The approximate curriculum path must agree with the exact ntile
  * path closely enough to be its drop-in at scale: same keep/drop
  * hash gates, bucket assignment within sketch error. Disagreement
  * concentrates on quartile-boundary ties (ntile splits ties to
  * equalize buckets; thresholds keep them together) — bounded here.
  */
class CurriculumSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val sf = "/root/testdata/sf0.01"

  test("approx quartile buckets agree with exact ntile on ≥95% of kept docs") {
    val exact = Sampling.curriculumSample(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val approx = Sampling.curriculumSampleApprox(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val common = exact.keySet intersect approx.keySet
    assert(common.nonEmpty)
    val agree = common.count(id => exact(id) == approx(id))
    val frac = agree.toDouble / common.size
    info(f"bucket agreement on kept docs: $frac%.4f (${common.size} docs)")
    assert(frac >= 0.95, f"only $frac%.4f agreement")
    // the keep-sets themselves must be nearly identical too (a doc
    // flipping buckets can flip its keep gate)
    val jaccard = common.size.toDouble / (exact.keySet union approx.keySet).size
    assert(jaccard >= 0.9, f"keep-set jaccard $jaccard%.4f")
  }

  test("frozen cutpoints make the approx sample layout- and rerun-independent") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cuts").toString
    def run(): Seq[(Long, Long)] =
      Sampling.curriculumSampleApproxFrozen(spark, sf, artifactDir = dir)
        .collect().map(r => (r.getLong(0), r.getLong(2))).sorted.toSeq
    val conf = spark.conf
    val before = conf.get("spark.sql.shuffle.partitions")
    try {
      conf.set("spark.sql.shuffle.partitions", "4")
      val a = run() // first run freezes the artifact
      conf.set("spark.sql.shuffle.partitions", "7")
      val b = run() // different shuffle layout, same frozen cutpoints
      assert(a.nonEmpty)
      assert(a === b, "frozen-cutpoint sample changed across layouts")
      // the artifact exists and is the tiny per-source table
      val files = new java.io.File(dir).listFiles()
      assert(files != null && files.nonEmpty)
    } finally conf.set("spark.sql.shuffle.partitions", before)
  }
}
