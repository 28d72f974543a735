package graft

import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{MediaFunctions, VectorFunctions}

/** Bit-parity pins for the r14 native expressions against the exact
  * higher-order-function formulations they replaced. HOFs are
  * CodegenFallback (interpreted lambda frame + boxing per element);
  * these expressions are the same arithmetic as one tight loop — so
  * every test here asserts EQUALITY, not approximation: hashes,
  * signatures, band keys, and verify scores feed stored artifacts and
  * oracle-gated results, and any drift would silently re-key stores.
  */
class NativeExprParitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("graft_hash_arr ≡ transform(xxhash64) including null elements") {
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    val rnd = new scala.util.Random(11)
    val docs = (0 until 200).map { i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(30))(rnd.alphanumeric.take(1 + rnd.nextInt(12)).mkString))
    }.toDF("id", "strs")
      // force a null element into some rows — xxhash64(NULL) = seed 42
      .withColumn("strs", expr("CASE WHEN id % 7 = 0 THEN concat(strs, array(CAST(NULL AS STRING))) ELSE strs END"))
    val both = docs
      .withColumn("a", expr("graft_hash_arr(strs)"))
      .withColumn("b", expr("transform(strs, s -> xxhash64(s))"))
    assert(both.filter(!(col("a") <=> col("b"))).count() === 0)
  }

  test("graft_sig_agree / graft_hamming ≡ their zip_with/aggregate forms") {
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    val rnd = new scala.util.Random(13)
    val rows = (0 until 300).map { i =>
      val a = Seq.fill(64)(rnd.nextLong())
      // half the positions agree on ~half the rows
      val b = a.zipWithIndex.map { case (v, j) =>
        if ((i + j) % 2 == 0) v else rnd.nextLong()
      }
      (i.toLong, a, b)
    }.toDF("id", "sig_a", "sig_b")
    val both = rows
      .withColumn("agree_n", expr("graft_sig_agree(sig_a, sig_b)"))
      .withColumn("agree_o",
        expr("aggregate(zip_with(sig_a, sig_b, (x, y) -> IF(x = y, 1, 0)), 0, (acc, v) -> acc + v)"))
      .withColumn("ham_n", expr("graft_hamming(sig_a, sig_b)"))
      .withColumn("ham_o",
        expr("aggregate(zip_with(sig_a, sig_b, (x, y) -> bit_count(x ^ y)), 0, (acc, v) -> acc + v)"))
    assert(both.filter(col("agree_n") =!= col("agree_o")).count() === 0)
    assert(both.filter(col("ham_n") =!= col("ham_o")).count() === 0)
    // MIN-LENGTH CONTRACT on unequal widths (the one place the HOF
    // forms disagreed with EACH OTHER): zip_with null-pads the short
    // side — the IF(x = y, 1, 0) agree form zeroes padded positions
    // (≡ the native shared-prefix count), while bit_count(x ^ null)
    // nulls the whole Hamming sum. The natives count the shared
    // prefix in BOTH — deliberate: every caller compares fixed-width
    // signatures, and a prefix count degrades more usefully than a
    // NULL if widths ever drift mid-migration. This pin makes the
    // contract a spec fact rather than a silent semantic difference.
    val uneq = Seq((1L, Seq(1L, 2L, 3L, 4L), Seq(1L, 9L, 3L)))
      .toDF("id", "sig_a", "sig_b")
      .withColumn("agree_n", expr("graft_sig_agree(sig_a, sig_b)"))
      .withColumn("agree_o",
        expr("aggregate(zip_with(sig_a, sig_b, (x, y) -> IF(x = y, 1, 0)), 0, (acc, v) -> acc + v)"))
      .withColumn("ham_n", expr("graft_hamming(sig_a, sig_b)"))
      .withColumn("ham_o",
        expr("aggregate(zip_with(sig_a, sig_b, (x, y) -> bit_count(x ^ y)), 0, (acc, v) -> acc + v)"))
      .head()
    assert(uneq.getAs[Int]("agree_n") === 2)           // shared prefix: pos 0 and 2
    assert(uneq.getAs[Int]("agree_o") === 2)           // IF form zeroed the padding
    assert(uneq.getAs[Int]("ham_n") ===
      java.lang.Long.bitCount(2L ^ 9L))                // prefix position 1 differs
    assert(uneq.isNullAt(uneq.fieldIndex("ham_o")))    // XOR form nulled the sum
  }

  test("VideoBandKeys ≡ the builtin-SQL boundary-aware banding, keys bit-identical") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    // realistic levels (0..255) plus the −255 undecodable sentinel
    val rows = (0 until 120).map { i =>
      val n = 5 + rnd.nextInt(20)
      (i.toLong, Seq.fill(n)(if (rnd.nextInt(50) == 0) -255 else rnd.nextInt(256)))
    }.toDF("doc_id", "levels")
    // oracle: the pre-r14 SQL formulation, verbatim
    def d(i: Int) =
      s"(element_at(levels, w + ${i + 2}) - element_at(levels, w + ${i + 1}) + 256)"
    val bits = Seq("pmod(g, 2)", "pmod(g div 2, 2)", "pmod(g div 4, 2)", "pmod(g div 8, 2)")
    def cell(i: Int) = s"cast(floor((${d(i)} + ${bits(i)} * 16) / 32) as bigint)"
    def needB(i: Int) = s"(pmod(${d(i)}, 32) < 6 OR pmod(${d(i)}, 32) >= 26)"
    val combined = (0 until 4).map(cell).reduce((a, b) => s"($a * 64 + $b)")
    val allowed = (0 until 4).map(i => s"(${bits(i)} = 0 OR ${needB(i)})").mkString(" AND ")
    val oracle = rows.select(col("doc_id"), explode(expr(
      "flatten(transform(sequence(0, size(levels) - 5), w -> " +
      s"transform(filter(sequence(0, 15), g -> $allowed), g -> " +
      s"named_struct('band', g, 'key', xxhash64($combined)))))"
    )).as("e")).select(col("doc_id"), col("e.band"), col("e.key"))
    val native = rows.select(col("doc_id"), explode(GraftShims.column(
        MediaFunctions.VideoBandKeys(GraftShims.expression(col("levels"))))).as("e"))
      .select(col("doc_id"), col("e.band"), col("e.key"))
    val o = oracle.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val n = native.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(n.toSeq === o.toSeq) // same multiset AND same emission order
    assert(n.nonEmpty)
  }

  test("AlignDiff ≡ the builtin-SQL best-alignment mean |Δ| over all trim offsets") {
    import spark.implicits._
    val rnd = new scala.util.Random(19)
    val maxTrim = 3; val minOverlap = 6
    val pairs = (0 until 150).map { i =>
      val na = 4 + rnd.nextInt(20) // includes overlap-impossible shorts
      val nb = 4 + rnd.nextInt(20)
      val a = Seq.fill(na)(rnd.nextInt(256))
      // half the pairs: b is a trimmed, jittered copy of a
      val b = if (i % 2 == 0 && na > 8)
        a.drop(rnd.nextInt(3)).map(v => math.max(0, math.min(255, v + rnd.nextInt(7) - 3)))
      else Seq.fill(nb)(rnd.nextInt(256))
      (i.toLong, a, b)
    }.toDF("id", "la", "lb")
    def meanAbs(x: String, y: String, n: String) =
      s"CASE WHEN $n >= $minOverlap THEN " +
      s"aggregate(zip_with($x, $y, (p, q) -> abs(p - q)), 0, (acc, x) -> acc + x) " +
      s"/ cast($n as double) ELSE 1.0e9 END"
    val pos = meanAbs(
      s"slice(la, o + 1, least(size(la) - o, size(lb)))",
      s"slice(lb, 1, least(size(la) - o, size(lb)))",
      s"least(size(la) - o, size(lb))")
    val neg = meanAbs(
      s"slice(la, 1, least(size(la), size(lb) + o))",
      s"slice(lb, 1 - o, least(size(la), size(lb) + o))",
      s"least(size(la), size(lb) + o)")
    val oracle = expr(
      s"array_min(transform(sequence(-$maxTrim, $maxTrim), o -> " +
      s"CASE WHEN o >= 0 THEN $pos ELSE $neg END))")
    val native = GraftShims.column(MediaFunctions.AlignDiff(
      GraftShims.expression(col("la")), GraftShims.expression(col("lb")),
      maxTrim, minOverlap))
    val both = pairs.withColumn("o", oracle).withColumn("n", native)
    assert(both.filter(!(col("o") <=> col("n"))).count() === 0)
    // sanity: planted trimmed copies actually score low, randoms high
    assert(both.filter(col("id") % 2 === 0 && col("n") <= 3.0).count() > 0)
  }

  test("graft_word_grams ≡ the transform/concat_ws/slice formulation") {
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    val rnd = new scala.util.Random(23)
    val n = 4
    val rows = (0 until 200).map { i =>
      // includes empty tokens (split on doubled spaces produces them)
      (i.toLong, Seq.fill(n + rnd.nextInt(25))(
        if (rnd.nextInt(10) == 0) "" else rnd.alphanumeric.take(1 + rnd.nextInt(8)).mkString))
    }.toDF("id", "w")
    val both = rows
      .withColumn("a", expr(s"graft_word_grams(w, $n)"))
      .withColumn("b",
        expr(s"transform(sequence(1, size(w) - ${n - 1}), i -> concat_ws(' ', slice(w, i, $n)))"))
    assert(both.filter(!(col("a") <=> col("b"))).count() === 0)
  }

  test("NearestClusters ≡ array_min / array_sort-slice over the centroid literal") {
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    val rnd = new scala.util.Random(29)
    val dim = 16
    val nc = 24
    // shuffled, non-contiguous ids — the expression must preserve the
    // (dist, id) tie ordering, not the sequence order
    val cents: Seq[(Int, Seq[Double])] = rnd.shuffle(
      (0 until nc).map(c => (c * 3 + 1, Seq.fill(dim)(rnd.nextGaussian()))).toVector)
    val vecs = (0L until 300L).map { i =>
      // every 5th row sits exactly ON a centroid (plus one duplicated
      // centroid pair below) to exercise near-tie paths
      val v = if (i % 5 == 0) cents((i % nc).toInt)._2 else Seq.fill(dim)(rnd.nextGaussian())
      (i, v)
    }.toDF("vec_id", "v")
    // duplicate centroid → guaranteed exact dist tie, must break by id
    val centsT = cents :+ (999, cents.head._2)
    val lit = typedLit(centsT.map { case (i, cv) => (cv, cv.map(x => x * x).sum, i) })
    val distArr =
      "transform(cents, c -> struct(norm2 + c._2 - 2.0d * graft_dot(v, c._1) AS dist, c._3 AS cluster))"
    val oracle = vecs
      .withColumn("cents", lit)
      .withColumn("norm2", expr("graft_dot(v, v)"))
      .withColumn("o1", expr(s"array_min($distArr)").getField("cluster"))
      .withColumn("o5", expr(s"slice(array_sort($distArr), 1, 5).cluster"))
    val dimC = centsT.head._2.size
    def nn(k: Int) = GraftShims.column(VectorFunctions.NearestClusters(
      GraftShims.expression(col("v")),
      centsT.flatMap(_._2).toArray,
      centsT.map(_._2.map(x => x * x).sum).toArray,
      centsT.map(_._1).toArray, dimC, k))
    val both = oracle
      .withColumn("n1", element_at(nn(1), 1))
      .withColumn("n5", nn(5))
    assert(both.filter(col("o1") =!= col("n1")).count() === 0)
    assert(both.filter(!(col("o5") <=> col("n5"))).count() === 0)
    // k past the centroid count mirrors slice: returns all, ordered
    val allK = both.withColumn("na", nn(1000))
      .withColumn("oa", expr(s"array_sort($distArr).cluster"))
    assert(allK.filter(!(col("na") <=> col("oa"))).count() === 0)
  }

  test("graft_rolling_fp ≡ the aggregate/transform/split fingerprint fold") {
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    val rnd = new scala.util.Random(31)
    val docs = (0 until 200).map { i =>
      // includes empty docs, repeated/trailing spaces (split keeps the
      // empty tokens; the fold must hash them identically)
      val words = Seq.fill(rnd.nextInt(40))(
        if (rnd.nextInt(8) == 0) "" else rnd.alphanumeric.take(1 + rnd.nextInt(10)).mkString)
      (i.toLong, words.mkString(" ") + (if (i % 9 == 0) " " else ""))
    }.toDF("id", "text")
    val both = docs
      .withColumn("a", expr("graft_rolling_fp(text)"))
      .withColumn("b", expr("aggregate(transform(split(text, ' '), t -> xxhash64(t)), " +
        "0L, (acc, h) -> pmod(acc * 1000003L + (h & 4294967295L), 2147483647L))"))
    assert(both.filter(col("a") =!= col("b")).count() === 0)
  }

  test("native expressions on degenerate shapes: empty arrays, short inputs") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType, LongType, StringType}
    def arr(e: Any): ArrayData = e.asInstanceOf[ArrayData]
    val emptyS = Literal.create(Seq.empty[String], ArrayType(StringType))
    val emptyL = Literal.create(Seq.empty[Long], ArrayType(LongType))
    val emptyD = Literal.create(Seq.empty[Double], ArrayType(DoubleType))
    val emptyI = Literal.create(Seq.empty[Int], ArrayType(IntegerType))
    // empty token array → no grams, no hashes
    assert(arr(VectorFunctions.WordGrams(emptyS, Literal(3)).eval(null)).numElements() === 0)
    assert(arr(VectorFunctions.HashStrArr(emptyS).eval(null)).numElements() === 0)
    // one word, n=3: shorter than a gram → empty (callers pre-filter,
    // but the expression must stay total)
    assert(arr(VectorFunctions.WordGrams(
      Literal.create(Seq("a"), ArrayType(StringType)), Literal(3)).eval(null))
      .numElements() === 0)
    // empty signatures agree on nothing and differ in nothing
    assert(VectorFunctions.SigAgree(emptyL, emptyL).eval(null) === 0)
    assert(VectorFunctions.HammingWide(emptyL, emptyL).eval(null) === 0)
    // empty vector divides/encodes to empty / code of all-zero argmins
    assert(arr(VectorFunctions.VecDiv(emptyD, Literal(2.0)).eval(null)).numElements() === 0)
    // empty LUT/code → ADC sum 0
    assert(VectorFunctions.PqAdc(emptyD, emptyI, 8).eval(null) === 0.0)
    // fewer than 5 frames → no windows, no band keys
    assert(arr(MediaFunctions.VideoBandKeys(
      Literal.create(Seq(1, 2, 3, 4), ArrayType(IntegerType))).eval(null))
      .numElements() === 0)
    // overlap below minOverlap at every offset → the 1.0e9 sentinel
    assert(MediaFunctions.AlignDiff(
      Literal.create(Seq(1, 2), ArrayType(IntegerType)),
      Literal.create(Seq(1, 2), ArrayType(IntegerType)),
      maxTrim = 3, minOverlap = 6).eval(null) === 1.0e9)
    // empty text still fingerprints (one empty token, not a crash)
    assert(VectorFunctions.RollingFp(Literal.create("", StringType)).eval(null)
      .isInstanceOf[Long])
    // vector shorter than the centroid dim: argmin over the shared
    // prefix (min-length contract), still returns k ids
    val nc = VectorFunctions.NearestClusters(
      Literal.create(Seq(1.0), ArrayType(DoubleType)),
      Array(1.0, 0.0, 0.0, 1.0), Array(1.0, 1.0), Array(0, 1), dim = 2, k = 2)
    assert(arr(nc.eval(null)).toIntArray().toSeq === Seq(0, 1))
    // PqEncode on a SHORT vector fails LOUDLY with the dimension
    // mismatch named (r15, the r14 ADVICE: the unguarded inner loop
    // was an opaque ArrayIndexOutOfBounds interpreted / undefined
    // UnsafeArrayData read under codegen)
    val shortErr = intercept[IllegalArgumentException] {
      VectorFunctions.PqEncode(
        Literal.create(Seq(1.0), ArrayType(DoubleType)),
        books = Array.fill(2 * 2 * 2)(0.5), c2 = Array.fill(4)(0.5),
        m = 2, ncent = 2, sub = 2).eval(null)
    }
    assert(shortErr.getMessage.contains("graft_pq_encode") &&
      shortErr.getMessage.contains("m*sub"))
  }

  test("graft_vdiv interpreted eval matches codegen (UnsafeArrayData path)") {
    // the expression appears inside non-codegen contexts too
    // (e.g. under CodegenFallback parents) — pin eval directly
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val v = Array(1.0, -2.5, 3.75)
    val got = VectorFunctions.VecDiv(
        Literal.create(v.toSeq, ArrayType(DoubleType)), Literal(2.0))
      .eval(null).asInstanceOf[ArrayData].toDoubleArray()
    assert(got.toSeq === v.map(_ / 2.0).toSeq)
  }
}
