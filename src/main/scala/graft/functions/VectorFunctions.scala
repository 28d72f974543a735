package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the vector/sketch hot paths.
  *
  * Spark's higher-order functions (`zip_with`, `aggregate`) are
  * CodegenFallback — every lambda application is interpreted with
  * boxing, which dominates all-pairs similarity joins (measured 28 s
  * for 2M pair dot products at sf0.1). These expressions generate a
  * tight primitive loop inside whole-stage codegen instead; the same
  * operators drop to ~1 s. Registered as SQL functions (`graft_dot`,
  * `graft_simhash64`) via the session FunctionRegistry so operators
  * compose them with plain `expr(...)`.
  */
object VectorFunctions {

  /** dot(a, b) over array<double> — codegen'd primitive loop. */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = {
      val ok = Seq(left, right).forall(_.dataType match {
        case ArrayType(DoubleType, _) => true
        case _ => false
      })
      if (ok) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<double> inputs, got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_dot"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var s = 0.0
      var i = 0
      while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
      s
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val s = ctx.freshName("s")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $s += $a.getDouble($i) * $b.getDouble($i);
           |}
           |${ev.value} = $s;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** simhash64(hashes) over array<bigint> of token hashes → 64-bit
    * fingerprint (bit i set iff the +1/-1 votes of bit i across tokens
    * sum positive). One codegen'd pass, 64-slot int array on the stack.
    */
  case class SimHash64(child: Expression)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint> input, got ${other.simpleString}")
    }
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_simhash64"

    override def nullSafeEval(input: Any): Any = {
      val hs = input.asInstanceOf[ArrayData]
      val votes = new Array[Int](64)
      var i = 0
      while (i < hs.numElements()) {
        val h = hs.getLong(i)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
        i += 1
      }
      var fp = 0L
      var b = 0
      while (b < 64) { if (votes(b) > 0) fp |= (1L << b); b += 1 }
      fp
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val votes = ctx.freshName("votes")
        val i = ctx.freshName("i")
        val b = ctx.freshName("b")
        val h = ctx.freshName("h")
        val fp = ctx.freshName("fp")
        s"""
           |int[] $votes = new int[64];
           |for (int $i = 0; $i < $a.numElements(); $i++) {
           |  long $h = $a.getLong($i);
           |  for (int $b = 0; $b < 64; $b++) {
           |    if ((($h >>> $b) & 1L) == 1L) $votes[$b]++; else $votes[$b]--;
           |  }
           |}
           |long $fp = 0L;
           |for (int $b = 0; $b < 64; $b++) {
           |  if ($votes[$b] > 0) $fp |= (1L << $b);
           |}
           |${ev.value} = $fp;
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** minhash64(hashes) over array<bigint> of shingle hashes → 64-slot
    * MinHash signature. Permutation p is the murmur3 finalizer applied
    * to `h XOR (p * GOLDEN)` — 64 cheap integer mixes per element in
    * one codegen'd pass, instead of 64 string-concat+rehash rounds per
    * shingle (the interpreted-HOF formulation this replaces).
    */
  case class MinHashSig(child: Expression)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint> input, got ${other.simpleString}")
    }
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_minhash64"

    override def nullSafeEval(input: Any): Any = {
      val hs = input.asInstanceOf[ArrayData]
      val sig = Array.fill(64)(Long.MaxValue)
      var i = 0
      while (i < hs.numElements()) {
        val h = hs.getLong(i)
        var p = 0
        while (p < 64) {
          var x = h ^ (p * -7046029254386353131L) // golden-ratio odd constant
          x ^= (x >>> 33); x *= -49064778989728563L
          x ^= (x >>> 33); x *= -4265267296055464877L
          x ^= (x >>> 33)
          if (x < sig(p)) sig(p) = x
          p += 1
        }
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(sig)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val sig = ctx.freshName("sig")
        val i = ctx.freshName("i")
        val p = ctx.freshName("p")
        val h = ctx.freshName("h")
        val x = ctx.freshName("x")
        s"""
           |long[] $sig = new long[64];
           |java.util.Arrays.fill($sig, Long.MAX_VALUE);
           |for (int $i = 0; $i < $a.numElements(); $i++) {
           |  long $h = $a.getLong($i);
           |  for (int $p = 0; $p < 64; $p++) {
           |    long $x = $h ^ ($p * -7046029254386353131L);
           |    $x ^= ($x >>> 33); $x *= -49064778989728563L;
           |    $x ^= ($x >>> 33); $x *= -4265267296055464877L;
           |    $x ^= ($x >>> 33);
           |    if ($x < $sig[$p]) $sig[$p] = $x;
           |  }
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** hyperplane64(v) over array<double> → 64-bit random-hyperplane
    * (sign-of-projection) signature. Plane p's component for dimension
    * d is a deterministic ±1/uniform derived from splitmix-style
    * mixing of (p, d) — no stored hyperplane matrix, identical on
    * every executor. P(bit differs) = angle/π, so Hamming distance
    * estimates cosine: the classic SimHash-for-vectors LSH, used to
    * bucket near-duplicate candidates without an all-pairs join.
    */
  case class Hyperplane64(child: Expression)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<double> input, got ${other.simpleString}")
    }
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_hyperplane64"

    override def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      var sig = 0L
      var p = 0
      while (p < 64) {
        var dot = 0.0
        var d = 0
        while (d < v.numElements()) {
          var x = (p.toLong << 32 | d.toLong) * -7046029254386353131L
          x = (x ^ (x >>> 30)) * -4658895280553007687L
          x = (x ^ (x >>> 27)) * -7723592293110705685L
          x ^= (x >>> 31)
          // map mixed bits to a uniform in [-1, 1)
          dot += v.getDouble(d) * (x.toDouble / 9.223372036854776e18)
          d += 1
        }
        if (dot > 0) sig |= (1L << p)
        p += 1
      }
      sig
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val sig = ctx.freshName("sig")
        val p = ctx.freshName("p")
        val d = ctx.freshName("d")
        val x = ctx.freshName("x")
        val dot = ctx.freshName("dot")
        s"""
           |long $sig = 0L;
           |for (int $p = 0; $p < 64; $p++) {
           |  double $dot = 0.0;
           |  for (int $d = 0; $d < $a.numElements(); $d++) {
           |    long $x = (((long) $p << 32) | (long) $d) * -7046029254386353131L;
           |    $x = ($x ^ ($x >>> 30)) * -4658895280553007687L;
           |    $x = ($x ^ ($x >>> 27)) * -7723592293110705685L;
           |    $x ^= ($x >>> 31);
           |    $dot += $a.getDouble($d) * ((double) $x / 9.223372036854776e18);
           |  }
           |  if ($dot > 0) $sig |= (1L << $p);
           |}
           |${ev.value} = $sig;
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** hyperplane(v, nwords) over array<double> → array<long> of nwords
    * 64-bit random-hyperplane signature words — the WIDE form of
    * [[Hyperplane64]] for corpora past the 64-bit banding wall.
    *
    * Why it exists: banded LSH candidate volume from RANDOM pairs is
    * C(n,2) · bands · 2^-bandBits — with 16-bit bands (the only
    * geometry 64 bits allows at 4 bands) that term crosses ~10M
    * candidates near n ≈ 10⁶ vectors no matter how clean the corpus
    * is, and grows with n². Wider signatures buy exponentially more
    * selectivity: 4 bands × 32 bits (nwords = 2) puts the random-pair
    * term at C(n,2) · 4 · 2^-32 ≈ 2k candidates at n = 2M while
    * near-identical pairs (cos ≥ 0.99) still collide in ≥1 band with
    * p ≈ 0.999 (per-band p = (1 - θ/π)^32). Cost is linear: nwords×64
    * hyperplane dots per vector, one map-side pass.
    *
    * Plane `w·64 + p` uses the same (planeIdx << 32 | dim) splitmix
    * draw as [[Hyperplane64]], so word 0 IS the 64-bit signature —
    * widening an existing index re-derives, never re-shuffles, and
    * the two functions agree on their shared prefix (spec-pinned).
    */
  case class HyperplaneWide(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double>, int), got (${l.simpleString}, ${r.simpleString})")
    }
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_hyperplane"

    override def nullSafeEval(input: Any, nw: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      val words = nw.asInstanceOf[Int]
      require(words >= 1 && words <= 16, s"$prettyName: nwords must be in [1,16], got $words")
      val out = new Array[Long](words)
      var w = 0
      while (w < words) {
        var sig = 0L
        var p = 0
        while (p < 64) {
          var dot = 0.0
          var d = 0
          while (d < v.numElements()) {
            var x = ((w.toLong * 64 + p) << 32 | d.toLong) * -7046029254386353131L
            x = (x ^ (x >>> 30)) * -4658895280553007687L
            x = (x ^ (x >>> 27)) * -7723592293110705685L
            x ^= (x >>> 31)
            dot += v.getDouble(d) * (x.toDouble / 9.223372036854776e18)
            d += 1
          }
          if (dot > 0) sig |= (1L << p)
          p += 1
        }
        out(w) = sig
        w += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, nw) => {
        val out = ctx.freshName("out")
        val sig = ctx.freshName("sig")
        val w = ctx.freshName("w")
        val p = ctx.freshName("p")
        val d = ctx.freshName("d")
        val x = ctx.freshName("x")
        val dot = ctx.freshName("dot")
        s"""
           |if ($nw < 1 || $nw > 16) {
           |  throw new IllegalArgumentException(
           |    "graft_hyperplane: nwords must be in [1,16], got " + $nw);
           |}
           |long[] $out = new long[$nw];
           |for (int $w = 0; $w < $nw; $w++) {
           |  long $sig = 0L;
           |  for (int $p = 0; $p < 64; $p++) {
           |    double $dot = 0.0;
           |    for (int $d = 0; $d < $a.numElements(); $d++) {
           |      long $x = ((((long) $w * 64 + $p) << 32) | (long) $d) * -7046029254386353131L;
           |      $x = ($x ^ ($x >>> 30)) * -4658895280553007687L;
           |      $x = ($x ^ ($x >>> 27)) * -7723592293110705685L;
           |      $x ^= ($x >>> 31);
           |      $dot += $a.getDouble($d) * ((double) $x / 9.223372036854776e18);
           |    }
           |    if ($dot > 0) $sig |= (1L << $p);
           |  }
           |  $out[$w] = $sig;
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         """.stripMargin
      })

    override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** sq8_encode(v) over array<double> → binary: 8-bit scalar
    * quantization, one byte per component, code = round((x+1)·127.5)
    * clamped to [0, 255] (components of unit-norm embeddings live in
    * [-1, 1]). The point at 100 TB is footprint: a 64-dim float8
    * sketch is 64 B vs 512 B of doubles — 8× less scan bandwidth and
    * cache pressure during candidate generation; exact re-ranking of
    * the survivors uses the full vectors (see Similarity.knnSq8).
    */
  case class Sq8Encode(child: Expression)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<double> input, got ${other.simpleString}")
    }
    override def dataType: DataType = org.apache.spark.sql.types.BinaryType
    override def prettyName: String = "graft_sq8"

    override def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      val out = new Array[Byte](v.numElements())
      var i = 0
      while (i < out.length) {
        val c = Math.max(0, Math.min(255, Math.round((v.getDouble(i) + 1.0) * 127.5).toInt))
        out(i) = c.toByte
        i += 1
      }
      out
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val i = ctx.freshName("i")
        val c = ctx.freshName("c")
        val out = ctx.freshName("out")
        s"""
           |byte[] $out = new byte[$a.numElements()];
           |for (int $i = 0; $i < $out.length; $i++) {
           |  int $c = (int) Math.round(($a.getDouble($i) + 1.0) * 127.5);
           |  if ($c < 0) $c = 0; if ($c > 255) $c = 255;
           |  $out[$i] = (byte) $c;
           |}
           |${ev.value} = $out;
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** sq8_dot(a, b) over (binary, binary) → approximate dot product of
    * the dequantized vectors — the candidate-scoring loop over the
    * 8-bit sketches. Integer multiply-accumulate inside codegen (one
    * int MAC per component), dequantized once at the end:
    * dot ≈ (Σ (ca-127.5)(cb-127.5)) / 127.5².
    */
  case class Sq8Dot(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = {
      val ok = Seq(left, right).forall(_.dataType == org.apache.spark.sql.types.BinaryType)
      if (ok) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires binary inputs, got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_sq8_dot"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[Array[Byte]]
      val y = b.asInstanceOf[Array[Byte]]
      val n = math.min(x.length, y.length)
      // scaled-integer MAC: (2c - 255) is the code centered at zero,
      // doubled — exact in Long, one divide at the end
      var s = 0L
      var i = 0
      while (i < n) {
        s += (2 * (x(i) & 0xFF) - 255).toLong * (2 * (y(i) & 0xFF) - 255).toLong
        i += 1
      }
      s / (4.0 * 127.5 * 127.5)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val s = ctx.freshName("s")
        s"""
           |int $n = java.lang.Math.min($a.length, $b.length);
           |long $s = 0L;
           |for (int $i = 0; $i < $n; $i++) {
           |  $s += (long)(2 * ($a[$i] & 0xFF) - 255) * (long)(2 * ($b[$i] & 0xFF) - 255);
           |}
           |${ev.value} = $s / (4.0 * 127.5 * 127.5);
         """.stripMargin
      })

    override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** shingles(text, n) → distinct n-word shingles in one O(words) pass.
    *
    * The pure-SQL formulation (`transform(sequence(...), i ->
    * element_at(split(text), i+k))`) looks linear but is not: Catalyst
    * collapses the projection holding the split array back into every
    * lambda, re-running the regex split per element — O(words²) per
    * document, and the optimizer duplicates the whole subtree into
    * each join branch (measured 200 s+ at sf0.1 for what this
    * expression does in under a second). One eval call per row makes
    * CodegenFallback harmless here.
    */
  case class Shingles(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (StringType, IntegerType) if right.foldable => TypeCheckResult.TypeCheckSuccess
        case _ => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (string, int literal), got " +
            s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
      }
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "graft_shingles"

    override def nullSafeEval(text: Any, nAny: Any): Any = {
      val n = nAny.asInstanceOf[Int]
      val w = text.asInstanceOf[UTF8String].toString.split("\\s+").filter(_.nonEmpty)
      val out = new java.util.LinkedHashSet[String]()
      if (w.length < n) out.add(w.mkString(" "))
      else {
        val sb = new java.lang.StringBuilder()
        var i = 0
        while (i + n <= w.length) {
          sb.setLength(0)
          var j = 0
          while (j < n) { if (j > 0) sb.append(' '); sb.append(w(i + j)); j += 1 }
          out.add(sb.toString)
          i += 1
        }
      }
      val arr = new Array[AnyRef](out.size)
      val it = out.iterator()
      var k = 0
      while (it.hasNext) { arr(k) = UTF8String.fromString(it.next()); k += 1 }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
    }

    override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Canonical name → builder list for the vector/sketch functions.
    * Single source of truth shared by the programmatic per-session
    * `register` below and the `spark.sql.extensions` deployment path
    * (`graft.GraftExtensions`).
    */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_dot" -> (exprs => DotProduct(exprs(0), exprs(1))),
    "graft_simhash64" -> (exprs => SimHash64(exprs.head)),
    "graft_minhash64" -> (exprs => MinHashSig(exprs.head)),
    "graft_shingles" -> (exprs => Shingles(exprs(0), exprs(1))),
    "graft_hyperplane64" -> (exprs => Hyperplane64(exprs.head)),
    "graft_hyperplane" -> (exprs => HyperplaneWide(exprs(0), exprs(1))),
    "graft_sq8" -> (exprs => Sq8Encode(exprs.head)),
    "graft_sq8_dot" -> (exprs => Sq8Dot(exprs(0), exprs(1))))

  /** Spark ships production Bloom expressions (the machinery behind
    * runtime row-group filtering: `BloomFilterAggregate` builds the
    * filter, `BloomFilterMightContain` probes it) but does not expose
    * them in the public function registry — surface them under graft
    * names for the decontamination scale path. Same codegen'd
    * implementations the optimizer itself injects.
    */
  val bloomBuilders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_bloom_agg" ->
      (exprs => new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        exprs(0), exprs(1), exprs(2))),
    "graft_might_contain" ->
      (exprs => org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        exprs(0), exprs(1))))

  /** Idempotent per-session registration; operators call this before
    * using `expr("graft_dot(...)")` / `expr("graft_simhash64(...)")`.
    */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }

  def registerBloom(spark: SparkSession): Unit =
    bloomBuilders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
