package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native expressions for the video near-dup detector's two hot
  * loops. Both were pure-builtin SQL (nested `transform`/`filter`/
  * `zip_with`/`aggregate`) — correct, but higher-order functions are
  * CodegenFallback: every window × gridmask candidate and every
  * alignment offset × frame paid an interpreted lambda frame with
  * boxing, and the band emit was measured as the dominant non-decode
  * term of the 100k-clip scale scenario. One `eval` call per row (or
  * per verify pair) with tight primitive loops replaces thousands of
  * lambda applications — the [[VectorFunctions.Shingles]] precedent:
  * CodegenFallback is harmless when the expression is called once per
  * row. Arithmetic mirrors the SQL exactly (same `pmod`/`floor`
  * /`xxhash64`-on-bigint semantics), so band keys — and therefore
  * stored band buckets — are bit-identical to the formulation they
  * replace.
  */
object MediaFunctions {

  private val bandStruct = StructType(Seq(
    StructField("band", IntegerType, nullable = false),
    StructField("key", LongType, nullable = false)))

  /** video_bands(levels) → array<struct<band:int, key:bigint>> — the
    * boundary-aware shifted-grid window keys of
    * `Multimodal.videoBands` (see the emission lemma there): for each
    * 5-frame window w, each gridmask g ∈ 0..15 whose grid-B choices
    * all sit within the re-encode radius of a grid-A boundary emits
    * key = xxhash64 of the 4 quantized delta cells packed base-64.
    */
  case class VideoBandKeys(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<int> input, got ${other.simpleString}")
    }
    override def dataType: DataType = ArrayType(bandStruct, containsNull = false)
    override def prettyName: String = "graft_video_bands"

    override def nullSafeEval(input: Any): Any = {
      val lv = input.asInstanceOf[ArrayData]
      val n = lv.numElements()
      val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
      val d = new Array[Int](4)
      var w = 0
      while (w <= n - 5) {
        var i = 0
        while (i < 4) { d(i) = lv.getInt(w + i + 1) - lv.getInt(w + i) + 256; i += 1 }
        var g = 0
        while (g < 16) {
          // allowed: every grid-B bit's delta is within 6 of an
          // A-cell boundary (pmod semantics — non-negative remainder)
          var allowed = true
          var j = 0
          while (allowed && j < 4) {
            if (((g >> j) & 1) == 1) {
              val r = Math.floorMod(d(j), 32)
              if (r >= 6 && r < 26) allowed = false
            }
            j += 1
          }
          if (allowed) {
            var combined = 0L
            var k = 0
            while (k < 4) {
              val cell = Math.floor((d(k) + ((g >> k) & 1) * 16) / 32.0).toLong
              combined = combined * 64L + cell
              k += 1
            }
            out += new GenericInternalRow(Array[Any](g, XXH64.hashLong(combined, 42L)))
          }
          g += 1
        }
        w += 1
      }
      new GenericArrayData(out.toArray[Any])
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** align_diff(a, b) → minimum over offsets −maxTrim..maxTrim of the
    * mean absolute luminance difference across the overlap (overlaps
    * shorter than minOverlap score 1.0e9) — the exact-verify stage of
    * `Multimodal.videoDups`, one eval per candidate pair.
    */
  case class AlignDiff(left: Expression, right: Expression,
      maxTrim: Int, minOverlap: Int)
      extends BinaryExpression with CodegenFallback {
    override def checkInputDataTypes(): TypeCheckResult = {
      val ok = Seq(left, right).forall(_.dataType match {
        case ArrayType(IntegerType, _) => true
        case _ => false
      })
      if (ok) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<int> inputs, got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_align_diff"

    override def nullSafeEval(aAny: Any, bAny: Any): Any = {
      val a = aAny.asInstanceOf[ArrayData]
      val b = bAny.asInstanceOf[ArrayData]
      val na = a.numElements()
      val nb = b.numElements()
      var best = Double.PositiveInfinity
      var o = -maxTrim
      while (o <= maxTrim) {
        // overlap of a shifted right by o against b (o ≥ 0: drop a's
        // head; o < 0: drop b's head) — same slices as the SQL form
        val n = if (o >= 0) math.min(na - o, nb) else math.min(na, nb + o)
        val score =
          if (n >= minOverlap) {
            val aOff = if (o >= 0) o else 0
            val bOff = if (o >= 0) 0 else -o
            var sum = 0L
            var i = 0
            while (i < n) {
              sum += math.abs(a.getInt(aOff + i) - b.getInt(bOff + i))
              i += 1
            }
            sum.toInt / n.toDouble
          } else 1.0e9
        if (score < best) best = score
        o += 1
      }
      best
    }

    override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }
}
