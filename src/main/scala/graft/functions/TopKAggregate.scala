package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** graft_topk(score DOUBLE, id BIGINT, k) → ARRAY<STRUCT<score, id>>,
  * ordered score DESC, id ASC — the heap-based top-k AGGREGATE.
  *
  * The window formulation (`row_number() OVER (PARTITION BY g ORDER BY
  * s DESC)` then `rn <= k`) sorts EVERY row of every group and
  * shuffles them all. This aggregate keeps a bounded k-element min-heap
  * per group, participates in partial aggregation (map-side combine),
  * and ships at most k entries per group per map partition through the
  * shuffle — the difference between sorting 100 TB and shuffling
  * k·|groups| rows.
  *
  * Buffer serialization is a flat (score, id) pair array — 16 bytes per
  * retained element.
  */
case class TopKAgg(
    scoreExpr: Expression,
    idExpr: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKAgg.Heap] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr, kExpr)

  override def checkInputDataTypes(): TypeCheckResult =
    (scoreExpr.dataType, idExpr.dataType, kExpr.dataType) match {
      case (DoubleType, LongType, IntegerType) if kExpr.foldable =>
        // fail misuse at analysis time, not execution: a non-literal or
        // non-positive k would otherwise surface as a runtime CCE /
        // silently-empty arrays deep inside the aggregation
        val kv = kExpr.eval()
        if (kv == null || kv.asInstanceOf[Int] <= 0)
          TypeCheckResult.TypeCheckFailure("graft_topk requires a positive int literal k")
        else TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "graft_topk requires (double, bigint, int literal)")
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): TopKAgg.Heap = new TopKAgg.Heap(k)

  override def update(buf: TopKAgg.Heap, input: InternalRow): TopKAgg.Heap = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null) {
      buf.offer(s.asInstanceOf[Double], i.asInstanceOf[Long])
    }
    buf
  }

  override def merge(buf: TopKAgg.Heap, other: TopKAgg.Heap): TopKAgg.Heap = {
    other.foreach((s, i) => buf.offer(s, i))
    buf
  }

  override def eval(buf: TopKAgg.Heap): Any =
    new GenericArrayData(buf.sortedDesc.map { case (s, i) =>
      InternalRow(s, i)
    })

  override def serialize(buf: TopKAgg.Heap): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKAgg.Heap = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val heap = new TopKAgg.Heap(k)
    var j = 0
    while (j < n) { heap.offer(bb.getDouble, bb.getLong); j += 1 }
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1), kExpr = newChildren(2))
  override def prettyName: String = "graft_topk"
}

object TopKAgg {

  /** Bounded min-heap over (score, id) keeping the k best by
    * (score DESC, id ASC): the worst retained element — lowest score,
    * then largest id — sits at the root and is evicted first.
    *
    * Score comparisons are NaN-total, NOT primitive `<`/`==`: every
    * primitive comparison against NaN is false, so a NaN score (0/0
    * from a zero-norm vector) could lodge at the heap root and block
    * all evictions, and `sortWith` on NaN violates the ordering
    * contract. [[cmpScore]] mirrors Spark's own sort semantics
    * (`nanSafeCompareDoubles`): NaN ranks LARGEST — exactly how the
    * window sort this aggregate replaced ranked it (NaN first under
    * `desc`) — and -0.0 == 0.0 falls to the id tie-break, like
    * Spark's, where raw Double.compare would order the zero signs.
    */
  final class Heap(k: Int) {
    private def cmpScore(x: Double, y: Double): Int = {
      val xN = java.lang.Double.isNaN(x)
      val yN = java.lang.Double.isNaN(y)
      if ((xN && yN) || x == y) 0
      else if (xN) 1
      else if (yN) -1
      else if (x > y) 1
      else -1
    }

    // order "a is worse than b": lower score, or same score and larger id
    private def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
      val c = cmpScore(s1, s2)
      c < 0 || (c == 0 && i1 > i2)
    }

    private val scores = new Array[Double](math.max(k, 1))
    private val ids = new Array[Long](math.max(k, 1))
    private var n = 0

    def size: Int = n

    def offer(s: Double, i: Long): Unit = {
      if (n < k) {
        scores(n) = s; ids(n) = i; n += 1; siftUp(n - 1)
      } else if (k > 0 && worse(scores(0), ids(0), s, i)) {
        scores(0) = s; ids(0) = i; siftDown(0)
      }
    }

    private def siftUp(j0: Int): Unit = {
      var j = j0
      while (j > 0) {
        val p = (j - 1) / 2
        if (worse(scores(j), ids(j), scores(p), ids(p))) { swap(j, p); j = p }
        else return
      }
    }

    private def siftDown(j0: Int): Unit = {
      var j = j0
      while (true) {
        val l = 2 * j + 1; val r = l + 1
        var worst = j
        if (l < n && worse(scores(l), ids(l), scores(worst), ids(worst))) worst = l
        if (r < n && worse(scores(r), ids(r), scores(worst), ids(worst))) worst = r
        if (worst == j) return
        swap(j, worst); j = worst
      }
    }

    private def swap(a: Int, b: Int): Unit = {
      val ts = scores(a); scores(a) = scores(b); scores(b) = ts
      val ti = ids(a); ids(a) = ids(b); ids(b) = ti
    }

    def foreach(f: (Double, Long) => Unit): Unit = {
      var j = 0
      while (j < n) { f(scores(j), ids(j)); j += 1 }
    }

    def sortedDesc: Array[(Double, Long)] = {
      val out = new Array[(Double, Long)](n)
      var j = 0
      while (j < n) { out(j) = (scores(j), ids(j)); j += 1 }
      out.sortWith { case ((s1, i1), (s2, i2)) =>
        val c = cmpScore(s1, s2)
        c > 0 || (c == 0 && i1 < i2)
      }
    }
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_topk", exprs => TopKAgg(exprs(0), exprs(1), exprs(2)), "built-in")
}
