package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftShims, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** AS-OF JOIN — each left row picks the LATEST right row with
  * right.time <= left.time for the same key (left outer semantics).
  *
  * The reference needs exactly this shape for "the movie's average
  * rating as of the moment the user watched it"
  * (controller.set_movie_watched consults the stats cache current at
  * event time, /root/reference/web/app/controller.py:158-161); event
  * enrichment against slowly-changing aggregates is the general form.
  *
  * Spark has no as-of join. The built-in compositions are a per-key
  * union+window shuffle of BOTH tables into one sort (fragile
  * schema-wise) or an inequality join (quadratic per key). This is the
  * textbook case for a custom operator, per the extension ladder:
  * logical node → planner Strategy → physical sort-merge exec.
  *
  * Physical execution co-partitions both sides by key
  * (ClusteredDistribution with a pinned partition count) and requires
  * (key, time) ascending sort, then runs a single forward merge per
  * partition — no buffering beyond one row, no re-scan, the same
  * shuffle cost as an equi-join. DuckDB's native `ASOF LEFT JOIN` is
  * the oracle.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // pin an identical partition count on both children so the hash
  // exchanges are co-partitioned and zipPartitions is sound
  override def requiredChildDistribution: Seq[Distribution] = {
    val n = Some(conf.numShufflePartitions)
    ClusteredDistribution(leftKeys, requireAllClusterKeys = true, n) ::
    ClusteredDistribution(rightKeys, requireAllClusterKeys = true, n) :: Nil
  }

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTimeExpr = leftTime
    val rTimeExpr = rightTime
    val keyTypes = leftKeys.map(_.dataType)

    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, leftOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rightOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTimeExpr), leftOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTimeExpr), rightOut)
      val keyOrd: Ordering[InternalRow] =
        RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightOut.length)

      new Iterator[InternalRow] {
        // next unconsumed right row (copied out of the projection buffer)
        private var rRow: InternalRow = _
        private var rKey: UnsafeRow = _
        private var rTime: Long = 0L
        // latest right row already consumed, valid for key `lastKey`
        private var lastRow: InternalRow = _
        private var lastKey: UnsafeRow = _

        private def advanceRight(): Boolean = {
          while (rRow == null && rIt.hasNext) {
            val r = rIt.next()
            val t = rTimeProj(r)
            // SQL comparison semantics: NULL time never satisfies
            // r.time <= l.time (getLong on a null field would read
            // epoch 0 and spuriously match) — skip null-timed rows
            if (!t.isNullAt(0)) {
              val time = t.getLong(0)
              rRow = r.copy()
              rKey = rKeyProj(rRow).copy()
              rTime = time
            }
          }
          rRow != null
        }

        override def hasNext: Boolean = lIt.hasNext

        override def next(): InternalRow = {
          val l = lIt.next()
          val lk = lKeyProj(l)
          // SQL equi-join semantics: a null key matches nothing (the
          // natural ordering would otherwise pair null-keyed left rows
          // with null-keyed right rows) — emit the null-extended row
          if (lk.anyNull) return joined(l, nullRight)
          val ltRow = lTimeProj(l)
          // a null-timed left row can match no right row (NULL <= NULL
          // and ts <= NULL are both false in SQL) — null-extend it
          if (ltRow.isNullAt(0)) return joined(l, nullRight)
          val lt = ltRow.getLong(0)
          if (lastKey != null && keyOrd.compare(lastKey, lk) != 0) {
            lastRow = null; lastKey = null
          }
          var advancing = true
          while (advancing && advanceRight()) {
            val c = keyOrd.compare(rKey, lk)
            if (c < 0) {
              rRow = null // right key fell behind: discard, keep scanning
            } else if (c == 0 && rTime <= lt) {
              lastRow = rRow; lastKey = rKey
              rRow = null // consumed; maybe a later one also qualifies
            } else {
              advancing = false // right is ahead of this left row
            }
          }
          joined(l, if (lastRow != null) lastRow else nullRight)
        }
      }
    }
  }

  override protected def withNewChildrenInternal(newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** DataFrame-facing API. */
object AsOf {

  private def attr(df: DataFrame, name: String): Attribute =
    df.queryExecution.analyzed.output
      .find(_.name == name)
      .getOrElse(throw new IllegalArgumentException(
        s"column $name not in ${df.queryExecution.analyzed.output.map(_.name)}"))

  /** leftDf ASOF LEFT JOIN rightDf ON keys AND right.timeCol <= left.timeCol,
    * keeping the latest qualifying right row.
    *
    * Analysis-time validation (the exec reads time values as raw
    * longs): both time columns must be TimestampType or LongType and
    * identical to each other — a DateType/IntegerType would otherwise
    * silently compare day/int units against micros — and key columns
    * must match pairwise in type.
    */
  def join(spark: SparkSession, leftDf: DataFrame, rightDf: DataFrame,
           keys: Seq[(String, String)], leftTimeCol: String, rightTimeCol: String): DataFrame = {
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
    val lKeys = keys.map(k => attr(leftDf, k._1))
    val rKeys = keys.map(k => attr(rightDf, k._2))
    val lTime = attr(leftDf, leftTimeCol)
    val rTime = attr(rightDf, rightTimeCol)
    // TIMESTAMP and TIMESTAMP_NTZ are both micros-encoded longs and
    // may mix (identical under the UTC session TZ this library pins);
    // BIGINT must pair with BIGINT. DateType/IntegerType would compare
    // day/int units against micros — reject at analysis time.
    def isMicros(dt: org.apache.spark.sql.types.DataType): Boolean =
      dt == org.apache.spark.sql.types.TimestampType ||
      dt == org.apache.spark.sql.types.TimestampNTZType
    val bothLong = lTime.dataType == org.apache.spark.sql.types.LongType &&
      rTime.dataType == org.apache.spark.sql.types.LongType
    require((isMicros(lTime.dataType) && isMicros(rTime.dataType)) || bothLong,
      s"as-of time columns must both be TIMESTAMP(_NTZ) or both BIGINT; " +
      s"got ${lTime.dataType} vs ${rTime.dataType}")
    lKeys.zip(rKeys).foreach { case (lk, rk) =>
      require(lk.dataType == rk.dataType,
        s"as-of key type mismatch: ${lk.name}: ${lk.dataType} vs ${rk.name}: ${rk.dataType}")
    }
    val plan = AsOfJoin(
      leftDf.queryExecution.analyzed,
      rightDf.queryExecution.analyzed,
      lKeys, rKeys, lTime, rTime)
    GraftShims.ofRows(spark, plan)
  }
}
