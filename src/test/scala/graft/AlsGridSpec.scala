package graft

import graft.recommender.Als
import org.scalatest.funsuite.AnyFunSuite

/** Pins the reference-exact selection protocol of [[Als.gridSearch]]
  * (trainer.py:45-60 GridSearchCV: k-fold CV per grid cell,
  * best-by-mean-RMSE) — shape and winner semantics, on a small grid so
  * the suite stays fast; the metric values themselves are rows-only
  * (ML, not oracle-checkable).
  */
class AlsGridSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("grid search runs CV per cell and elects the min-mean-RMSE winner") {
    val ranks = Seq(4)
    val regs = Seq(0.05, 0.1)
    val iters = Seq(2, 5)
    val folds = 2
    val rows = Als.gridSearch(spark, sf, ranks, regs, iters, folds).collect()
    // one row per (cell, fold) + exactly one winner row
    assert(rows.length === ranks.size * regs.size * iters.size * folds + 1)
    val winners = rows.filter(_.getAs[Long]("fold") == -1L)
    assert(winners.length === 1)
    val winner = winners.head
    // winner's mean RMSE equals the min of the per-cell fold means
    val perCell = rows.filter(_.getAs[Long]("fold") >= 0L)
      .groupBy(r => (r.getAs[Int]("rank"), r.getAs[Double]("reg_param"), r.getAs[Int]("max_iter")))
      .map { case (cell, rs) =>
        cell -> math.rint(rs.map(_.getAs[Double]("rmse")).sum / rs.size * 10000) / 10000
      }
    val bestMean = perCell.values.min
    assert(winner.getAs[Double]("rmse") === bestMean)
    assert(perCell((winner.getAs[Int]("rank"), winner.getAs[Double]("reg_param"),
      winner.getAs[Int]("max_iter"))) === bestMean)
    // every fold of every cell actually evaluated on held-out data
    assert(rows.filter(_.getAs[Long]("fold") >= 0L).forall(_.getAs[Double]("rmse") > 0.0))
    // the maxIter axis genuinely varies training: with everything else
    // fixed, 2-iter and 5-iter cells disagree on at least one fold
    val byIter = rows.filter(_.getAs[Long]("fold") >= 0L)
      .groupBy(_.getAs[Int]("max_iter")).view.mapValues(
        _.map(r => (r.getAs[Double]("reg_param"), r.getAs[Long]("fold"), r.getAs[Double]("rmse"))).toSet)
    assert(byIter(2).map(t => (t._1, t._2)) === byIter(5).map(t => (t._1, t._2)))
    assert(byIter(2) !== byIter(5))
  }
}
