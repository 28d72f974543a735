package graft

import graft.sources.MovieLens
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Fidelity suite on the reference's own dataset (ml-latest-small).
  * The reference README reports scikit-surprise SVD at ~0.87 RMSE
  * after grid search; untuned-but-sane ALS should land well under 1.0
  * on the same data, and the analytic queries should reproduce the
  * README's documented outputs (e.g. Shawshank as the top movie).
  */
class MovieLensSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("ratings CSV loads the full 100k dataset with proper types") {
    val r = MovieLens.ratings(spark)
    assert(r.count() === 100836)
    assert(r.schema("rating").dataType.typeName === "float")
  }

  test("movies CSV handles fully-quoted fields with embedded commas") {
    val m = MovieLens.movies(spark).cache()
    assert(m.count() > 9000)
    val toyStory = m.filter(col("movie_id") === 1).head()
    assert(toyStory.getAs[String]("title") === "Toy Story")
    assert(toyStory.getAs[Int]("year") === 1995)
    m.unpersist()
  }

  test("top movies on real data matches the reference README's ranking") {
    // README example: Shawshank (318) votes=289 avg≈4.588, Forrest Gump
    // (356) votes=276 — computed over explicit ratings >= 3.5
    val top = MovieLens.topMovies(spark, topN = 3).collect()
    assert(top.head.getAs[Int]("movie_id") === 318)
    assert(top.head.getAs[Long]("votes") === 289L)
    assert(math.abs(top.head.getAs[Double]("avg_rating") - 4.5882) < 0.001)
    assert(top(1).getAs[Int]("movie_id") === 356)
    assert(top(1).getAs[Long]("votes") === 276L)
  }

  test("user 40's top ratings reproduce the README's documented response") {
    // README GET /user/40/ratings/top example: It's My Party (685,
    // 5.0, 1996-05-14 07:54:02) then Antonia's Line (82, 5.0, 07:49:11)
    val top = MovieLens.userRatings(spark, userId = 40, limit = 2).collect()
    assert(top(0).getAs[Int]("movie_id") === 685)
    assert(top(0).getAs[String]("title") === "It's My Party")
    assert(top(1).getAs[Int]("movie_id") === 82)
    assert(top(1).getAs[String]("title") === "Antonia's Line")
  }

  test("user 50's latest rating reproduces the README's documented response") {
    // README GET /user/50/ratings/latest example: The Good, the Bad
    // and the Ugly (1201, 4.0, 2018-09-13 20:20:06)
    val latest = MovieLens.userRatings(spark, userId = 50, limit = 1, byRating = false).head()
    assert(latest.getAs[Int]("movie_id") === 1201)
    assert(latest.getAs[Float]("rating") === 4.0f)
  }

  test("ALS on MovieLens matches the reference's SVD accuracy") {
    val row = MovieLens.alsEval(spark).head()
    val rmse = row.getAs[Double]("rmse")
    val mae = row.getAs[Double]("mae")
    // trainer.py reports ~0.87 RMSE with scikit-surprise SVD; the swept
    // ALS defaults land 0.8723 on the hash split — hold the parity bar
    assert(rmse < 0.89, s"rmse=$rmse should match the reference (~0.87)")
    assert(mae < 0.72, s"mae=$mae")
  }

  test("swept ALS cell holds parity on a held-out second split") {
    // the rank-48/iter-15/reg-0.14 defaults were SWEPT on the seed-0
    // split above, so that assertion is in-sample for model selection;
    // a different fold seed is data the sweep never saw — the parity
    // bar must hold there too or the cell is overfit to one split
    val row = MovieLens.alsEval(spark, splitSeed = 7).head()
    val rmse = row.getAs[Double]("rmse")
    assert(rmse < 0.89, s"held-out-split rmse=$rmse should match the reference (~0.87)")
  }

  test("genre enrichment analytics re-derive prepare_dataset.py's columns") {
    val rows = MovieLens.genreStats(spark).collect()
    val byGenre = rows.map(r => r.getAs[String]("genre") -> r).toMap
    // the enriched CSV's own header row genres (Toy Story:
    // Animation|Comedy|Family) must all surface as explode groups
    assert(Seq("Animation", "Comedy", "Family").forall(byGenre.contains))
    // no empty-genre group leaks through the split
    assert(!byGenre.contains(""))
    rows.foreach { r =>
      val miny = r.getAs[Int]("min_year"); val maxy = r.getAs[Int]("max_year")
      assert(miny >= 1900 && maxy <= 2020 && miny <= maxy,
        s"${r.getAs[String]("genre")}: years $miny..$maxy")
    }
    // votes-weighted avg rating stays on the half-star scale
    rows.filter(_.getAs[Long]("votes") > 0).foreach { r =>
      val a = r.getAs[Double]("avg_rating")
      assert(a >= 0.5 && a <= 5.0)
    }
  }
}
