package graft

import java.nio.file.Files
import org.apache.spark.ml.recommendation.ALSModel
import graft.ml.Recommender

/** ALS implicit-feedback recommender: recovers block structure from a
  * synthetic two-community purchase matrix, excludes already-bought items,
  * and save/loads to identical scores.
  */
class RecommenderSpec extends SparkSpec {
  import spark.implicits._

  // two disjoint communities: users 0-4 buy items 100-104 heavily,
  // users 5-9 buy items 200-204; one held-out cell per community
  private lazy val ratings = (for {
    u <- 0 to 9
    i <- if (u < 5) 100 to 104 else 200 to 204
    if !(u == 0 && i == 104) && !(u == 5 && i == 204) // held out
  } yield (u, i, 10.0f)).toDF("user", "item", "rating")

  private lazy val model = Recommender.fit(ratings, rank = 4)

  test("recommendations stay inside the user's community and exclude bought") {
    val recs = Recommender.recommend(model, ratings, k = 3)
      .select("user", "item").as[(Int, Int)].collect().toSeq
    val byUser = recs.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    // user 0's top recommendation must be the held-out in-community item
    assert(byUser(0).head === 104)
    assert(byUser(5).head === 204)
    // nothing already bought is ever recommended
    val bought = ratings.select("user", "item").as[(Int, Int)].collect().toSet
    assert(recs.forall(r => !bought.contains(r)))
  }

  test("fitted model save/loads and scores identically") {
    val dir = Files.createTempDirectory("als-model").toString + "/m"
    model.save(dir)
    val loaded = ALSModel.load(dir)
    val a = Recommender.recommend(model, ratings, k = 3)
      .select("user", "item", "rnk").as[(Int, Int, Int)].collect().toSet
    val b = Recommender.recommend(loaded, ratings, k = 3)
      .select("user", "item", "rnk").as[(Int, Int, Int)].collect().toSet
    assert(a === b)
  }
}
