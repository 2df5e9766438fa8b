package graft.ml

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import RandomForest._

/** CART-apply semantics vs hand-computed goldens: ordinal split goes LEFT on
  * x <= threshold (smile.base.cart.OrdinalNode), classification = majority
  * vote with ties to the smallest class index (smile argmax), regression =
  * mean over trees in tree order. */
class RandomForestSpec extends SparkTestBase {
  import spark.implicits._

  private val feats = Seq("a", "b")

  test("ordinal split: left iff x <= threshold (boundary inclusive)") {
    // tree: a <= 1.0 ? 10 : (b <= 2.0 ? 20 : 30)
    val t = Split(0, 1.0, Leaf(10), Split(1, 2.0, Leaf(20), Leaf(30)))
    val f = Forest(feats, Seq(t))
    val df = Seq((1.0, 5.0), (1.5, 2.0), (1.5, 2.5)).toDF("a", "b")
    val out = df.select(regressColumn(f, Map("a" -> col("a"), "b" -> col("b"))).as("p"))
      .collect().map(_.getDouble(0)).toSeq
    assert(out == Seq(10.0, 20.0, 30.0)) // a=1.0 takes the LEFT branch
  }

  test("classification: majority vote, ties to smallest class index") {
    // three stump trees voting classes (0, 1, 1) for a<=0, (2, 2, 1) else
    val trees = Seq(
      Split(0, 0.0, Leaf(0), Leaf(2)),
      Split(0, 0.0, Leaf(1), Leaf(2)),
      Split(0, 0.0, Leaf(1), Leaf(1)))
    val f = Forest(feats, trees)
    val df = Seq((0.0, 0.0), (1.0, 0.0)).toDF("a", "b")
    val m = Map("a" -> col("a"), "b" -> col("b"))
    val votes = classifyVoteColumns(f, m, 3)
    val out = df.select(argmaxColumn(votes, Seq("c0", "c1", "c2")).as("cls"))
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("c1", "c2")) // votes (1,2,0) -> c1; (0,1,2) -> c2
    // tie case: two stumps voting (0, 2) / (2, 0) -> counts (1,0,1) -> c0
    val f2 = Forest(feats, Seq(Split(0, 0.0, Leaf(0), Leaf(2)), Split(0, 0.0, Leaf(2), Leaf(0))))
    val v2 = classifyVoteColumns(f2, m, 3)
    val out2 = Seq((0.0, 0.0)).toDF("a", "b")
      .select(argmaxColumn(v2, Seq("c0", "c1", "c2")).as("cls")).head().getString(0)
    assert(out2 == "c0")
  }

  test("regression: mean over trees; SQL emission matches Catalyst result") {
    val f = synthetic(Seq(("a", 0.0, 10.0), ("b", 0.0, 1.0)), numTrees = 7, depth = 3,
      leafValue = r => math.rint(r.nextDouble() * 1000) / 1000, seed = 7L)
    val df = spark.range(0, 50).select(
      (col("id") % 10).cast("double").as("a"), ((col("id") % 7).cast("double") / 7).as("b"))
    val m = Map("a" -> col("a"), "b" -> col("b"))
    val catalyst = df.select(round(regressColumn(f, m), 9).as("p"))
      .collect().map(_.getDouble(0)).toSeq
    // evaluate the emitted SQL through Spark SQL itself (same IEEE tree)
    df.createOrReplaceTempView("rf_in")
    val sql = RandomForest.regressSql(f, Map("a" -> "a", "b" -> "b"))
    val viaSql = spark.sql(s"SELECT round($sql, 9) AS p FROM rf_in")
      .collect().map(_.getDouble(0)).toSeq
    assert(catalyst == viaSql)
    assert(catalyst.distinct.size > 3) // non-degenerate
  }
}
