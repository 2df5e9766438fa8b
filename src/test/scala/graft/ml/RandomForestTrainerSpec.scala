package graft.ml

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Distributed CART training: the trained forest must recover an exactly
  * learnable step rule (pure regions, integer features → exact split
  * statistics), through the SAME apply path as the reference models. */
class RandomForestTrainerSpec extends SparkTestBase {
  import spark.implicits._

  // label rule: x1 > 8 -> 2 ; else x2 > 4 -> 1 ; else 0
  private def grid = spark.range(0, 1024).select(
    (col("id") % 16 + 1).cast("double").as("x1"),
    (floor(col("id") / 16) % 8 + 1).cast("double").as("x2"),
    (floor(col("id") / 128) + 1).cast("double").as("x3"), // noise feature
    when(col("id") % 16 + 1 > 8, 2)
      .when(floor(col("id") / 16) % 8 + 1 > 4, 1).otherwise(0).as("y"),
    ((col("id") % 16 + 1) * 10 + (floor(col("id") / 16) % 8 + 1)).cast("double").as("yr"))

  test("classification recovers the generating rule exactly") {
    val forest = RandomForestTrainer.train(grid, Seq("x1", "x2", "x3"), "y",
      numTrees = 3, maxDepth = 4, numClasses = 3)
    assert(forest.trees.size == 3)
    val feats = Map("x1" -> col("x1"), "x2" -> col("x2"), "x3" -> col("x3"))
    val votes = RandomForest.classifyVoteColumns(forest, feats, 3)
    val pred = RandomForest.argmaxColumn(votes, Seq("0", "1", "2")).cast("int")
    val wrong = grid.where(pred =!= col("y")).count()
    assert(wrong == 0)
  }

  test("bagging + mtry forest still classifies the pure regions") {
    val forest = RandomForestTrainer.train(grid, Seq("x1", "x2", "x3"), "y",
      numTrees = 7, maxDepth = 5, numClasses = 3, subsample = 0.7, mtry = 2, seed = 7L)
    val feats = Map("x1" -> col("x1"), "x2" -> col("x2"), "x3" -> col("x3"))
    val votes = RandomForest.classifyVoteColumns(forest, feats, 3)
    val pred = RandomForest.argmaxColumn(votes, Seq("0", "1", "2")).cast("int")
    // majority over 7 bagged trees: allow a thin error margin at region edges
    assert(grid.where(pred =!= col("y")).count() <= 16)
  }

  test("regression: deep tree reproduces the piecewise-constant target") {
    // yr has 128 distinct values over an 16x8 grid -> depth 7 isolates them
    val forest = RandomForestTrainer.train(grid, Seq("x1", "x2"), "yr",
      numTrees = 1, maxDepth = 8, numClasses = 0)
    val feats = Map("x1" -> col("x1"), "x2" -> col("x2"))
    val pred = RandomForest.regressColumn(forest, feats)
    val maxErr = grid.select(max(abs(pred - col("yr")))).head().getDouble(0)
    assert(maxErr == 0.0) // integer-valued target: statistics are exact
  }

  test("high-cardinality feature switches to quantile thresholds (bounded driver)") {
    val data = spark.range(0, 4000).select(
      (col("id") % 2000).cast("double").as("x1"), // 2000 distinct >> maxBins*2
      when(col("id") % 2000 < 1000, 0).otherwise(1).as("y"))
    val f = RandomForestTrainer.train(data, Seq("x1"), "y",
      numTrees = 1, maxDepth = 2, numClasses = 2, maxBins = 32)
    val votes = RandomForest.classifyVoteColumns(f, Map("x1" -> col("x1")), 2)
    val pred = RandomForest.argmaxColumn(votes, Seq("0", "1")).cast("int")
    val wrong = data.where(pred =!= col("y")).count()
    assert(wrong.toDouble / 4000 < 0.05) // best quantile cut lands within one bucket of 1000
  }

  test("save/load round-trips the forest exactly (bit-identical apply)") {
    val forest = RandomForestTrainer.train(grid, Seq("x1", "x2", "x3"), "y",
      numTrees = 3, maxDepth = 4, numClasses = 3)
    val path = java.nio.file.Files.createTempFile("forest", ".model").toString
    RandomForest.save(forest, path)
    val loaded = RandomForest.load(path)
    assert(loaded == forest) // case-class equality over the whole tree set
    val reg = RandomForestTrainer.train(grid, Seq("x1", "x2"), "yr",
      numTrees = 2, maxDepth = 6, numClasses = 0)
    RandomForest.save(reg, path)
    assert(RandomForest.load(path) == reg)
  }

  test("determinism: same seed -> identical forest") {
    def f() = RandomForestTrainer.train(grid, Seq("x1", "x2", "x3"), "y",
      numTrees = 2, maxDepth = 3, numClasses = 3, subsample = 0.8, mtry = 2, seed = 5L)
    assert(f() == f())
  }
}
