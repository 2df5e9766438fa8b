package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import RandomForest.{Forest, Leaf, Node, Split}

/**
 * From-scratch distributed CART / random-forest TRAINING — the counterpart
 * of the reference's `createRandomForestModel`
 * (TypologyClassification.groovy:555-650), which delegates to smile's
 * single-node `RandomForestClassification/Regression.fit`. Here training is
 * the PLANET / Spark-MLlib shape: trees grow LEVEL-synchronous, and each
 * level is ONE distributed aggregation — every row emits (node, feature,
 * bin) statistics, a hash aggregate reduces them, and the driver picks the
 * best split per node from the bin histograms (Gini for classification,
 * variance for regression). Driver state is O(#nodes × #features × #bins),
 * never O(rows); rows are never collected.
 *
 * Deliberate divergences from smile, documented:
 *  - candidate thresholds are midpoints of the (capped) distinct value set,
 *    computed once per feature — above `maxBins` distinct values an
 *    equi-spaced quantile subset is used (smile scans every sorted value);
 *  - bagging is a deterministic hash subsample (include row t iff
 *    xxhash64(features, tree, seed) mod 1000 < rate·1000) instead of
 *    bootstrap-with-replacement — reproducible across runs and partitions;
 *  - mtry feature subsets are drawn per (tree, depth) from a seeded RNG.
 *
 * Split semantics match the APPLY side exactly (left iff x <= threshold;
 * classification leaves are class indices, ties toward the smallest index),
 * so a trained Forest runs through the same Catalyst/SQL emitters.
 */
object RandomForestTrainer {

  /** Per-(node,featureSlot,bin) label histogram / moment rows. */
  private final case class BinStat(node: Int, slot: Int, bin: Int,
                                   label: Int, n: Long, sum: Double, sum2: Double)

  /**
   * Train a forest.
   * @param data       training rows (numeric feature columns + label)
   * @param features   feature column names (all numeric)
   * @param labelCol   class index (classification) or numeric target
   * @param numClasses > 0 → Gini classification (labels 0..numClasses-1);
   *                   0 → variance-reduction regression
   * @param subsample  per-tree deterministic hash subsample rate
   * @param mtry       feature-subset size per (tree, level); <=0 → all
   */
  def train(data: DataFrame, features: Seq[String], labelCol: String,
            numTrees: Int, maxDepth: Int, numClasses: Int,
            nodeSize: Int = 1, subsample: Double = 1.0, mtry: Int = 0,
            maxBins: Int = 64, seed: Long = 42L): Forest = {
    require(features.nonEmpty && numTrees > 0 && maxDepth >= 1)
    val df = data.select(
      (features.map(f => col(f).cast("double").as(f)) :+
        (if (numClasses > 0) col(labelCol).cast("int").as("__y")
         else col(labelCol).cast("double").as("__y"))): _*)
      .na.drop() // smile's omitNullRows (TypologyClassification.groovy:595)
      .localCheckpoint() // read maxDepth times per tree
    // candidate thresholds per feature: midpoints of the sorted distinct
    // values when few (exact, smile-like), else approx quantiles — the cap
    // is applied DISTRIBUTEDLY (low-cardinality check first), so the driver
    // never collects an unbounded distinct set at data scale
    val thresholds: Array[Array[Double]] = features.map { f =>
      val nd = df.select(approx_count_distinct(col(f)).as("n")).head().getLong(0)
      val vs: Array[Double] =
        if (nd <= maxBins * 2) // approx count: 2x slack before switching modes
          df.select(col(f)).where(col(f).isNotNull).distinct()
            .orderBy(col(f)).collect().map(_.getDouble(0))
        else {
          val qs = (0 until maxBins).map(i => i.toDouble / (maxBins - 1))
          df.where(col(f).isNotNull)
            .select(percentile_approx(col(f), typedLit(qs), lit(10000)).as("q"))
            .head().getSeq[Double](0).distinct.sorted.toArray
        }
      vs.sliding(2).collect { case Array(a, b) => (a + b) / 2 }.toArray
    }.toArray
    val rnd = new scala.util.Random(seed)
    val trees = (0 until numTrees).map { t =>
      val bag =
        if (subsample >= 1.0) df
        else df.where(pmod(xxhash64(features.map(col) :+ lit(t) :+ lit(seed): _*),
          lit(1000L)) < (subsample * 1000).toLong)
      growTree(bag, features, thresholds, maxDepth, numClasses, nodeSize, mtry, rnd)
    }
    Forest(features, trees)
  }

  /** Level-synchronous growth of one tree. */
  private def growTree(df: DataFrame, features: Seq[String],
                       thresholds: Array[Array[Double]], maxDepth: Int,
                       numClasses: Int, nodeSize: Int, mtry: Int,
                       rnd: scala.util.Random): Node = {
    // mutable node table: id -> either a pending region, a split, or a leaf
    val splits = scala.collection.mutable.Map.empty[Int, (Int, Double)] // node -> (feature, thr)
    val leaves = scala.collection.mutable.Map.empty[Int, Double]
    var frontier = Set(1) // node ids: root 1, children 2n / 2n+1
    var depth = 0
    while (frontier.nonEmpty && depth < maxDepth) {
      val slots: Seq[Int] =
        if (mtry <= 0 || mtry >= features.size) features.indices
        else rnd.shuffle(features.indices.toList).take(mtry).sorted
      val stats = levelStats(df, features, thresholds, splits, frontier, slots, numClasses)
      val nextFrontier = Set.newBuilder[Int]
      for (node <- frontier) {
        val nodeStats = stats.filter(_.node == node)
        bestSplit(nodeStats, slots, thresholds, numClasses, nodeSize) match {
          case Some((f, thr)) if depth < maxDepth - 1 =>
            splits(node) = (f, thr)
            nextFrontier += 2 * node += 2 * node + 1
          case _ =>
            leaves(node) = leafValue(nodeStats, numClasses)
        }
      }
      frontier = nextFrontier.result()
      depth += 1
    }
    // depth cap reached with pending frontier nodes: close them as leaves
    if (frontier.nonEmpty) {
      val stats = levelStats(df, features, thresholds, splits, frontier,
        Seq(0), numClasses) // any single slot: only the label marginals are used
      for (node <- frontier) leaves(node) = leafValue(stats.filter(_.node == node), numClasses)
    }
    build(1, splits.toMap, leaves.toMap)
  }

  /** One distributed pass: per (frontier node, feature slot, bin) label
    * histograms (classification) or moments (regression). Each row emits
    * #slots structs; the shuffle carries only the aggregated histogram. */
  private def levelStats(df: DataFrame, features: Seq[String],
                         thresholds: Array[Array[Double]],
                         splits: collection.Map[Int, (Int, Double)],
                         frontier: Set[Int], slots: Seq[Int],
                         numClasses: Int): Array[BinStat] = {
    // current node id of each row: descend the (tiny, broadcast-closure)
    // partial split map — a per-row UDF walk, one level pass per depth (a
    // Column re-expansion of the tree would grow exponentially with depth)
    val splitMap = splits.toMap
    val nodeUdf = udf { (fs: Seq[Double]) =>
      var n = 1
      var continue = true
      while (continue) splitMap.get(n) match {
        case Some((f, thr)) => n = if (fs(f) <= thr) 2 * n else 2 * n + 1
        case None => continue = false
      }
      n
    }
    val nodeCol = nodeUdf(array(features.map(col): _*))
    // bin of a value = #thresholds <= value (thresholds are few: a sum of
    // comparisons stays codegen-friendly)
    def binCol(slot: Int): Column = {
      val ths = thresholds(slot)
      if (ths.isEmpty) lit(0)
      else ths.map(t => when(col(features(slot)) > t, 1).otherwise(0)).reduce(_ + _)
    }
    val emits = array(slots.map(s =>
      struct(lit(s).as("slot"), binCol(s).cast("int").as("bin"))): _*)
    val y = if (numClasses > 0) col("__y") else lit(0)
    df.withColumn("__node", nodeCol)
      .where(col("__node").isInCollection(frontier.toSeq))
      .select(col("__node"), col("__y"), explode(emits).as("__e"))
      .groupBy(col("__node"), col("__e.slot").as("__slot"), col("__e.bin").as("__bin"),
        (if (numClasses > 0) col("__y") else lit(0)).as("__label"))
      .agg(count(lit(1)).as("n"), sum(col("__y").cast("double")).as("s"),
        sum(col("__y").cast("double") * col("__y").cast("double")).as("s2"))
      .collect().map(r => BinStat(r.getInt(0), r.getInt(1), r.getInt(2),
        r.getInt(3), r.getLong(4), r.getDouble(5), r.getDouble(6)))
  }

  /** Best (feature, threshold) by Gini / variance gain; None when pure, too
    * small, or no positive gain. */
  private def bestSplit(stats: Array[BinStat], slots: Seq[Int],
                        thresholds: Array[Array[Double]], numClasses: Int,
                        nodeSize: Int): Option[(Int, Double)] = {
    if (stats.isEmpty) return None
    val slot0 = stats.head.slot
    val total = stats.filter(_.slot == slot0)
    val n = total.map(_.n).sum
    if (n < 2 * nodeSize) return None
    def impurity(rows: Seq[BinStat]): Double = {
      val m = rows.map(_.n).sum.toDouble
      if (m == 0) 0.0
      else if (numClasses > 0) {
        val byLabel = rows.groupBy(_.label).values.map(_.map(_.n).sum.toDouble)
        1.0 - byLabel.map(c => (c / m) * (c / m)).sum
      } else {
        val s = rows.map(_.sum).sum; val s2 = rows.map(_.sum2).sum
        s2 / m - (s / m) * (s / m)
      }
    }
    val parentImp = impurity(total.toSeq)
    if (parentImp <= 0) return None // pure node
    var best: Option[(Int, Double, Double)] = None // (slot, thr, gain)
    for (slot <- slots; if thresholds(slot).nonEmpty) {
      val rows = stats.filter(_.slot == slot)
      for (cut <- thresholds(slot).indices) {
        // bin b holds values in (thr(b-1), thr(b)] ... bin = #thresholds < v;
        // left of cut c = bins 0..c (values <= thresholds(c))
        val (l, r) = rows.partition(_.bin <= cut)
        val nl = l.map(_.n).sum; val nr = r.map(_.n).sum
        if (nl >= nodeSize && nr >= nodeSize) {
          val gain = parentImp -
            (nl * impurity(l.toSeq) + nr * impurity(r.toSeq)) / (nl + nr)
          if (gain > 1e-12 && best.forall(_._3 < gain))
            best = Some((slot, thresholds(slot)(cut), gain))
        }
      }
    }
    best.map { case (s, t, _) => (s, t) }
  }

  /** Majority class (ties toward the smallest index, like smile argmax) or
    * mean target. */
  private def leafValue(stats: Array[BinStat], numClasses: Int): Double = {
    if (stats.isEmpty) return 0.0
    val slot0 = stats.head.slot
    val rows = stats.filter(_.slot == slot0)
    if (numClasses > 0)
      rows.groupBy(_.label).view.mapValues(_.map(_.n).sum).toSeq
        .maxBy { case (label, n) => (n, -label) }._1.toDouble
    else {
      val n = rows.map(_.n).sum; val s = rows.map(_.sum).sum
      if (n == 0) 0.0 else s / n
    }
  }

  private def build(node: Int, splits: Map[Int, (Int, Double)],
                    leaves: Map[Int, Double]): Node =
    splits.get(node) match {
      case Some((f, thr)) =>
        Split(f, thr, build(2 * node, splits, leaves), build(2 * node + 1, splits, leaves))
      case None => Leaf(leaves.getOrElse(node, 0.0))
    }
}
