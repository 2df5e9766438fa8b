package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import RandomForest.{Forest, Leaf, Node, Split}

/**
 * From-scratch distributed CART / random-forest TRAINING — the counterpart
 * of the reference's `createRandomForestModel`
 * (TypologyClassification.groovy:555-650), which delegates to smile's
 * single-node `RandomForestClassification/Regression.fit`. Here training is
 * the PLANET / Spark-MLlib shape: ALL trees grow LEVEL-synchronous, and
 * each level of the whole forest is ONE distributed aggregation — every row
 * emits (tree, node, feature, bin) statistics for each bagged tree, a hash
 * aggregate reduces them, and the driver picks the best split per (tree,
 * node) from the bin histograms (Gini for classification, variance for
 * regression). Candidate thresholds for every feature come from two more
 * jobs (one count pass, one value/quantile pass) — maxDepth + 3 jobs total
 * regardless of numTrees or feature count. Driver state is
 * O(#trees × #nodes × #features × #bins), never O(rows).
 *
 * Deliberate divergences from smile, documented:
 *  - candidate thresholds are midpoints of the (capped) distinct value set,
 *    computed once per feature — above `maxBins` distinct values an
 *    equi-spaced quantile subset is used (smile scans every sorted value);
 *  - bagging is a deterministic hash subsample (include row t iff
 *    xxhash64(features, tree, seed) mod 1000 < rate·1000) instead of
 *    bootstrap-with-replacement — reproducible across runs and partitions;
 *  - mtry feature subsets are drawn per (tree, depth) from a keyed seeded
 *    RNG (level-batched growth cannot share one sequential RNG).
 *
 * Split semantics match the APPLY side exactly (left iff x <= threshold;
 * classification leaves are class indices, ties toward the smallest index),
 * so a trained Forest runs through the same Catalyst/SQL emitters.
 */
object RandomForestTrainer {

  /** Per-(tree,node,featureSlot,bin) label histogram / moment rows. */
  private final case class BinStat(tree: Int, node: Int, slot: Int, bin: Int,
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
      .localCheckpoint() // read maxDepth times (all trees per pass)
    // candidate thresholds: TWO jobs total, not 2 per feature — one pass
    // computes every feature's approx distinct count, a second computes all
    // value sets at once (sorted collect_set for low-cardinality features —
    // bounded by the count check — and approx quantiles for the rest). The
    // cap stays distributed: the driver never collects an unbounded set.
    val counts = df.select(features.map(f =>
      approx_count_distinct(col(f)).as(f)): _*).head()
    val lowCard = features.indices.map(i => counts.getLong(i) <= maxBins * 2)
    val qs = (0 until maxBins).map(i => i.toDouble / (maxBins - 1))
    val valueAggs = features.zipWithIndex.map { case (f, i) =>
      if (lowCard(i)) sort_array(collect_set(col(f))).as(f)
      else percentile_approx(col(f), typedLit(qs), lit(10000)).as(f)
    }
    val valueRow = df.select(valueAggs: _*).head()
    val thresholds: Array[Array[Double]] = features.indices.map { i =>
      val vs: Array[Double] =
        if (lowCard(i)) valueRow.getSeq[Double](i).toArray
        else valueRow.getSeq[Double](i).distinct.sorted.toArray
      vs.sliding(2).collect { case Array(a, b) => (a + b) / 2 }.toArray
    }.toArray
    growForest(df, features, thresholds, numTrees, maxDepth, numClasses,
      nodeSize, subsample, mtry, maxBins, seed)
  }

  /**
   * Level-synchronous growth of ALL trees at once: every level is ONE
   * distributed aggregation across the whole forest — a row emits its
   * (tree, node, slot, bin) statistics for every bagged tree it belongs to,
   * so numTrees × maxDepth per-tree jobs collapse into maxDepth (+1) jobs.
   * mtry feature subsets are drawn from a per-(tree, depth) seeded RNG
   * (the per-level batching makes a shared sequential RNG order-dependent,
   * so the draw is keyed instead — same style of deterministic divergence
   * from smile as the hash bagging, documented in the header).
   */
  private def growForest(df: DataFrame, features: Seq[String],
                         thresholds: Array[Array[Double]], numTrees: Int,
                         maxDepth: Int, numClasses: Int, nodeSize: Int,
                         subsample: Double, mtry: Int, maxBins: Int,
                         seed: Long): Forest = {
    val splits = Array.fill(numTrees)(
      scala.collection.mutable.Map.empty[Int, (Int, Double)])
    val leaves = Array.fill(numTrees)(
      scala.collection.mutable.Map.empty[Int, Double])
    val frontiers = Array.fill(numTrees)(Set(1)) // root 1, children 2n/2n+1
    def slotsFor(t: Int, depth: Int): Seq[Int] =
      if (mtry <= 0 || mtry >= features.size) features.indices
      else new scala.util.Random(seed ^ (t * 0x9E3779B97F4A7C15L) ^ (depth * 0xC2B2AE3D27D4EB4FL))
        .shuffle(features.indices.toList).take(mtry).sorted
    var depth = 0
    while (depth < maxDepth && frontiers.exists(_.nonEmpty)) {
      val active = (0 until numTrees).filter(frontiers(_).nonEmpty)
      val treeSlots = active.map(t => t -> slotsFor(t, depth)).toMap
      val unionSlots = treeSlots.values.flatten.toSeq.distinct.sorted
      val stats = levelStats(df, features, thresholds, active,
        active.map(t => t -> splits(t).toMap).toMap,
        active.map(t => t -> frontiers(t)).toMap,
        unionSlots, numClasses, subsample, seed)
      for (t <- active) {
        val nextFrontier = Set.newBuilder[Int]
        for (node <- frontiers(t)) {
          val nodeStats = stats.filter(s => s.tree == t && s.node == node)
          bestSplit(nodeStats, treeSlots(t), thresholds, numClasses, nodeSize) match {
            case Some((f, thr)) if depth < maxDepth - 1 =>
              splits(t)(node) = (f, thr)
              nextFrontier += 2 * node += 2 * node + 1
            case _ =>
              leaves(t)(node) = leafValue(nodeStats, numClasses)
          }
        }
        frontiers(t) = nextFrontier.result()
      }
      depth += 1
    }
    // depth cap reached with pending frontier nodes: close them as leaves
    if (frontiers.exists(_.nonEmpty)) {
      val active = (0 until numTrees).filter(frontiers(_).nonEmpty)
      val stats = levelStats(df, features, thresholds, active,
        active.map(t => t -> splits(t).toMap).toMap,
        active.map(t => t -> frontiers(t)).toMap,
        Seq(0), numClasses, subsample, seed) // one slot: only label marginals used
      for (t <- active; node <- frontiers(t))
        leaves(t)(node) = leafValue(stats.filter(s => s.tree == t && s.node == node), numClasses)
    }
    Forest(features, (0 until numTrees).map(t =>
      build(1, splits(t).toMap, leaves(t).toMap)))
  }

  /** One distributed pass over the whole forest: per (tree, frontier node,
    * feature slot, bin) label histograms (classification) or moments
    * (regression). Each row emits #baggedTrees × #slots structs; the
    * shuffle carries only the aggregated histograms. */
  private def levelStats(df: DataFrame, features: Seq[String],
                         thresholds: Array[Array[Double]],
                         active: Seq[Int],
                         splitMaps: Map[Int, Map[Int, (Int, Double)]],
                         frontiers: Map[Int, Set[Int]],
                         slots: Seq[Int],
                         numClasses: Int, subsample: Double,
                         seed: Long): Array[BinStat] = {
    // current node id of each row in each tree: descend the (tiny,
    // broadcast-closure) partial split maps — a per-row UDF walk per level
    // (a Column re-expansion of the tree would grow exponentially with
    // depth); -1 marks rows sitting in already-closed leaves
    val nodeUdf = udf { (fs: Seq[Double], t: Int) =>
      val splitMap = splitMaps(t)
      var n = 1
      var continue = true
      while (continue) splitMap.get(n) match {
        case Some((f, thr)) => n = if (fs(f) <= thr) 2 * n else 2 * n + 1
        case None => continue = false
      }
      if (frontiers(t)(n)) n else -1
    }
    // bagging: include row in tree t iff its feature hash mod 1000 < rate
    def bagCond(t: Int): Column =
      if (subsample >= 1.0) lit(true)
      else pmod(xxhash64(features.map(col) :+ lit(t) :+ lit(seed): _*),
        lit(1000L)) < (subsample * 1000).toLong
    val treeArr = array(active.map(t =>
      when(bagCond(t), lit(t)).otherwise(lit(null).cast("int"))): _*)
    // bin of a value = #thresholds < value (thresholds are few: a sum of
    // comparisons stays codegen-friendly); bins are tree-independent
    def binCol(slot: Int): Column = {
      val ths = thresholds(slot)
      if (ths.isEmpty) lit(0)
      else ths.map(t => when(col(features(slot)) > t, 1).otherwise(0)).reduce(_ + _)
    }
    val emits = array(slots.map(s =>
      struct(lit(s).as("slot"), binCol(s).cast("int").as("bin"))): _*)
    df.withColumn("__fs", array(features.map(col): _*))
      .select(col("*"), explode(treeArr).as("__t"))
      .where(col("__t").isNotNull)
      .withColumn("__node", nodeUdf(col("__fs"), col("__t")))
      .where(col("__node") > 0)
      .select(col("__t"), col("__node"), col("__y"), explode(emits).as("__e"))
      .groupBy(col("__t"), col("__node"), col("__e.slot").as("__slot"),
        col("__e.bin").as("__bin"),
        (if (numClasses > 0) col("__y") else lit(0)).as("__label"))
      .agg(count(lit(1)).as("n"), sum(col("__y").cast("double")).as("s"),
        sum(col("__y").cast("double") * col("__y").cast("double")).as("s2"))
      .collect().map(r => BinStat(r.getInt(0), r.getInt(1), r.getInt(2),
        r.getInt(3), r.getInt(4), r.getLong(5), r.getDouble(6), r.getDouble(7)))
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
