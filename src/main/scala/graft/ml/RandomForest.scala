package graft.ml

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * From-scratch random-forest APPLY — the engine's replacement for the
 * reference's smile-model evaluation (`applyRandomForestModel`,
 * TypologyClassification.groovy:654-805), which powers both headline
 * classifiers: UTRF typology (classification) and building-height
 * estimation (regression, WorkflowGeoIndicators.groovy:1254-1298).
 *
 * The reference streams rows through smile's `Validation.test` and batch-
 * inserts predictions back over JDBC; here the broadcast "model" is compiled
 * ONCE into a pure-Catalyst expression tree — each CART tree becomes a
 * nested CASE/WHEN chain (whole-stage codegen, no UDF, no per-row JVM
 * dispatch), so applying a K-tree forest to 10^12 rows is one map stage.
 *
 * Split semantics follow CART ordinal splits as in smile
 * (smile.base.cart.OrdinalNode: go LEFT iff x[feature] <= threshold).
 * Classification aggregates trees by majority vote, ties broken toward the
 * SMALLEST class index (smile's argmax returns the first maximum).
 * Regression averages tree outputs in tree order (fixed IEEE order).
 *
 * `toSql` emits the IDENTICAL expression tree as ANSI SQL with exact
 * round-trip double literals, so a DuckDB oracle evaluates the same IEEE
 * comparisons — the same generated-oracle pattern as Queries3's LCZ synth.
 */
object RandomForest {

  sealed trait Node
  final case class Split(feature: Int, threshold: Double, left: Node, right: Node) extends Node
  final case class Leaf(value: Double) extends Node

  /** A forest over named features; for classification, leaf values are
    * indices into `classes`. */
  final case class Forest(features: Seq[String], trees: Seq[Node])

  /** Exact round-trip double literal (same contract as Queries3.L). */
  private def L(x: Double): String = {
    val s = x.toString
    if (s.contains('.') || s.contains('E')) s else s + ".0"
  }

  // ---- persistence ---------------------------------------------------------
  // The reference ships trained typology/height models as serialized smile
  // objects downloaded at runtime (TypologyClassification.groovy modelCheck/
  // applyRandomForestModel). The counterpart here is a plain-text format a
  // Forest round-trips through EXACTLY: Double.toString's shortest
  // representation parses back to the same bits, so a saved model applies
  // bit-identically. Line format:
  //   graft-forest v1 / one `feature <name>` line each / per tree: `tree`
  //   then a preorder walk of `S <featureIdx> <threshold>` / `L <value>`.

  def save(forest: Forest, path: String): Unit = {
    val sb = new StringBuilder("graft-forest v1\n")
    forest.features.foreach(f => sb.append("feature ").append(f).append('\n'))
    def walk(n: Node): Unit = n match {
      case Split(f, thr, l, r) =>
        sb.append("S ").append(f).append(' ').append(thr).append('\n')
        walk(l); walk(r)
      case Leaf(v) => sb.append("L ").append(v).append('\n')
    }
    forest.trees.foreach { t => sb.append("tree\n"); walk(t) }
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  def load(path: String): Forest = {
    val lines = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(path),
      java.nio.charset.StandardCharsets.UTF_8).iterator()
    require(lines.hasNext && lines.next() == "graft-forest v1", "bad model header")
    val features = Seq.newBuilder[String]
    val trees = Seq.newBuilder[Node]
    // no lookahead needed: the preorder walk is self-delimiting (a Split
    // consumes exactly its two subtrees), so plain sequential iteration works
    def readNode(): Node = {
      val parts = lines.next().split(' ')
      parts(0) match {
        case "S" => Split(parts(1).toInt, parts(2).toDouble, readNode(), readNode())
        case "L" => Leaf(parts(1).toDouble)
        case other => throw new IllegalArgumentException(s"bad model line: $other")
      }
    }
    while (lines.hasNext) {
      val l = lines.next()
      if (l.startsWith("feature ")) features += l.stripPrefix("feature ")
      else if (l == "tree") trees += readNode()
      else if (l.nonEmpty) throw new IllegalArgumentException(s"bad model line: $l")
    }
    Forest(features.result(), trees.result())
  }

  // ---- Catalyst compilation ------------------------------------------------

  private def treeColumn(n: Node, feats: Map[String, Column], features: Seq[String]): Column =
    n match {
      case Leaf(v) => lit(v)
      case Split(f, thr, l, r) =>
        when(feats(features(f)) <= lit(thr), treeColumn(l, feats, features))
          .otherwise(treeColumn(r, feats, features))
    }

  /** Regression: mean of tree outputs, summed in tree order. */
  def regressColumn(forest: Forest, feats: Map[String, Column]): Column = {
    val preds = forest.trees.map(t => treeColumn(t, feats, forest.features))
    preds.reduce(_ + _) / lit(forest.trees.size.toDouble)
  }

  /** Classification, stage 1: one vote-count Column per class (leaf values
    * are class indices). Materialize these as columns ONCE — the argmax then
    * references the vote columns, not the tree expressions, keeping the
    * compiled plan linear in (#trees + #classes²) instead of quadratic. */
  def classifyVoteColumns(forest: Forest, feats: Map[String, Column], numClasses: Int): Seq[Column] = {
    val preds = forest.trees.map(t => treeColumn(t, feats, forest.features).cast("int"))
    (0 until numClasses).map { c =>
      preds.map(p => when(p === c, 1).otherwise(0)).reduce(_ + _)
    }
  }

  /** Classification, stage 2: the winning label from vote-count columns;
    * ties -> smallest class index (smile argmax returns the first maximum). */
  def argmaxColumn(voteCols: Seq[Column], classes: Seq[String]): Column =
    classes.indices.init.foldRight(lit(classes.last): Column) { (c, rest) =>
      val geAll = classes.indices.filter(_ != c)
        .map(o => voteCols(c) >= voteCols(o)).reduce(_ && _)
      when(geAll, classes(c)).otherwise(rest)
    }

  // ---- SQL emission (oracle parity) ---------------------------------------

  /** Double literal with an explicit cast: bare SQL literals parse as
    * DECIMAL (both DuckDB and Spark SQL), which would silently switch the
    * arithmetic to decimal scale rules — the cast pins every comparison and
    * sum to the same IEEE double ops Catalyst executes. */
  private def D(x: Double): String = s"CAST(${L(x)} AS DOUBLE)"

  private def treeSql(n: Node, featSql: Map[String, String], features: Seq[String]): String =
    n match {
      case Leaf(v) => D(v)
      case Split(f, thr, l, r) =>
        s"(CASE WHEN ${featSql(features(f))} <= ${D(thr)} THEN " +
          s"${treeSql(l, featSql, features)} ELSE ${treeSql(r, featSql, features)} END)"
    }

  def regressSql(forest: Forest, featSql: Map[String, String]): String =
    "(" + forest.trees.map(t => treeSql(t, featSql, forest.features)).mkString(" + ") +
      s") / ${D(forest.trees.size.toDouble)}"

  /** Per-class vote-count SQL expressions (to alias as columns in a CTE). */
  def classifyVoteSqls(forest: Forest, featSql: Map[String, String], numClasses: Int): Seq[String] = {
    val treeExprs = forest.trees.map(t => s"CAST(${treeSql(t, featSql, forest.features)} AS INT)")
    (0 until numClasses).map { c =>
      treeExprs.map(e => s"(CASE WHEN $e = $c THEN 1 ELSE 0 END)").mkString("(", " + ", ")")
    }
  }

  /** Winning-label SQL over aliased vote columns — same ties-to-smallest
    * rule as `argmaxColumn`. */
  def argmaxSql(voteCols: Seq[String], classes: Seq[String]): String = {
    val arms = classes.indices.init.map { c =>
      val geAll = classes.indices.filter(_ != c)
        .map(o => s"${voteCols(c)} >= ${voteCols(o)}").mkString(" AND ")
      s"WHEN $geAll THEN '${classes(c)}'"
    }
    s"CASE ${arms.mkString(" ")} ELSE '${classes.last}' END"
  }

  // ---- deterministic synthetic model --------------------------------------

  /**
   * Deterministic synthetic forest for tests/benchmarks: thresholds drawn
   * seeded within each feature's (min,max) range and rounded to 4 decimals
   * (exact literals), random early leaves for shape variety. Stands in for
   * the reference's downloaded smile models (offline here); the APPLY path
   * is the operator under test, the weights are data.
   */
  def synthetic(features: Seq[(String, Double, Double)], numTrees: Int, depth: Int,
                leafValue: scala.util.Random => Double, seed: Long = 42L): Forest = {
    val rnd = new scala.util.Random(seed)
    def gen(d: Int): Node =
      if (d == 0 || rnd.nextDouble() < 0.15) Leaf(leafValue(rnd))
      else {
        val f = rnd.nextInt(features.size)
        val (_, lo, hi) = features(f)
        val thr = math.rint((lo + rnd.nextDouble() * (hi - lo)) * 10000) / 10000
        Split(f, thr, gen(d - 1), gen(d - 1))
      }
    Forest(features.map(_._1), Seq.fill(numTrees)(gen(depth)))
  }
}
