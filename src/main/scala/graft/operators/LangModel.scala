package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * N-gram language-model perplexity scoring — the CCNet-style quality filter
 * (Wenzek et al. 2020): train a smoothed bigram LM on a reference slice of
 * the corpus, score every document by its perplexity under that model, and
 * let the pipeline threshold (CCNet buckets head/middle/tail by perplexity).
 * Real deployments train KenLM on Wikipedia; what the engine owns is the
 * distributed plumbing — counting, smoothing, the model join, the per-doc
 * aggregate — with the model itself trained in-engine (no external files).
 *
 *   P(w2|w1) = (C(w1 w2) + k) / (C(w1) + k·V)     (add-k smoothing,
 *              V = train vocabulary size; unseen w1 degrades to 1/V)
 *   avg_logp = Σ ln P over the doc's bigrams / #bigrams
 *   perplexity = exp(−avg_logp)
 *
 * Scale shape: counts are two hash aggregates over the TRAIN slice keyed by
 * the (xxhash64, length) digest of the gram (the Dedup.exact collision
 * argument — gram strings never ride a shuffle); scoring left-joins the doc
 * bigrams to the two count tables on the digest — equi-joins on fixed-width
 * keys, and a single COALESCE-to-zero formula covers seen/unseen-bigram/
 * unseen-unigram uniformly. V rides a one-row broadcast crossJoin. Bigrams
 * are shifted slices + zip_with (no interpreted element_at re-evaluation).
 *
 * Determinism: counts are exact integers; ln/exp are the libm boundary —
 * callers round emitted doubles (6 decimals, the oracle-exactness rule).
 */
object LangModel {

  /** Trained bigram model: digest-keyed count tables + the 1-row vocab. */
  final case class BigramLm(bigrams: DataFrame, unigrams: DataFrame, vocab: DataFrame)

  private def words(textCol: Column): Column = split(textCol, " ", -1)

  private def digest(c: Column): Seq[Column] =
    Seq(xxhash64(c).as("__h"), length(c).as("__len"))

  /** Count tables over the train slice (docs with ≥2 words contribute). */
  def trainBigram(train: DataFrame, textCol: String): BigramLm = {
    val w = train.select(words(col(textCol)).as("__w"))
    val bi = w.select(explode(TextAnalysis.wordGrams(col("__w"), 2)).as("__g"))
      .select(digest(col("__g")): _*)
      .groupBy("__h", "__len").agg(count(lit(1)).as("__c2"))
    val uni = w.select(explode(col("__w")).as("__u"))
      .select(digest(col("__u")): _*)
      .groupBy("__h", "__len").agg(count(lit(1)).as("__c1"))
    val v = uni.agg(count(lit(1)).as("__v"))
    BigramLm(bi, uni, v)
  }

  /**
   * Per-document perplexity under the model: (idCol, n_bigrams, avg_logp,
   * perplexity) — unrounded doubles (callers round at the libm boundary).
   * Documents with fewer than 2 words are dropped (no bigram to score).
   */
  def perplexity(docs: DataFrame, idCol: String, textCol: String,
                 lm: BigramLm, k: Double = 0.5): DataFrame = {
    require(k > 0, "additive smoothing constant must be positive")
    // both digests (the gram's and its LEFT word's) are derived MAP-SIDE in
    // the scan projection, so the gram strings die before any shuffle
    val w1 = substring_index(col("__g"), " ", 1)
    val grams = docs
      .select(col(idCol), explode(TextAnalysis.wordGrams(words(col(textCol)), 2)).as("__g"))
      .select(col(idCol),
        xxhash64(col("__g")).as("__h"), length(col("__g")).as("__len"),
        xxhash64(w1).as("__h1"), length(w1).as("__len1"))
    val joined = grams
      .join(lm.bigrams, Seq("__h", "__len"), "left")
      .select(col(idCol), coalesce(col("__c2"), lit(0L)).as("__c2"),
        col("__h1").as("__h"), col("__len1").as("__len"))
      .join(lm.unigrams, Seq("__h", "__len"), "left")
      .select(col(idCol), col("__c2"), coalesce(col("__c1"), lit(0L)).as("__c1"))
      .crossJoin(broadcast(lm.vocab))
    val p = (col("__c2").cast("double") + lit(k)) /
      (col("__c1").cast("double") + lit(k) * col("__v").cast("double"))
    joined.select(col(idCol), log(p).as("__lp"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        (sum(col("__lp")) / count(lit(1)).cast("double")).as("avg_logp"))
      .withColumn("perplexity", exp(-col("avg_logp")))
  }
}
