package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Training-data curation — the composition a web-scale corpus pipeline runs
 * end-to-end over the documents table:
 *
 *   1. EXACT dedup: one representative (min id) per identical text;
 *   2. NEAR-dup removal among representatives: MinHash-LSH candidate pairs
 *      verified by exact shingle jaccard; the greedy survivor rule keeps
 *      the smaller id of every pair (drop every id that appears as the
 *      larger side — deterministic, one anti-join, no iterative clustering);
 *   3. language + quality gate: keep `lang` documents at quality >= cutoff.
 *
 * Every stage is one of the engine's bucketed operators (no all-pairs
 * anywhere); the output carries the quality/language/token columns a
 * downstream sampler needs.
 */
object Curation {

  def curate(docs: DataFrame, idCol: String, textCol: String,
             lang: String, minQuality: Double,
             k: Int = 3, bands: Int = 16, rowsPerBand: Int = 3,
             jaccardThreshold: Double = 0.4): DataFrame = {
    // 1. exact dedup -> representative ids
    val reps = docs.join(
      Dedup.exact(docs, idCol, textCol).select(idCol), Seq(idCol))
    // 2. near-dup pairs among representatives; drop the larger id of each
    val near = Dedup.minhashLsh(reps, idCol, textCol, k, bands, rowsPerBand,
      jaccardThreshold)
    val dropIds = near.select(col("id_b").as(idCol)).distinct()
    val kept = reps.join(dropIds, Seq(idCol), "left_anti")
    // 3. language + quality gate
    kept.select(col(idCol),
        TextAnalysis.langId(col(textCol)).as("lang_id"),
        TextAnalysis.qualityScore(col(textCol)).as("quality"),
        TextAnalysis.tokenCount(col(textCol)).as("n_tokens"))
      .where(col("lang_id") === lang && col("quality") >= minQuality)
  }
}
