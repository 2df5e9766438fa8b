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

  /**
   * Benchmark decontamination — the eval-set overlap filter every serious
   * training corpus runs (the GPT-3 appendix-C / PaLM / Llama "13-gram
   * overlap" rule): a training document is CONTAMINATED when it shares any
   * word n-gram with the benchmark corpus. Returns the training rows with
   * a `contaminated` boolean (the caller drops or quarantines).
   *
   * Scale: benchmark corpora are tiny (eval sets, ~MBs) next to the
   * training corpus, so the benchmark's distinct gram set BROADCASTS; the
   * training side explodes per-doc distinct (id, gram) rows that are
   * filtered map-side by a broadcast LEFT SEMI join — the text never rides
   * a shuffle and the grams die in the map stage; only the surviving
   * contaminated-id set (≤ one row per training doc) aggregates, then a
   * broadcast-able left join re-attaches the flag. Grams are built with
   * shifted slices + zip_with (TextAnalysis.wordGrams — no interpreted-HOF
   * O(n²) re-evaluation).
   */
  def decontaminate(train: DataFrame, benchmark: DataFrame,
                    idCol: String, textCol: String, n: Int = 13): DataFrame = {
    require(n >= 1, "n-gram order must be >= 1")
    def grams(df: DataFrame, cols: Column*) = df.select(cols :+
      explode(array_distinct(TextAnalysis.wordGrams(
        split(col(textCol), " ", -1), n))).as("__gram"): _*)
    val benchGrams = grams(benchmark).select("__gram").distinct()
    val hits = grams(train, col(idCol))
      .join(broadcast(benchGrams), Seq("__gram"), "left_semi")
      .select(idCol).distinct()
      .withColumn("contaminated", lit(true))
    train.join(hits, Seq(idCol), "left")
      .withColumn("contaminated", coalesce(col("contaminated"), lit(false)))
  }

  /**
   * Line-level boilerplate removal — the RefinedWeb/CCNet stage that strips
   * lines repeated across the corpus (cookie banners, nav bars, copyright
   * footers) while preserving every document's remaining line ORDER. A line
   * is boilerplate iff it occurs in >= `minDf` distinct documents; the
   * output keeps the survivors re-joined with `joiner` plus the per-doc
   * removal counts a quality dashboard wants.
   *
   * Scale shape: the exploded rows carry (id, pos, xxhash64(line),
   * length(line)) — fixed width, the line BYTES never ride a shuffle (the
   * Dedup.exact digest argument: a cross-doc collision needs xxhash64 AND
   * length to agree, negligible below corpus scale and only ever merges df
   * counts upward). Document frequency is a distinct+count on that digest
   * pair; the boilerplate digest set joins back LEFT SEMI on (hash, len) —
   * ids+positions only — and reassembly is one positional array `filter`
   * over the doc's own lines (no element_at into a lambda-built array).
   * Nothing here funnels: every stage is an equi-shuffle on fixed-width
   * keys, and a viral boilerplate line's df row is ONE row however many
   * billions of pages carry it.
   *
   * @param linesCol array<string> column of the document's lines, in order
   *                 (callers segment — by '\n' for real pages, positionally
   *                 for unsegmented text)
   */
  def removeBoilerplateLines(docs: DataFrame, idCol: String, linesCol: String,
                             minDf: Long, joiner: String = "\n"): DataFrame = {
    require(minDf >= 2, "minDf < 2 would remove every line of every document")
    val ex = docs
      .select(col(idCol), posexplode(col(linesCol)).as(Seq("__pos", "__line")))
      .select(col(idCol), col("__pos"),
        xxhash64(col("__line")).as("__h"), length(col("__line")).as("__len"))
    val boiler = ex.select(col(idCol), col("__h"), col("__len")).distinct()
      .groupBy("__h", "__len").agg(count(lit(1)).as("__df"))
      .where(col("__df") >= minDf).select("__h", "__len")
    val removed = ex.join(boiler, Seq("__h", "__len"), "left_semi")
      .groupBy(idCol).agg(collect_list(col("__pos")).as("__rm"))
    docs.join(removed, Seq(idCol), "left")
      .withColumn("__rm", coalesce(col("__rm"), array().cast("array<int>")))
      .select(col(idCol),
        size(col(linesCol)).cast("long").as("n_lines"),
        size(col("__rm")).cast("long").as("n_removed"),
        array_join(filter(col(linesCol),
          (_, i) => !array_contains(col("__rm"), i)), joiner).as("clean_text"))
  }

  /**
   * Deterministic per-stratum hash sampling — the corpus-rebalancing step
   * (CCNet-style language quotas): a row survives iff its stable hash
   * bucket falls under its stratum's per-mille rate. The hash is the
   * md5-prefix uniform (Dedup.md5WordHash — 60 bits, DuckDB-replicable),
   * so the SAME rows survive on every engine and every rerun — sampling is
   * a pure filter, reproducible across pipeline versions.
   *
   * Scale: one codegen'd scan — no shuffle, no sort, no per-stratum
   * count pass (the rate map is a tiny `typedLit` literal; exact-count
   * quotas would need a global rank per stratum — this is the form that
   * survives 10^12 rows). Unknown strata fall back to `defaultPerMille`.
   *
   * @param keyCol stable row key the bucket is derived from (e.g. the id
   *               or canonical url — NOT the text, so near-identical docs
   *               sample independently)
   */
  def sampleByHash(docs: DataFrame, keyCol: Column, strataCol: Column,
                   ratesPerMille: Map[String, Int],
                   defaultPerMille: Int): DataFrame = {
    require((ratesPerMille.values ++ Seq(defaultPerMille)).forall(r => r >= 0 && r <= 1000),
      "per-mille rates must be in [0, 1000]")
    val bucket = pmod(Dedup.md5WordHash(keyCol.cast("string")), lit(1000L))
    val rate = coalesce(
      try_element_at(typedLit(ratesPerMille), strataCol.cast("string")),
      lit(defaultPerMille))
    docs.withColumn("sample_bucket", bucket).where(col("sample_bucket") < rate)
  }
}
