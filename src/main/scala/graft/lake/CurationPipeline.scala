package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Curation, Pii}

/**
 * Lake-staged curation pipeline — the webtext counterpart of
 * [[PagesPipeline]]: the full curation chain (exact + near dedup →
 * language/quality gate → PII redaction → hash-quota sampling → sequence
 * packing) with every stage committed to the lake (manifest +
 * per-partition lineage + metrics via [[Lake.stage]]), so a rerun resumes
 * from the last committed stage and invalidating one stage recomputes only
 * downstream. That is the operational contract a 100-TB curation run
 * needs: each stage is days of compute, and a failed or re-parameterized
 * tail must not re-earn the head.
 *
 * Output per surviving document: its packing coordinates (shard, token
 * offsets, bin span), the quality score that admitted it, and its PII
 * placeholder count.
 */
object CurationPipeline {

  def run(spark: SparkSession, root: String, docs: DataFrame,
          lang: String = "en", minQuality: Double = 0.6,
          ratesPerMille: Map[String, Int] = Map("en" -> 900),
          defaultPerMille: Int = 100, capacity: Long = 512): DataFrame = {
    val kept = Lake.stage(spark, root, "curated") {
      Curation.curate(docs, "doc_id", "text", lang, minQuality)
    }
    val redacted = Lake.stage(spark, root, "redacted") {
      Pii.redactDocs(docs.join(kept.select("doc_id"), Seq("doc_id")),
        "doc_id", "text")
    }
    val sampled = Lake.stage(spark, root, "sampled") {
      Curation.sampleByHash(
        redacted.join(kept, Seq("doc_id")), col("doc_id"), col("lang_id"),
        ratesPerMille, defaultPerMille)
    }
    Lake.stage(spark, root, "packed") {
      Curation.packSequences(sampled, "doc_id", col("n_tokens"),
          col("lang_id"), capacity)
        .join(sampled.select(col("doc_id"), col("quality"),
          (col("n_emails") + col("n_ips") + col("n_phones")).as("n_pii")),
          Seq("doc_id"))
    }
  }
}
