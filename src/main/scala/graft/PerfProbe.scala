package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: ad-hoc piece timings for round-7 optimization (noop-style
  * isolation of pipeline fragments at sf0.1). */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    def time(name: String)(body: => Long): Unit = {
      body // warm
      val t0 = System.nanoTime()
      val n = body
      println(f"PPROBE $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.3fs n=$n")
    }
    val docs = s.read.parquet(s"$sfDir/documents.parquet")
    import graft.operators._
    time("exact")(Dedup.exact(docs, "doc_id", "text").count())
    time("reps_join")(docs.join(
      Dedup.exact(docs, "doc_id", "text").select("doc_id"), Seq("doc_id")).count())
    time("lsh_pairs")(Dedup.minhashLsh(docs, "doc_id", "text", 3, 16, 3, 0.4).count())
    time("gate")(docs.select(col("doc_id"),
      TextAnalysis.langId(col("text")).as("lang_id"),
      TextAnalysis.qualityScore(col("text")).as("quality"),
      TextAnalysis.tokenCount(col("text")).as("n_tokens"))
      .where(col("lang_id") === "en" && col("quality") >= 0.6).count())
    time("curate")(Curation.curate(docs, "doc_id", "text", "en", 0.6).count())
    s.stop()
  }
}
