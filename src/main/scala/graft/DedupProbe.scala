package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Dev-only: stage bisection of the ngram/minhash dedup pipelines. */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val docs = s.read.parquet(s"$sfDir/documents.parquet")

    def time(name: String)(f: => Long): Unit = {
      f // warm
      val t0 = System.nanoTime()
      val n = f
      println(f"DPROBE $name%-20s ${(System.nanoTime() - t0) / 1e9}%7.2fs rows=$n")
    }

    val sets = docs.select(col("doc_id").as("id"),
      array_distinct(Dedup.shingles(col("text"), 3)).as("sh"))
      .where(size(col("sh")) > 0)
      .withColumn("sz", size(col("sh")))
    time("sets")(sets.count())
    val inv = sets.select(col("id"), col("sz"), explode(col("sh")).as("g"))
    time("inv")(inv.count())
    val rhs = inv.select(col("g"), col("id").as("id_b"), col("sz").as("sz_b"))
    time("join")(inv.join(rhs, Seq("g")).where(col("id") < col("id_b")).count())
    time("full")(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.12).count())

    val sigs = docs.select(col("doc_id").as("id"), Dedup.shingles(col("text"), 3).as("sh"))
      .where(size(col("sh")) > 0)
      .withColumn("sig", Dedup.minhashSignature(col("sh"), 32))
    time("minhash_sigs")(sigs.count())
    time("simhash")(docs.select(Dedup.simhash64(col("text")).as("h")).count())

    // ---- hot-shingle skew demonstration: a ubiquitous suffix gives a few
    // trigrams df = N, so the UNCAPPED posting self-join goes quadratic in
    // N; the document-frequency cap bounds the candidate set while the
    // verify stage (exact jaccard on re-attached sets) keeps results exact
    // for every pair that still shares a sub-cap shingle.
    val hot = docs.withColumn("text",
      concat(col("text"), lit(" zzqa zzqb zzqc zzqd")))
    def candCount(maxDf: Option[Int]): Long = {
      val hsets = hot.select(col("doc_id").as("id"),
          array_distinct(Dedup.shingles(col("text"), 3)).as("sh"))
        .where(size(col("sh")) > 0)
      val hinv0 = hsets.select(col("id"), explode(col("sh")).as("g"))
      val hinv = maxDf match {
        case Some(cap) =>
          val df = hinv0.groupBy("g").agg(count(lit(1)).as("df"))
          hinv0.join(df.where(col("df") <= cap).select("g"), Seq("g"))
        case None => hinv0
      }
      hinv.join(hinv.select(col("g"), col("id").as("id_b")), Seq("g"))
        .where(col("id") < col("id_b"))
        .select("id", "id_b").dropDuplicates("id", "id_b").count()
    }
    time("hot_cand_nocap")(candCount(None))
    time("hot_cand_df100")(candCount(Some(100)))
    time("hot_full_df100")(
      Dedup.ngramJaccardPairs(hot, "doc_id", "text", 3, 0.12, maxDf = Some(100)).count())

    // ---- band-bucket skew demonstration (round 4): inject a boilerplate
    // clique — identical docs land in the SAME band bucket for every band,
    // so the uncapped within-bucket self-join is quadratic in clique size;
    // the maxBucket census drops those buckets while the planted normal
    // pairs (tiny buckets) are untouched. Candidates here = verified pairs
    // (verify is exact either way); the candidate-stage blowup is what the
    // timing shows.
    val boiler = s.range(0, 5000).select(
      (col("id") + 10000000L).as("doc_id"),
      lit((1 to 40).map(i => s"boiler$i").mkString(" ")).as("text"))
    val mixed = docs.select("doc_id", "text").unionAll(boiler)
    time("lsh_boiler_nocap")(
      Dedup.minhashLsh(mixed, "doc_id", "text", 3, 16, 3, 0.5).count())
    time("lsh_boiler_cap1k")(
      Dedup.minhashLsh(mixed, "doc_id", "text", 3, 16, 3, 0.5,
        maxBucket = Some(1000)).count())
    time("simhash_boiler_cap1k")(
      Dedup.simhashPairs(mixed, "doc_id", "text", 3,
        maxBucket = Some(1000)).count())
    s.stop()
  }
}
