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
    s.stop()
  }
}
