package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: time a subset of queries (args) at sf0.1. */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      fn(s, sfDir).count() // warm
      val t0 = System.nanoTime()
      val cnt = fn(s, sfDir).count()
      println(f"QPROBE $n%-24s ${(System.nanoTime() - t0) / 1e9}%8.2fs rows=$cnt")
    }
    s.stop()
  }
}
