package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev-only: bisect a query's fixed overhead — construction (eager
  * checkpoints fire here) vs final action, with per-job wall times. */
object DispatchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val name = if (args.nonEmpty) args(0) else "grid_lcz_sprawl_dispatch"
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, String)]()
    s.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.put(js.jobId, (System.nanoTime(),
          Option(js.properties).map(_.getProperty("spark.job.description", "")).getOrElse("")))
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val (t0, d) = jobs.getOrDefault(je.jobId, (0L, ""))
        done.add((je.jobId, (System.nanoTime() - t0) / 1e9, d))
      }
    })
    val fn = SparkEntry.queries(name)
    fn(s, sfDir).count() // warm
    (1 to 2).foreach { rep =>
      done.clear()
      val t0 = System.nanoTime()
      val df = fn(s, sfDir)
      val t1 = System.nanoTime()
      val n = df.count()
      val t2 = System.nanoTime()
      Thread.sleep(300) // let listener drain
      println(f"PROBE rep=$rep construct=${(t1 - t0) / 1e9}%.2fs action=${(t2 - t1) / 1e9}%.2fs rows=$n jobs=${done.size}")
      import scala.jdk.CollectionConverters._
      done.asScala.toSeq.sortBy(_._1).foreach { case (id, sec, d) =>
        println(f"  job $id%3d ${sec}%6.3fs ${d.take(90)}")
      }
    }
    s.stop()
  }
}
