package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkTestBase

/** Streaming ≡ batch: the same windowedTileCounts plan over a MemoryStream
  * must produce exactly the batch result once all data is processed. */
class StreamOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def mkRows(n: Int) = Seq.tabulate(n) { i =>
    (java.sql.Timestamp.valueOf(f"2024-01-01 10:${i % 60}%02d:00"),
      (i % 37).toDouble, (i % 23).toDouble)
  }

  test("windowedTileCounts: streaming result equals batch result") {
    implicit val sqlCtx = spark.sqlContext
    val rows = mkRows(500)

    val batch = StreamOps.windowedTileCounts(
      rows.toDF("ts", "x", "y"), "ts", "x", "y", 0, 0, 10, "10 minutes", "1 minute")
      .orderBy("win_start", "id_col", "id_row")
      .collect().toSeq

    val stream = MemoryStream[(java.sql.Timestamp, Double, Double)]
    val sdf = StreamOps.windowedTileCounts(
      stream.toDF().toDF("ts", "x", "y"), "ts", "x", "y", 0, 0, 10, "10 minutes", "1 minute")
    val dir = Files.createTempDirectory("graft-stream").toString
    val q = sdf.writeStream.format("memory").queryName("tile_counts")
      .outputMode("complete").option("checkpointLocation", dir).start()
    stream.addData(rows.take(200))
    q.processAllAvailable()
    stream.addData(rows.drop(200)) // late + new batches
    q.processAllAvailable()
    val got = spark.table("tile_counts")
      .orderBy("win_start", "id_col", "id_row").collect().toSeq
    q.stop()

    assert(got == batch)
  }

  test("sessionizeWithState: state carries sessions across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Long)]
    val sdf = StreamOps.sessionizeWithState(stream.toDS(), gapSec = 1800)
    val dir = Files.createTempDirectory("graft-sess").toString
    val q = sdf.toDF("user_id", "n_sessions", "n_events")
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("update").option("checkpointLocation", dir).start()
    // batch 1: user 1 has two sessions (gap 3600 > 1800); user 2 one
    stream.addData(Seq((1L, 1000L), (1L, 2000L), (1L, 6000L), (2L, 500L)))
    q.processAllAvailable()
    // batch 2: user 1 continues the SAME session (6100 - 6000 <= 1800) then
    // opens a new one; without cross-batch state this would over-count
    stream.addData(Seq((1L, 6100L), (1L, 9000L)))
    q.processAllAvailable()
    val last = spark.table("sess_out").groupBy("user_id")
      .agg(max("n_sessions").as("s"), max("n_events").as("e"))
      .orderBy("user_id").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    q.stop()
    assert(last.toSeq == Seq((1L, 3L, 5L), (2L, 1L, 1L)))
  }

  test("sessionizeWithState on batch equals the lag-window formulation") {
    val rnd = new scala.util.Random(11)
    val events = Seq.tabulate(400)(i =>
      ((i % 7).toLong, 10000L + rnd.nextInt(50000).toLong)).distinct
    val viaState = StreamOps.sessionizeWithState(events.toDS(), gapSec = 1800)
      .groupByKey(_._1).reduceGroups((a, b) => if (a._3 >= b._3) a else b)
      .map(_._2).collect().map(t => (t._1, t._2)).sorted.toSeq
    // stateless reference: lag over a global per-user sort
    val w = org.apache.spark.sql.expressions.Window.partitionBy("u").orderBy("ts")
    val viaLag = events.toDF("u", "ts")
      .withColumn("prev", lag(col("ts"), 1).over(w))
      .withColumn("ns", when(col("prev").isNull || col("ts") - col("prev") > 1800, 1).otherwise(0))
      .groupBy("u").agg(sum("ns").as("n_sessions"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(viaState == viaLag)
  }

  test("streamingDedup: duplicate urls within horizon are dropped") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(java.sql.Timestamp, String)]
    val sdf = StreamOps.streamingDedup(
      stream.toDF().toDF("ts", "url"), "url", "ts", "10 minutes")
    val dir = Files.createTempDirectory("graft-dedup").toString
    val q = sdf.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").option("checkpointLocation", dir).start()
    val t = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    stream.addData(Seq((t, "a"), (t, "b"), (t, "a"), (t, "c"), (t, "b")))
    q.processAllAvailable()
    val got = spark.table("dedup_out").select("url").as[String].collect().sorted.toSeq
    q.stop()
    assert(got == Seq("a", "b", "c"))
  }
}
