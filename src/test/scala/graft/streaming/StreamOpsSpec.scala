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
