package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.fixtures.GeoFixture
import graft.index.CellGrid
import graft.lake.Pages
import graft.operators.SpatialJoin

/**
 * Dev probe: salted vs unsalted SHUFFLE point-in-polygon under the synthetic
 * hotspot (20% of pages land in a 2x2-unit window → a handful of hot cells).
 * The broadcast path is immune to skew; this measures the non-broadcast
 * (both-sides-shuffle) path the engine would take when the polygon side is
 * too large to broadcast.
 */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_SCALE_ROWS", "10000000").toLong
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "false") // isolate the salting effect
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val grid = CellGrid.fixture
    val pages = Pages.geocode(Pages.synth(s, n, 128)).select("i", "x", "y")
    val rsu = GeoFixture.rsuDf(s).select(col("id_rsu"), col("the_geom"))
    def run(salts: Int): Double = {
      val df = SpatialJoin.pointInPolygon(pages, "x", "y", rsu, "the_geom", grid, 10,
        broadcastPolys = false, salts = salts)
      df.agg(count(lit(1))).head() // warm
      val t0 = System.nanoTime()
      df.agg(count(lit(1))).head()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"SKEW unsalted=${run(1)}%.2fs salted8=${run(8)}%.2fs salted32=${run(32)}%.2fs")
    s.stop()
  }
}
