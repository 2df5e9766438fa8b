package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.fixtures.GeoFixture
import graft.index.CellGrid
import graft.lake.Pages
import graft.operators.{SpatialJoin, Tiling}

/** Dev-only bisection harness for the flagship's scaling bottleneck. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_SCALE_ROWS", "40000000").toLong
    val grid = CellGrid.fixture
    for (cores <- Seq(8, 32)) {
      val s = SparkSession.builder().master(s"local[$cores]")
        .config("spark.sql.shuffle.partitions", 32)
        .config("spark.ui.enabled", "false").getOrCreate()
      s.sparkContext.setLogLevel("ERROR")
      def pts = Pages.geocode(Pages.synth(s, n, 256)).select("i", "x", "y")
      def withCell = pts.withColumn("__cell", SpatialJoin.cellUdf(grid, 10)(col("x"), col("y")))
      val rsu = GeoFixture.rsuDf(s).select(col("id_rsu"), col("the_geom"))
      def joined = SpatialJoin.pointInPolygon(pts, "x", "y", rsu, "the_geom", grid, 10)
      def full = joined.groupBy(col("id_rsu"),
        Tiling.tileCol(col("x"), 0.0, 10.0).as("c"), Tiling.tileRow(col("y"), 0.0, 10.0).as("r"))
        .agg(count(lit(1)).as("cnt"))
      def time(name: String, df: => DataFrame): Unit = {
        df.agg(count(lit(1))).head() // warm
        val t0 = System.nanoTime()
        df.agg(count(lit(1))).head()
        println(f"PROBE cores=$cores $name%-12s ${n / ((System.nanoTime() - t0) / 1e9)}%.0f rows/s")
      }
      // catalyst cell + UDF contains refine
      def joinCC = {
        val polyCells = broadcast(rsu.withColumn("__cell",
          explode(SpatialJoin.coverUdf(grid, 10)(col("the_geom")))))
        pts.withColumn("__cell", SpatialJoin.cellColumn(grid, 10, col("x"), col("y")))
          .join(polyCells, "__cell")
          .where(graft.geom.GeoFunctions.stContainsPoint(col("the_geom"), col("x"), col("y")))
      }
      // catalyst cell + catalyst bbox refine (no JTS anywhere on big side)
      def joinNC = {
        val env = udf((wkb: Array[Byte]) => {
          val e = graft.geom.Geo.fromWkb(wkb).getEnvelopeInternal
          (e.getMinX, e.getMinY, e.getMaxX, e.getMaxY)
        })
        val polyCells = broadcast(rsu
          .withColumn("__e", env(col("the_geom")))
          .withColumn("__cell", explode(SpatialJoin.coverUdf(grid, 10)(col("the_geom")))))
        pts.withColumn("__cell", SpatialJoin.cellColumn(grid, 10, col("x"), col("y")))
          .join(polyCells, "__cell")
          .where(col("x") > col("__e._1") && col("x") < col("__e._3") &&
            col("y") > col("__e._2") && col("y") < col("__e._4"))
      }
      time("synth", pts)
      time("cell", withCell)
      time("join", joined)
      time("join_cc", joinCC)
      time("join_nc", joinNC)
      time("full", full)
      s.stop()
    }
  }
}
