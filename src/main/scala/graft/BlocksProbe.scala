package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.geom.{GeoFunctions => G}
import graft.index.CellGrid
import graft.operators.{ConnectedComponents, SpatialJoin}

/** Dev-only: stage bisection of blocks_cc at sf0.1. */
object BlocksProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val grid = CellGrid.fixture
    val docs = s.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val rects = docs.select(
      col("doc_id").as("id_build"),
      ((col("doc_id") * 13) % 60).cast("double").as("x0"),
      ((col("doc_id") * 29) % 60).cast("double").as("y0"))
      .withColumn("the_geom", G.stMakeBox(col("x0"), col("y0"), col("x0") + 2.0, col("y0") + 2.0))
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"BPROBE $name%-12s ${(System.nanoTime() - t0) / 1e9}%6.2fs rows=$n")
    }
    val building = rects.select("id_build", "the_geom")
    val b2 = building.select(col("id_build").as("id_b"), col("the_geom").as("geom_b"))
    val edges = SpatialJoin.intersectsJoin(building, "the_geom", b2, "geom_b", grid, 10)
      .where(col("id_build") < col("id_b"))
      .select(col("id_build").as("src"), col("id_b").as("dst"))
    time("edges")(edges.count())
    val comp = ConnectedComponents.run(building.select("id_build"), "id_build", edges, "src", "dst")
    time("cc")(comp.count())
    val withComp = building.join(comp.withColumnRenamed("id", "id_build"), "id_build")
    time("union_agg")(withComp.groupBy("component")
      .agg(G.st_union_agg(col("the_geom")).as("g"), collect_list(col("id_build")).as("ids")).count())
    s.stop()
  }
}
