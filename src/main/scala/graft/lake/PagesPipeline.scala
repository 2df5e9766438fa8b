package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.fixtures.GeoFixture
import graft.index.CellGrid
import graft.operators.{SpatialJoin, Tiling}

/**
 * The north-rule pipeline as CHECKPOINTED LAKE STAGES: every stage persists
 * to the Iceberg-style lake (atomic manifest + per-partition lineage +
 * metrics — Lake.stage), so a rerun resumes from the last committed stage
 * instead of recomputing (the reference has no retry/resume at all,
 * SURVEY §3.3). The byte-identity invariant is enforced IN the pipeline:
 * stage `extracted` fails the run if any page's extracted text differs from
 * its source text.
 */
object PagesPipeline {

  final case class Result(pages: Long, extracted: Long, assigned: Long, tiles: Long)

  def run(spark: SparkSession, root: String, n: Long,
          grid: CellGrid = CellGrid.fixture, res: Int = 10): Result = {
    val pages = Lake.stage(spark, root, "pages") {
      Pages.synth(spark, n)
    }
    val extracted = Lake.stage(spark, root, "extracted") {
      val e = pages.withColumn("etext", Pages.extractText(col("html")))
      val bad = e.where(col("etext").isNull || col("etext") =!= col("text")).count()
      require(bad == 0, s"byte-identity violated for $bad pages") // north-rule invariant
      e.drop("html") // text verified; downstream stages don't need the blob
    }
    val assigned = Lake.stage(spark, root, "assigned") {
      val geo = Pages.geocode(extracted)
      val rsu = GeoFixture.rsuDf(spark).select(col("id_rsu"), col("the_geom"))
      SpatialJoin.pointInPolygon(geo, "x", "y", rsu, "the_geom", grid, res)
        .select(col("url"), col("i"), col("x"), col("y"), col("id_rsu"))
    }
    val tiles = Lake.stage(spark, root, "tiles") {
      assigned.groupBy(col("id_rsu"),
          Tiling.tileCol(col("x"), 0.0, 10.0).as("id_col"),
          Tiling.tileRow(col("y"), 0.0, 10.0).as("id_row"))
        .agg(count(lit(1)).as("cnt"))
    }
    Result(pages.count(), extracted.count(), assigned.count(), tiles.count())
  }
}
