package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: ad-hoc piece timings for round-7 optimization (noop-style
  * isolation of pipeline fragments at sf0.1). */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    def time(name: String)(body: => Long): Unit = {
      body // warm
      val t0 = System.nanoTime()
      val n = body
      println(f"PPROBE $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.3fs n=$n")
    }
    val docs = s.read.parquet(s"$sfDir/documents.parquet")
    import graft.operators._
    time("exact")(Dedup.exact(docs, "doc_id", "text").count())
    time("reps_join")(docs.join(
      Dedup.exact(docs, "doc_id", "text").select("doc_id"), Seq("doc_id")).count())
    time("lsh_pairs")(Dedup.minhashLsh(docs, "doc_id", "text", 3, 16, 3, 0.4).count())
    time("gate")(docs.select(col("doc_id"),
      TextAnalysis.langId(col("text")).as("lang_id"),
      TextAnalysis.qualityScore(col("text")).as("quality"),
      TextAnalysis.tokenCount(col("text")).as("n_tokens"))
      .where(col("lang_id") === "en" && col("quality") >= 0.6).count())
    time("curate")(Curation.curate(docs, "doc_id", "text", "en", 0.6).count())

    // ---- flagship fixed overhead: full pipeline at negligible row count --
    if (sys.env.contains("GRAFT_FLAGSHIP_OVERHEAD")) {
      val grid = graft.index.CellGrid.fixture
      val rsu = graft.fixtures.GeoFixture.rsuDf(s).select(col("id_rsu"), col("the_geom"))
      def tiny = graft.lake.Pages.geocode(graft.lake.Pages.synth(s, 1000, 16))
      def run(): Long = {
        operators.SpatialJoin.pointInPolygon(tiny, "x", "y", rsu, "the_geom", grid, 10)
          .groupBy(col("id_rsu"),
            operators.Tiling.tileCol(col("x"), 0.0, 10.0).as("id_col"),
            operators.Tiling.tileRow(col("y"), 0.0, 10.0).as("id_row"))
          .agg(count(lit(1)).as("cnt")).agg(sum("cnt")).head(); 1000L
      }
      run(); run() // warm
      (1 to 5).foreach { i =>
        val t0 = System.nanoTime()
        run()
        println(f"PPROBE fs_overhead_$i ${(System.nanoTime() - t0) / 1e9}%7.3fs")
      }
      // bisect: dictionary construction vs plain pipeline pieces
      def t(name: String)(body: => Unit): Unit = {
        body
        val t0 = System.nanoTime(); body
        println(f"PPROBE ov_$name ${(System.nanoTime() - t0) / 1e9}%7.3fs")
      }
      t("rsu_collect") { rsu.collect() }
      t("tiny_agg_only") { tiny.agg(sum(col("x"))).head() }
      t("join_construct") {
        operators.SpatialJoin.pointInPolygon(tiny, "x", "y", rsu, "the_geom", grid, 10) }
      t("join_head") {
        operators.SpatialJoin.pointInPolygon(tiny, "x", "y", rsu, "the_geom", grid, 10)
          .agg(count(lit(1))).head() }
    }
    // ---- flagship kernel stages (the bench's scaling metric) -------------
    if (sys.env.contains("GRAFT_FLAGSHIP_PROBE")) {
      val n = 40000000L
      val grid = graft.index.CellGrid.fixture
      val parts = 64
      def pages = graft.lake.Pages.geocode(graft.lake.Pages.synth(s, n, parts))
      val rsu = graft.fixtures.GeoFixture.rsuDf(s).select(col("id_rsu"), col("the_geom"))
      time("fs_synth_geocode") {
        pages.agg(sum(col("x") + col("y"))).head(); n }
      time("fs_cell") {
        pages.select(operators.SpatialJoin.cellColumn(grid, 10, col("x"), col("y")).as("c"))
          .agg(max("c")).head(); n }
      time("fs_join") {
        operators.SpatialJoin.pointInPolygon(pages, "x", "y", rsu, "the_geom", grid, 10)
          .agg(count(lit(1))).head(); n }
      time("fs_full")({
        operators.SpatialJoin.pointInPolygon(pages, "x", "y", rsu, "the_geom", grid, 10)
          .groupBy(col("id_rsu"),
            operators.Tiling.tileCol(col("x"), 0.0, 10.0).as("id_col"),
            operators.Tiling.tileRow(col("y"), 0.0, 10.0).as("id_row"))
          .agg(count(lit(1)).as("cnt")).agg(sum("cnt")).head(); n})
    }
    s.stop()
  }
}
