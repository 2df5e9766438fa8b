package graft.lake

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.index.CellGrid
import graft.operators.SpatialJoin

/** Iceberg-style partition layout (SURVEY §4): pages partitioned by coarse
  * cell prefix + time bucket; filters on those columns PRUNE at the file
  * level (PartitionFilters in the scan, fewer files read). */
class PartitionPruneSpec extends SparkTestBase {

  test("cell-prefix + day partitioning prunes the scan") {
    val root = Files.createTempDirectory("graft-prune").toString
    val grid = CellGrid.fixture
    val df = Lake.stagePartitioned(spark, root, "pages", Seq("cell_p", "day")) {
      Pages.geocode(Pages.synth(spark, 20000, parts = 8))
        .withColumn("cell_p", SpatialJoin.cellColumn(grid, 4, col("x"), col("y")))
        .withColumn("day", to_date(col("warc_ts")))
    }
    val someCell = df.select("cell_p").head().getLong(0)
    val pruned = df.where(col("cell_p") === someCell)
    pruned.collect()
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(cell_p"), plan.take(1500))
    // pruning is real: the filtered scan reads strictly fewer files
    val allFiles = df.select(col("_metadata.file_path")).distinct().count()
    val prunedFiles = pruned.select(col("_metadata.file_path")).distinct().count()
    assert(prunedFiles < allFiles && prunedFiles > 0, s"$prunedFiles vs $allFiles")
    // partition columns survive the round-trip and stage resumes
    assert(Lake.isCommitted(root, "pages"))
    assert(Lake.read(spark, root, "pages").columns.contains("cell_p"))
  }
}
