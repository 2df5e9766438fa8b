package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.index.CellGrid

/** The pure-Catalyst cell id must be bit-identical to CellGrid.cell —
  * it IS the join key of every spatial join's large side. */
class CellColumnSpec extends SparkTestBase {
  import spark.implicits._

  test("cellColumn == CellGrid.cell on random + boundary + out-of-world points") {
    val grid = CellGrid.fixture
    val rnd = new scala.util.Random(7)
    val pts = Seq.tabulate(5000) { _ =>
      (rnd.nextDouble() * 40000 - 20000, rnd.nextDouble() * 40000 - 20000)
    } ++ Seq((-16384.0, -16384.0), (16383.999, 16383.999), (0.0, 0.0),
      (-20000.0, 0.0), (20000.0, 20000.0), (32.0, -32.0))
    for (res <- Seq(0, 5, 10, 20)) {
      val df = pts.toDF("x", "y")
        .withColumn("c_sql", SpatialJoin.cellColumn(grid, res, col("x"), col("y")))
        .withColumn("c_udf", SpatialJoin.cellUdf(grid, res)(col("x"), col("y")))
      assert(df.where(col("c_sql") =!= col("c_udf")).count() == 0, s"res=$res")
    }
  }
}
