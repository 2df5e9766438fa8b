package graft.indicators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** GridIndicators semantics vs hand-computed goldens on a tiny grid
  * (reference: GridIndicators.groovy:126-280 LOD mode tiebreak,
  * :238-254 neighbors, :450-496 sliding window). */
class GridIndicatorsSpec extends SparkTestBase {
  import spark.implicits._

  private def cells = Seq(
    // (id_row, id_col, lcz) — a 3x3 LOD-1 cell rows 1-3 cols 1-3 plus one far cell
    (1L, 1L, 1), (1L, 2L, 2), (1L, 3L, 2),
    (2L, 1L, 6), (2L, 2L, 6), (2L, 3L, 1),
    (3L, 1L, 1), (3L, 2L, 8), (3L, 3L, 104),
    (7L, 7L, 107)).toDF("id_row", "id_col", "lcz")

  test("lodMode: count-desc then weight-asc tiebreak") {
    val out = GridIndicators.lodMode(cells, "lcz",
      Map(1 -> 5, 2 -> 4, 6 -> 3, 8 -> 2, 104 -> 1, 107 -> 0), level = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getInt(2), r.getLong(3))).toMap
    // cell (0,0): counts lcz1=3, lcz2=2, lcz6=2, lcz8=1, lcz104=1 -> mode 1
    assert(out((0L, 0L)) == (1, 3L))
    // far cell (2,2): single 107
    assert(out((2L, 2L)) == (107, 1L))
    // tiebreak: two values with equal count -> lower weight wins
    val tie = Seq((1L, 1L, 1), (1L, 2L, 107)).toDF("id_row", "id_col", "lcz")
    val m = GridIndicators.lodMode(tie, "lcz", Map(1 -> 5, 107 -> 0), 1).collect()
    assert(m.head.getInt(2) == 107) // weight 0 beats weight 5 at equal count
  }

  test("lodMode: unmapped class falls back to its own value (no ANSI throw)") {
    // the reference's ELSE LCZ_PRIMARY (GridIndicators.groovy:206): a class
    // outside the weight map must pass through as its own weight, not crash
    // the lookup — under Spark 4 ANSI mode a plain element_at map miss THROWS
    val g = Seq((1L, 1L, 999), (1L, 2L, 999), (1L, 3L, 1)).toDF("id_row", "id_col", "lcz")
    val out = GridIndicators.lodMode(g, "lcz", GridIndicators.ReferenceLczWeights, 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(out((0L, 0L)) == 999) // count 2 beats count 1; no exception raised
  }

  test("neighborStats: 8-neighborhood counts and sums") {
    val out = GridIndicators.neighborStats(cells, "lcz")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out((2L, 2L)) == (8L, 1 + 2 + 2 + 6 + 1 + 1 + 8 + 104)) // full ring
    assert(out((1L, 1L)) == (3L, 2 + 6 + 6))                        // corner
    assert(out((7L, 7L)) == (0L, 0L))                               // isolated
  }

  test("slidingWindowCount: Chebyshev window incl. self") {
    val out = GridIndicators.slidingWindowCount(cells, col("lcz").isin(1, 2, 8), size = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // window around (2,2): warm cells among the 9 = lcz 1,2,2,1,1,8 -> 6
    assert(out((2L, 2L)) == 6L)
    assert(out((7L, 7L)) == 0L)
  }
}
