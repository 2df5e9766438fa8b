package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** The sub-quadratic LSH near-dup path must agree with the exact chunked
  * block join in the regime it exists for (high thresholds): on clustered
  * vectors at threshold 0.9 the 16x4 banding has per-pair recall
  * 1 - (1 - 0.653^1)^16 ~ 1 - 5e-8, and the verify stage computes the SAME
  * cosine kernel — so the outputs are identical, values included. */
class SimilarityLshSpec extends SparkTestBase {
  import spark.implicits._

  test("cosinePairsLsh == exact cosinePairs at threshold 0.9") {
    val rnd = new scala.util.Random(3)
    val dim = 32
    // 40 clusters x 3 members: unit base + small noise -> in-cluster cosine
    // > 0.95; cross-cluster cosine ~ N(0, 1/sqrt(dim)) stays far below 0.9
    val rows = (0 until 40).flatMap { c =>
      val base = Array.fill(dim)(rnd.nextGaussian())
      val n0 = math.sqrt(base.map(x => x * x).sum)
      (0 until 3).map { m =>
        val v = base.zipWithIndex.map { case (x, i) =>
          (x / n0 + rnd.nextGaussian() * 0.02).toFloat
        }
        ((c * 3 + m).toLong, v)
      }
    }
    val df = rows.toDF("vec_id", "embedding")
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    val exact = Similarity.cosinePairs(df, "vec_id", "embedding", 0.9)
      .collect().map(key).toSet
    val lsh = Similarity.cosinePairsLsh(df, "vec_id", "embedding", 0.9,
      bands = 16, bitsPerBand = 4).collect().map(key).toSet
    assert(exact.nonEmpty && exact.size >= 40) // clusters actually pair up
    assert(lsh == exact) // full recall AND bit-identical cosines
  }

  test("chunked cosinePairs is chunk-size invariant") {
    val rnd = new scala.util.Random(5)
    val rows = (0L until 60L).map(i => (i, Array.fill(8)(rnd.nextGaussian().toFloat)))
    val df = rows.toDF("vec_id", "embedding")
    def run(cs: Int) = Similarity.cosinePairs(df, "vec_id", "embedding", 0.3, chunkSize = cs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    assert(run(7) == run(4096) && run(7).nonEmpty)
  }
}
