package graft.lake

import java.nio.file.Files
import graft.SparkTestBase

/** Lake-staged curation: 4 stage commits with lineage, resume semantics
  * (rerun touches nothing; invalidating a tail stage recomputes only the
  * tail while the expensive dedup head stays committed). */
class CurationPipelineSpec extends SparkTestBase {

  test("curation chain commits all stages with lineage and resumes") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-curation").toString
    val docs = (0 until 60).map { i =>
      val text =
        if (i % 10 == 1) s"the cat and the dog of house ${i - 1} is on it for that mat"
        else if (i % 10 == 2)
          s"the cat and the dog of house ${i - 2} is on it for that mat plus tail"
        else s"the cat and the dog of house $i is on it for that mat"
      (i.toLong, text)
    }.toDF("doc_id", "text")
    def run() = CurationPipeline.run(spark, root, docs,
        lang = "en", minQuality = 0.0,
        ratesPerMille = Map("en" -> 1000), defaultPerMille = 1000,
        capacity = 32)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .sortBy(_._1).toSeq

    val r1 = run()
    // exact dups (i%10==1 repeats i-1's text) collapse to the min id; near
    // dups (i%10==2) drop as the larger side of a verified pair
    assert(r1.nonEmpty && r1.size < 60)
    assert(!r1.exists(_._1 % 10 == 1) && !r1.exists(_._1 % 10 == 2))
    val stages = Seq("curated", "redacted", "sampled", "packed")
    for (st <- stages) {
      assert(Lake.isCommitted(root, st), st)
      assert(Lake.readLineage(spark, root, st).count() > 0, st)
    }
    // packing covers the shard contiguously in id order
    var cum = 0L
    for ((_, shard, n, start, _, _, off) <- r1) {
      assert(shard == "en" && start == cum && off == start % 32)
      cum += n
    }
    // resume: rerun recomputes nothing (manifests untouched, same rows)
    val m1 = stages.map(st =>
      Files.getLastModifiedTime(java.nio.file.Paths.get(root, st, "manifest.json")))
    assert(run() == r1)
    assert(stages.map(st => Files.getLastModifiedTime(
      java.nio.file.Paths.get(root, st, "manifest.json"))) == m1)
    // invalidate the tail: only the tail recomputes, the dedup head stays
    Lake.invalidate(root, "sampled")
    Lake.invalidate(root, "packed")
    assert(run() == r1)
    assert(Files.getLastModifiedTime(
      java.nio.file.Paths.get(root, "curated", "manifest.json")) == m1.head)
  }
}
