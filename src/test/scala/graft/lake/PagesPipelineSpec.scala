package graft.lake

import java.nio.file.Files
import graft.SparkTestBase

/** Staged pipeline: commits all 4 stages with lineage, resumes from
  * checkpoints (invalidating one stage recomputes only downstream). */
class PagesPipelineSpec extends SparkTestBase {

  test("runs, commits all stages with lineage, and resumes from checkpoint") {
    val root = Files.createTempDirectory("graft-pipeline").toString
    val r1 = PagesPipeline.run(spark, root, 2000)
    assert(r1.pages == 2000 && r1.extracted == 2000)
    assert(r1.assigned > 0 && r1.tiles > 0)
    for (st <- Seq("pages", "extracted", "assigned", "tiles")) {
      assert(Lake.isCommitted(root, st), st)
      val lin = Lake.readLineage(spark, root, st)
      assert(lin.count() > 0) // per-partition lineage rows exist
      assert(lin.columns.toSet == Set("file", "bytes", "rows", "stage"))
    }
    // resume: second run reads back committed stages (same results, and the
    // manifests are untouched — no recompute/recommit)
    val m1 = Seq("pages", "extracted", "assigned", "tiles")
      .map(st => Files.getLastModifiedTime(java.nio.file.Paths.get(root, st, "manifest.json")))
    val r2 = PagesPipeline.run(spark, root, 2000)
    assert(r2 == r1)
    val m2 = Seq("pages", "extracted", "assigned", "tiles")
      .map(st => Files.getLastModifiedTime(java.nio.file.Paths.get(root, st, "manifest.json")))
    assert(m1 == m2)
    // invalidate a middle stage: downstream recomputes, upstream untouched
    Lake.invalidate(root, "assigned")
    Lake.invalidate(root, "tiles")
    val r3 = PagesPipeline.run(spark, root, 2000)
    assert(r3 == r1)
    val m3 = Files.getLastModifiedTime(java.nio.file.Paths.get(root, "pages", "manifest.json"))
    assert(m3 == m1.head) // pages stage untouched
  }
}
