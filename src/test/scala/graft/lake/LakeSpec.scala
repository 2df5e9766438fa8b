package graft.lake

import java.nio.file.Files
import graft.SparkTestBase
import org.apache.spark.sql.functions._

class LakeSpec extends SparkTestBase {

  test("stage computes, commits manifest + lineage, and resumes without recompute") {
    import spark.implicits._
    val root = Files.createTempDirectory("lake").toString
    var computeCount = 0
    def compute = { computeCount += 1; spark.range(100).toDF("v") }
    val first = Lake.stage(spark, root, "s1")(compute)
    assert(first.count() == 100 && computeCount == 1)
    assert(Lake.isCommitted(root, "s1"))
    // resume: no recompute
    val again = Lake.stage(spark, root, "s1")(compute)
    assert(again.count() == 100 && computeCount == 1)
    // lineage has per-file rows summing to the table count
    val lin = Lake.readLineage(spark, root, "s1")
    assert(lin.agg(sum("rows")).head().getLong(0) == 100)
    assert(lin.columns.toSet == Set("file", "bytes", "rows", "stage"))
    // invalidate forces recompute
    Lake.invalidate(root, "s1")
    Lake.stage(spark, root, "s1")(compute)
    assert(computeCount == 2)
  }

  test("legacy pre-snapshot stage (data/, versionless manifest) stays readable + resumable") {
    import spark.implicits._
    val root = Files.createTempDirectory("lake-legacy").toString
    // hand-build the old layout: data/ + lineage/ parquet, manifest WITHOUT a version field
    spark.range(42).toDF("v").write.parquet(s"$root/old/data")
    spark.range(1).select(lit("f").as("file"), lit(10L).as("bytes"),
      lit(42L).as("rows"), lit("old").as("stage")).write.parquet(s"$root/old/lineage")
    Files.write(java.nio.file.Paths.get(root, "old", "manifest.json"),
      """{"stage":"old","rows":42,"files":1,"bytes":10}""".getBytes)
    assert(Lake.read(spark, root, "old").count() == 42)
    assert(Lake.readLineage(spark, root, "old").count() == 1)
    // stage() resumes (reads back) instead of throwing on data-v1
    var computed = false
    val df = Lake.stage(spark, root, "old") { computed = true; spark.range(1).toDF("v") }
    assert(df.count() == 42 && !computed)
  }

  test("snapshots: recompute creates a new version; old snapshots time-travel") {
    import spark.implicits._
    val root = Files.createTempDirectory("lake-tt").toString
    var n = 100
    def compute = spark.range(n).toDF("v")
    Lake.stage(spark, root, "s")(compute)
    assert(Lake.currentVersion(root, "s") == 1)
    n = 250
    Lake.invalidate(root, "s")
    val v2 = Lake.stage(spark, root, "s")(compute)
    assert(Lake.currentVersion(root, "s") == 2 && v2.count() == 250)
    // time travel: snapshot 1 still readable with its original contents
    assert(Lake.readSnapshot(spark, root, "s", 1).count() == 100)
    assert(Lake.read(spark, root, "s").count() == 250)
    val snaps = Lake.snapshots(root, "s")
    assert(snaps.map(s => (s._1, s._2)) == Seq((1, 100L), (2, 250L)))
    // lineage follows the current snapshot
    assert(Lake.readLineage(spark, root, "s").agg(sum("rows")).head().getLong(0) == 250)
  }
}
