package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.nio.charset.StandardCharsets

/**
 * Iceberg-style table layer over Parquet: snapshot manifest with an atomic
 * pointer file, per-partition lineage + metrics, and resume-from-checkpoint
 * (north rule: "every stage persists per-partition lineage + metrics ... so
 * runs resume from checkpoint"). No Iceberg runtime jar ships offline
 * (BASELINE.md note), so the manifest is a small self-written JSON.
 *
 * Layout under `root/`:
 *   <stage>/data/            parquet files of the committed snapshot
 *   <stage>/manifest.json    committed-snapshot pointer (written last,
 *                            atomic rename => a crash mid-write never leaves
 *                            a readable-but-uncommitted stage)
 *   <stage>/lineage/         parquet: one row per output file with row count
 *                            + bytes (per-partition lineage + metrics)
 *
 * The reference has no retry/resume (failure anywhere = exception, SURVEY
 * §3.3); this layer adds it: `stage(...)` recomputes only stages whose
 * manifest is missing.
 */
object Lake {

  final case class Manifest(stage: String, rows: Long, files: Long, bytes: Long,
                            schemaJson: String, committedAtMs: Long)

  private def manifestPath(root: String, stage: String) = Paths.get(root, stage, "manifest.json")

  def isCommitted(root: String, stage: String): Boolean =
    Files.exists(manifestPath(root, stage))

  def read(spark: SparkSession, root: String, stage: String): DataFrame =
    spark.read.parquet(s"$root/$stage/data")

  def readLineage(spark: SparkSession, root: String, stage: String): DataFrame =
    spark.read.parquet(s"$root/$stage/lineage")

  /**
   * Compute-or-resume a stage: if a committed manifest exists, read it back
   * (resume); otherwise run `compute`, persist data + per-file lineage, then
   * commit the manifest atomically.
   */
  def stage(spark: SparkSession, root: String, name: String)(compute: => DataFrame): DataFrame = {
    if (isCommitted(root, name)) return read(spark, root, name)
    val dataPath = s"$root/$name/data"
    compute.write.mode("overwrite").parquet(dataPath)
    val back = spark.read.parquet(dataPath)
    // per-partition (per-file) lineage + metrics, harvested from the hidden
    // _metadata column (file-granular; at real cluster scale this comes from
    // the commit protocol's task stats instead of a re-scan)
    val lineage = back
      .select(col("_metadata.file_path").as("file"), col("_metadata.file_size").as("bytes"))
      .groupBy("file", "bytes").agg(count(lit(1)).as("rows"))
      .withColumn("stage", lit(name))
    lineage.coalesce(1).write.mode("overwrite").parquet(s"$root/$name/lineage")
    val stats = spark.read.parquet(s"$root/$name/lineage")
      .agg(sum("rows").as("rows"), count(lit(1)).as("files"), sum("bytes").as("bytes"))
      .head()
    val m = s"""{"stage":"$name","rows":${stats.getLong(0)},"files":${stats.getLong(1)},""" +
      s""""bytes":${stats.getLong(2)},"committedAtMs":${System.currentTimeMillis()}}"""
    val tmp = Paths.get(root, name, ".manifest.json.tmp")
    Files.createDirectories(tmp.getParent)
    Files.write(tmp, m.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, manifestPath(root, name), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    back
  }

  /**
   * Compute-or-resume a PARTITIONED stage: like `stage`, but the data lands
   * hive-partitioned by `partitionCols` (the SURVEY §4 layout: coarse
   * cell-prefix + time bucket), so downstream filters on those columns prune
   * at the file listing level — the Iceberg-style partition pruning the
   * north rule's 10^12-row table needs.
   */
  def stagePartitioned(spark: SparkSession, root: String, name: String,
                       partitionCols: Seq[String])(compute: => DataFrame): DataFrame = {
    if (isCommitted(root, name)) return read(spark, root, name)
    val dataPath = s"$root/$name/data"
    compute.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(dataPath)
    val back = spark.read.parquet(dataPath)
    val lineage = back
      .select(col("_metadata.file_path").as("file"), col("_metadata.file_size").as("bytes"))
      .groupBy("file", "bytes").agg(count(lit(1)).as("rows"))
      .withColumn("stage", lit(name))
    lineage.coalesce(1).write.mode("overwrite").parquet(s"$root/$name/lineage")
    val stats = spark.read.parquet(s"$root/$name/lineage")
      .agg(sum("rows").as("rows"), count(lit(1)).as("files"), sum("bytes").as("bytes"))
      .head()
    val m = s"""{"stage":"$name","rows":${stats.getLong(0)},"files":${stats.getLong(1)},""" +
      s""""bytes":${stats.getLong(2)},"committedAtMs":${System.currentTimeMillis()}}"""
    val tmp = Paths.get(root, name, ".manifest.json.tmp")
    Files.createDirectories(tmp.getParent)
    Files.write(tmp, m.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, manifestPath(root, name), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    back
  }

  /** Drop a stage's commit marker so the next run recomputes it. */
  def invalidate(root: String, stage: String): Unit = {
    val p = manifestPath(root, stage)
    if (Files.exists(p)) Files.delete(p)
  }
}
