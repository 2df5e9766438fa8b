package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption, StandardOpenOption}
import java.nio.charset.StandardCharsets

/**
 * Iceberg-style table layer over Parquet: versioned snapshots with an atomic
 * pointer file, per-partition lineage + metrics, resume-from-checkpoint and
 * TIME TRAVEL (north rule: "every stage persists per-partition lineage +
 * metrics ... so runs resume from checkpoint"). No Iceberg runtime jar ships
 * offline (BASELINE.md note), so the manifest is a small self-written JSON.
 *
 * Layout under `root/<stage>/`:
 *   data-v<N>/        parquet files of snapshot N (immutable once committed)
 *   lineage-v<N>/     parquet: one row per output file with row count +
 *                     bytes (per-partition lineage + metrics)
 *   manifest.json     CURRENT-snapshot pointer (written last, atomic rename
 *                     => a crash mid-write never leaves a readable-but-
 *                     uncommitted stage)
 *   snapshots.jsonl   append-only snapshot log (one JSON line per commit) —
 *                     old snapshots stay readable: `readSnapshot(root,
 *                     stage, version)` time-travels.
 *
 * The reference has no retry/resume (failure anywhere = exception, SURVEY
 * §3.3); this layer adds it: `stage(...)` recomputes only stages whose
 * manifest is missing, and `invalidate` + recompute creates snapshot N+1
 * while N remains queryable.
 */
object Lake {

  private def manifestPath(root: String, stage: String) = Paths.get(root, stage, "manifest.json")
  private def snapshotsPath(root: String, stage: String) = Paths.get(root, stage, "snapshots.jsonl")

  def isCommitted(root: String, stage: String): Boolean =
    Files.exists(manifestPath(root, stage))

  private def field(json: String, name: String): Option[String] =
    ("\"" + name + "\":\"?([^\",}]+)\"?").r.findFirstMatchIn(json).map(_.group(1))

  /** Current committed snapshot version of a stage (requires a manifest);
    * None for a LEGACY manifest written before the snapshot layout (no
    * version field) — its data lives under `data/`, not `data-v<N>/`. */
  def currentVersionOpt(root: String, stage: String): Option[Int] = {
    val m = new String(Files.readAllBytes(manifestPath(root, stage)), StandardCharsets.UTF_8)
    field(m, "version").map(_.toInt)
  }
  def currentVersion(root: String, stage: String): Int =
    currentVersionOpt(root, stage).getOrElse(1)

  def read(spark: SparkSession, root: String, stage: String): DataFrame =
    currentVersionOpt(root, stage) match {
      case Some(v) => readSnapshot(spark, root, stage, v)
      case None    => spark.read.parquet(s"$root/$stage/data") // legacy pre-snapshot layout stays readable + resumable
    }

  /** Time travel: read snapshot `version` of a stage (immutable history). */
  def readSnapshot(spark: SparkSession, root: String, stage: String, version: Int): DataFrame =
    spark.read.parquet(s"$root/$stage/data-v$version")

  def readLineage(spark: SparkSession, root: String, stage: String): DataFrame =
    currentVersionOpt(root, stage) match {
      case Some(v) => spark.read.parquet(s"$root/$stage/lineage-v$v")
      case None    => spark.read.parquet(s"$root/$stage/lineage") // legacy layout
    }

  /** All committed snapshots of a stage: (version, rows, committedAtMs). */
  def snapshots(root: String, stage: String): Seq[(Int, Long, Long)] = {
    val p = snapshotsPath(root, stage)
    if (!Files.exists(p)) return Seq.empty
    new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      .split("\n").filter(_.nonEmpty).toSeq
      .flatMap { line =>
        for {
          v <- field(line, "version"); r <- field(line, "rows")
          t <- field(line, "committedAtMs")
        } yield (v.toInt, r.toLong, t.toLong)
      }
  }

  private def commitStage(spark: SparkSession, root: String, name: String,
                          partitionCols: Seq[String])(compute: => DataFrame): DataFrame = {
    if (isCommitted(root, name)) return read(spark, root, name)
    val version = snapshots(root, name).map(_._1).maxOption.getOrElse(0) + 1
    val dataPath = s"$root/$name/data-v$version"
    val writer = compute.write.mode("overwrite")
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer)
      .parquet(dataPath)
    val back = spark.read.parquet(dataPath)
    // per-partition (per-file) lineage + metrics, harvested from the hidden
    // _metadata column (file-granular; at real cluster scale this comes from
    // the commit protocol's task stats instead of a re-scan). ONE distributed
    // pass collects the per-file rows (bounded: one row per output file);
    // the lineage parquet is then written from the collected local relation
    // and the manifest stats are summed in-driver — the pre-r7 form re-scanned
    // the full stage data to write lineage AND re-read the lineage for stats
    // (2 extra jobs + a second full-data pass per stage).
    val lineageRows = back
      .groupBy(col("_metadata.file_path").as("file"), col("_metadata.file_size").as("bytes"))
      .agg(count(lit(1)).as("rows"))
      .collect()
    spark.createDataFrame(lineageRows.toSeq.map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2))))
      .toDF("file", "bytes", "rows").withColumn("stage", lit(name))
      .coalesce(1).write.mode("overwrite").parquet(s"$root/$name/lineage-v$version")
    val m = s"""{"stage":"$name","version":$version,"rows":${lineageRows.map(_.getLong(2)).sum},""" +
      s""""files":${lineageRows.length},"bytes":${lineageRows.map(_.getLong(1)).sum},""" +
      s""""committedAtMs":${System.currentTimeMillis()}}"""
    // snapshot log first (append), then the pointer (atomic rename = commit)
    Files.write(snapshotsPath(root, name), (m + "\n").getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    val tmp = Paths.get(root, name, ".manifest.json.tmp")
    Files.createDirectories(tmp.getParent)
    Files.write(tmp, m.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, manifestPath(root, name), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    back
  }

  /**
   * Compute-or-resume a stage: if a committed manifest exists, read it back
   * (resume); otherwise run `compute`, persist data + per-file lineage as a
   * NEW snapshot, then commit the manifest atomically.
   */
  def stage(spark: SparkSession, root: String, name: String)(compute: => DataFrame): DataFrame =
    commitStage(spark, root, name, Seq.empty)(compute)

  /**
   * Compute-or-resume a PARTITIONED stage: like `stage`, but the data lands
   * hive-partitioned by `partitionCols` (the SURVEY §4 layout: coarse
   * cell-prefix + time bucket), so downstream filters on those columns prune
   * at the file listing level — the Iceberg-style partition pruning the
   * north rule's 10^12-row table needs.
   */
  def stagePartitioned(spark: SparkSession, root: String, name: String,
                       partitionCols: Seq[String])(compute: => DataFrame): DataFrame =
    commitStage(spark, root, name, partitionCols)(compute)

  /** Drop a stage's commit marker so the next run recomputes it (as a new
    * snapshot; prior snapshots stay readable via readSnapshot). */
  def invalidate(root: String, stage: String): Unit = {
    val p = manifestPath(root, stage)
    if (Files.exists(p)) Files.delete(p)
  }
}
