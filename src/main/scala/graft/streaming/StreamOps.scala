package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Structured Streaming surface. The reference is strictly batch (SURVEY.md
 * §2.9 — one zone at a time, no streaming semantics), so this module is the
 * forward-looking ingestion path a 10^12-page pipeline needs: new WARC/page
 * batches land as files, are geocoded + tile-assigned incrementally with
 * event-time watermarks, and per-tile aggregates update continuously.
 *
 * Every transform here is the SAME Column logic the batch operators use —
 * one definition of geocode/tile math serves both `spark.read` and
 * `spark.readStream` (the Dataset API's batch/stream unification), so batch
 * backfill and streaming ingestion can never diverge.
 */
object StreamOps {

  /** Windowed per-tile counts over an event-time column with a watermark:
    * the streaming analogue of Tiling.rasterizePoints. Works on a streaming
    * OR batch DataFrame (same plan). */
  def windowedTileCounts(pages: DataFrame, tsCol: String, xCol: String, yCol: String,
                         x0: Double, y0: Double, d: Double,
                         window: String, watermark: String): DataFrame = {
    val base = if (pages.isStreaming) pages.withWatermark(tsCol, watermark) else pages
    base
      .withColumn("id_col", (floor((col(xCol) - x0) / d)).cast("long") + 1)
      .withColumn("id_row", (floor((col(yCol) - y0) / d)).cast("long") + 1)
      .groupBy(org.apache.spark.sql.functions.window(col(tsCol), window)
        .getField("start").as("win_start"), col("id_col"), col("id_row"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Streaming exact-dedup: keep the first occurrence of each key within the
    * watermark horizon (dropDuplicates with event-time column — the
    * streaming analogue of Dedup.exact). */
  def streamingDedup(pages: DataFrame, keyCol: String, tsCol: String,
                     watermark: String): DataFrame =
    pages.withWatermark(tsCol, watermark).dropDuplicates(Seq(keyCol, tsCol))

  /**
   * Custom-state sessionization via `flatMapGroupsWithState`: per user, a
   * new session starts when the gap to the previous event exceeds `gapSec`.
   * State (session count, event count, last timestamp) survives across
   * micro-batches, so a session spanning two batches is NOT double-counted —
   * the thing the stateless lag-window formulation cannot do incrementally.
   * Each update emits the user's running (n_sessions, n_events).
   *
   * Events inside one batch are sorted per group before folding; late rows
   * arriving after a newer batch already advanced the state are counted in
   * arrival order (standard at-watermark semantics — bound lateness with a
   * watermark upstream). Works on batch Datasets too (single "batch" =
   * global sort per group), which the equivalence spec exploits.
   */
  def sessionizeWithState(events: org.apache.spark.sql.Dataset[(Long, Long)],
                          gapSec: Long): org.apache.spark.sql.Dataset[(Long, Long, Long)] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Long), (Long, Long, Long)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[(Long, Long)], state: GroupState[(Long, Long, Long)]) =>
          val ts = it.map(_._2).toArray
          java.util.Arrays.sort(ts)
          var (nSessions, nEvents, lastTs) =
            state.getOption.getOrElse((0L, 0L, Long.MinValue))
          ts.foreach { t =>
            if (lastTs == Long.MinValue || t - lastTs > gapSec) nSessions += 1
            nEvents += 1
            lastTs = t
          }
          state.update((nSessions, nEvents, lastTs))
          Iterator((user, nSessions, nEvents))
      }
  }
}
