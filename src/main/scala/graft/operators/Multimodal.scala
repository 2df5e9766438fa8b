package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal column plumbing: image/audio/video payloads ride as opaque
 * `binary` columns with typed metadata; decode / feature-extract / resize /
 * frame-sample run as batched partition-local transforms (the Scala analogue
 * of `mapInPandas`: one `mapPartitions` per batch of rows, heavy codec state
 * initialized once per partition, never per row).
 *
 * The actual codecs are NOT in this container, so the decode kernel is a
 * clearly-marked deterministic STUB (`stubDecode`); the Spark-side contract —
 * schema, partitioning, batch shape, per-partition init — is real and tested.
 */
object Multimodal {

  /** Typed metadata row accompanying every media blob. */
  case class MediaMeta(mediaId: Long, kind: String, bytes: Long, width: Int, height: Int)
  case class MediaRow(mediaId: Long, kind: String, payload: Array[Byte])
  case class Features(mediaId: Long, kind: String, dim: Int, features: Array[Float])

  /**
   * STUB decode kernel — stands in for an image/audio codec. Deterministic:
   * features are a fixed-dim moment sketch of the payload bytes. A real
   * deployment swaps ONLY this function for a JNI/codec call; everything
   * around it (batching, partition-local init, schema) is unchanged.
   */
  def stubDecode(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var i = 0
    while (i < payload.length) {
      out(i % dim) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    out
  }

  /**
   * Batched feature extraction: mapPartitions with per-partition "model"
   * initialization (the expensive step a codec/NN would have), rows
   * processed in batches of `batchSize` to bound memory like an Arrow batch.
   */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 16,
                      batchSize: Int = 256): Dataset[Features] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init (stands in for loading a codec / model once)
      val decoder: (Array[Byte], Int) => Array[Float] = stubDecode
      rows.grouped(batchSize).flatMap { batch =>
        batch.map(r => Features(r.mediaId, r.kind, dim, decoder(r.payload, dim)))
      }
    }
  }

  /** Synthetic media table (deterministic payloads) for tests/bench. */
  def synthMedia(spark: SparkSession, n: Long): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0, n).map { i =>
      val kind = if (i % 3 == 0) "image" else if (i % 3 == 1) "audio" else "video"
      val payload = Array.tabulate[Byte](64 + (i % 64).toInt)(j => ((i * 31 + j * 7) % 256).toByte)
      MediaRow(i, kind, payload)
    }
  }
}
