package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Vocabulary building + token-id encoding — the step between curation and
 * sequence packing: build a frequency-ranked vocab over the corpus, then
 * encode every document as token ids with an UNK slot for out-of-vocab
 * words (the word-level analogue of tokenizer training; subword mers are
 * a vocab-policy detail this engine leaves to the caller's segmentation,
 * like UrlOps' canonical form).
 *
 * Scale shape: building is ONE hash aggregate over the exploded words
 * (map-side partial counts collapse repeats before the shuffle — the key
 * space is the vocabulary, not the corpus) followed by a top-`size`
 * `orderBy.limit` (distributed TakeOrdered — per-partition top-k + a tiny
 * merge, NO global sort); numbering the size-bounded result through one
 * window is free (the keyed-id-minting rule's model-table exception).
 * Encoding never shuffles: the vocab is a MODEL (size-bounded), collected
 * once and broadcast, and each document encodes in a single map-side pass
 * (the >20-branch lookup rule: a hashed-map matcher UDF, not a Catalyst
 * CaseWhen/literal-map — the vocab is data-derived, so `typedLit` can't
 * hold it anyway).
 */
object Vocab {

  /** Frequency-ranked vocabulary: top `size` words by (freq DESC, word ASC)
    * with dense ids 0..size-1. OOV encodes as id `size` (the UNK slot). */
  def build(docs: DataFrame, textCol: String, size: Int): DataFrame = {
    require(size >= 1, "vocab size must be >= 1")
    val counts = docs
      .select(explode(split(col(textCol), " ", -1)).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
    val top = counts.orderBy(desc("freq"), col("word")).limit(size)
    val w = Window.orderBy(desc("freq"), col("word")) // `size` rows — a model
    top.withColumn("token_id", (row_number().over(w) - 1).cast("long"))
      .select(col("token_id"), col("word"), col("freq"))
  }

  /**
   * Encode documents against a built vocab: per doc the space-joined token
   * ids (`encoded`), `n_tokens` and `n_unk`. OOV id = vocab size. One
   * map-side pass over a broadcast word→id hash map; nothing shuffles.
   */
  def encode(docs: DataFrame, idCol: String, textCol: String,
             vocab: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val entries = vocab.select(col("word"), col("token_id").cast("long"))
      .as[(String, Long)].collect() // model-bounded by construction
    val unk = entries.length.toLong
    val bc = spark.sparkContext.broadcast(entries.toMap)
    val enc = udf { (text: String) =>
      // null text -> null encoding (ADVICE r6: the Catalyst paths in this
      // family propagate nulls instead of failing the job)
      if (text == null) null
      else {
        val m = bc.value
        val words = text.split(" ", -1)
        val sb = new StringBuilder
        var nUnk = 0L
        var i = 0
        while (i < words.length) {
          val id = m.getOrElse(words(i), unk)
          if (id == unk) nUnk += 1
          if (i > 0) sb.append(' ')
          sb.append(id)
          i += 1
        }
        (sb.toString, words.length.toLong, nUnk)
      }
    }
    docs.select(col(idCol), enc(col(textCol)).as("__e"))
      .select(col(idCol), col("__e._1").as("encoded"),
        col("__e._2").as("n_tokens"), col("__e._3").as("n_unk"))
  }
}
