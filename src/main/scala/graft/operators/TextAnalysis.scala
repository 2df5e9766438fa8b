package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text analysis for the training-data pipeline: language-ID (stopword
 * n-gram heuristic), quality scoring, token counting, and rolling-hash
 * document fingerprinting. All pure Catalyst (codegen'd) — no UDFs, so a
 * 10^12-row scan stays in one whole-stage-codegen map.
 */
object TextAnalysis {

  /** Top stopwords per language for the n-gram heuristic. */
  val Stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "that", "it", "for"),
    "fr" -> Seq("le", "la", "les", "de", "des", "et", "un", "une", "que", "dans"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "den", "nicht", "ein"),
    "es" -> Seq("el", "la", "los", "de", "que", "y", "en", "un", "una", "por"),
    "it" -> Seq("il", "la", "di", "che", "e", "un", "una", "per", "con", "del"))

  private def tokens(textCol: Column): Column = split(textCol, " ", -1)

  def tokenCount(textCol: Column): Column = size(tokens(textCol)).cast("long")

  /** BPE-ish subword count approximation: whitespace tokens + extra splits
    * at letter/digit/punct boundaries, counted with one regex pass. */
  def subwordCount(textCol: Column): Column =
    size(split(textCol, "[ ]|(?<=[a-z])(?=[A-Z0-9])|(?<=[0-9])(?=[a-zA-Z])|(?=[^a-zA-Z0-9 ])", -1))
      .cast("long")

  /** Stopword hit count for one language (word-boundary regex, one pass). */
  def stopwordHits(textCol: Column, lang: String): Column = {
    val pat = Stopwords(lang).mkString("\\b(", "|", ")\\b")
    size(split(textCol, pat, -1)) - 1
  }

  /** Language ID: argmax of per-language stopword hit rate; "und" when no
    * stopwords at all. Deterministic tiebreak by language code. */
  def langId(textCol: Column): Column = {
    val scored = Stopwords.keys.toSeq.sorted.map { l =>
      struct(stopwordHits(textCol, l).as("hits"), lit(l).as("lang"))
    }
    // struct max: by hits, ties broken by language code (deterministic)
    val best = array_max(array(scored: _*))
    when(best.getField("hits") <= 0, "und").otherwise(best.getField("lang"))
  }

  /** Quality score in [0,1]: weighted blend of length, mean word length,
    * space ratio and alpha ratio — the shape of a web-text quality filter
    * (exact weights are engine policy, deterministic). */
  def qualityScore(textCol: Column): Column = {
    val len = length(textCol).cast("double")
    val nTok = tokenCount(textCol).cast("double")
    val meanWordLen = (len - (nTok - 1)) / nTok
    val alpha = length(regexp_replace(textCol, "[^a-zA-Z]", "")).cast("double") / len
    val lenScore = least(len / 1000.0, lit(1.0))
    val wordLenScore = lit(1.0) - least(abs(meanWordLen - 5.0) / 5.0, lit(1.0))
    round(lit(0.4) * lenScore + lit(0.3) * wordLenScore + lit(0.3) * alpha, 6)
  }

  /** Rolling polynomial fingerprint over word hashes:
    * fp = Σ h(w_i)·B^(n-1-i) mod P (Rabin-Karp shape, order-sensitive —
    * permuted documents get different fingerprints, unlike a bag hash).
    * `wordHash` defaults to xxhash64 (hot path); pass `Dedup.md5WordHash`
    * for a DuckDB-replicable variant (oracle parity). */
  def fingerprint(textCol: Column,
                  wordHash: Column => Column = xxhash64(_)): Column = {
    // 31-bit prime field keeps acc*B below 2^62 (no ANSI overflow):
    // fp = Σ h(w_i)·B^(n-1-i) mod P
    val P = 2147483647L // 2^31 - 1
    val B = 1000003L
    aggregate(tokens(textCol), lit(0L),
      (acc, w) => pmod(acc * B + pmod(wordHash(w), lit(P)), lit(P)))
  }

  /** One-pass text-stats projection for the documents table. */
  def analyze(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
      tokenCount(col(textCol)).as("n_tokens"),
      subwordCount(col(textCol)).as("n_subwords"),
      length(col(textCol)).cast("long").as("n_chars"),
      langId(col(textCol)).as("lang_id"),
      qualityScore(col(textCol)).as("quality"),
      fingerprint(col(textCol)).as("fingerprint"))
}
