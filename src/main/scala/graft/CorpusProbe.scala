package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Curation, Dedup, Pii, TextAnalysis}
// LangModel / Bm25 / Vocab referenced fully-qualified in their stages

/**
 * Corpus-scale probe for the LLM-curation operator family. The driver
 * queries prove every operator CORRECT on the 500-row fixture corpus; this
 * probe is the measurement that the same public operators hold up at data
 * scale: a GENERATED web-style corpus (default 200k docs of 40–120 words,
 * ~1.6 × 10^7 words; exact-duplicate and near-duplicate pairs every 50 ids,
 * a viral 10-word slogan span on every 4th doc, PII injections on every
 * 10th, a 5-language mix) run through analyze / gopher rules / PII redaction
 * / exact dedup / MinHash-LSH / span dedup / line dedup / packing / sampling
 * / decontamination at local[N], printing per-stage wall, process-CPU
 * fraction and input rows/sec. A data-scale driver funnel shows up as
 * cpu_frac ≈ 1/cores on a long stage; healthy stages saturate their cores
 * or finish in scheduler noise.
 *
 * The heaviest stage (repeated-span removal — one gram-digest shuffle per
 * corpus word) also runs as a 2→8-core pair on a quarter subset, reporting
 * scaling efficiency inside the single-box bandwidth envelope (BASELINE.md
 * methodology: the 2→8 pair is what a real 4× executor scale-up preserves).
 *
 * Deterministic throughout (xxhash64 of the row id — no RNG), so reruns are
 * comparable. Env: SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_CORPUS_DOCS
 * (default 200000).
 */
object CorpusProbe {

  private def readProcCpu(): Double = {
    val s = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/proc/self/stat")), "US-ASCII")
    val rest = s.substring(s.lastIndexOf(')') + 2).split(" ")
    (rest(11).toLong + rest(12).toLong) / 100.0 // utime+stime, USER_HZ=100
  }

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-corpus-probe-$cores")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** 64 common words (incl. the Gopher stopwords) — hash-indexed vocab. */
  private val Vocab: Seq[String] = Seq(
    "the", "of", "and", "to", "a", "in", "is", "that", "it", "for", "was",
    "on", "are", "as", "with", "his", "they", "be", "at", "one", "have",
    "this", "from", "or", "had", "by", "hot", "word", "but", "what", "some",
    "we", "can", "out", "other", "were", "all", "there", "when", "up", "use",
    "your", "how", "said", "an", "each", "she", "which", "do", "their",
    "time", "if", "will", "way", "about", "many", "then", "them", "write",
    "would", "like", "so", "these", "her")

  /** Deterministic corpus: ids %50==1 duplicate the previous doc exactly,
    * %50==2 near-duplicate it (+2 words); %4==0 carry a viral 10-word
    * slogan; %10==0 carry an email. */
  private def genCorpus(s: SparkSession, n: Long): DataFrame = {
    val vlit = typedLit(Vocab)
    val langs = typedLit(Seq("en", "de", "fr", "es", "it"))
    val id = col("id")
    val seed = when(pmod(id, lit(50)) === 1, id - 1)
      .when(pmod(id, lit(50)) === 2, id - 2).otherwise(id)
    val nW = (pmod(xxhash64(seed), lit(81)) + 40).cast("int")
    val words = transform(sequence(lit(0), nW - 1),
      i => element_at(vlit, (pmod(xxhash64(seed, i), lit(Vocab.size)) + 1).cast("int")))
    val text = concat(array_join(words, " "),
      when(pmod(id, lit(50)) === 2, lit(" minor edit")).otherwise(lit("")),
      when(pmod(id, lit(4)) === 0,
        lit(" subscribe to our newsletter for updates delivered fresh daily now"))
        .otherwise(lit("")),
      when(pmod(id, lit(10)) === 0,
        concat(lit(" contact user"), id.cast("string"), lit("@mail"),
          pmod(id, lit(7)).cast("string"), lit(".com today")))
        .otherwise(lit("")))
    s.range(n).select(id.as("doc_id"), text.as("text"),
      element_at(langs, (pmod(id, lit(5)) + 1).cast("int")).as("lang"))
  }

  /** 8-word positional lines with an injected nav header (the
    * text_line_dedup shape) for the line-dedup stage. */
  private def withLines(docs: DataFrame): DataFrame = {
    val w = split(col("text"), " ", -1)
    val nChunks = ceil(size(w) / lit(8.0)).cast("int")
    val chunks = transform(sequence(lit(0), nChunks - lit(1)),
      c => array_join(slice(w, c * 8 + 1, lit(8)), " "))
    docs.select(col("doc_id"),
      concat(array(lit("site nav home about contact")), chunks).as("lines"))
  }

  def main(args: Array[String]): Unit = {
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_CORPUS_DOCS", "200000").toLong
    val dir = "/tmp/corpus_probe"

    locally { // generate once, outside every timed window
      val s = session(cores)
      genCorpus(s, nDocs).write.mode("overwrite").parquet(s"$dir/docs.parquet")
      s.stop()
    }

    val stages = scala.collection.mutable.ArrayBuffer.empty[(String, Double, Double)]
    def window(cores: Int)(body: => Unit): (Double, Double) = {
      val c0 = readProcCpu(); val t0 = System.nanoTime()
      body
      val sec = (System.nanoTime() - t0) / 1e9
      (sec, math.min(1.0, (readProcCpu() - c0) / (sec * cores)))
    }

    locally {
      val s = session(cores)
      val docs = s.read.parquet(s"$dir/docs.parquet")
      docs.count() // warm: scan + codegen
      def stage(name: String)(body: => Unit): Unit = {
        val (sec, frac) = window(cores)(body)
        stages += ((name, sec, frac))
        println(f"CPROBE $name%-14s ${sec}%7.2fs cpu_frac=$frac%.2f " +
          f"rows/s=${nDocs / sec}%,.0f")
      }
      stage("analyze") {
        TextAnalysis.analyze(docs, "doc_id", "text").agg(sum("n_tokens")).head()
      }
      stage("gopher") {
        Curation.gopherQuality(docs, "doc_id", "text")
          .where(col("gopher_pass")).count()
      }
      stage("pii") {
        Pii.redactDocs(docs, "doc_id", "text")
          .agg(sum("n_emails"), sum(length(col("redacted")))).head()
      }
      stage("dedup_exact") { Dedup.exact(docs, "doc_id", "text").count() }
      stage("minhash_lsh") {
        // the at-scale configuration: the viral slogan puts ~50k docs into
        // shared band buckets whose pairs all FAIL the jaccard verify — the
        // census cap prunes them before the quadratic within-bucket join
        // (measured on this corpus: 201 s uncapped → 17 s capped, IDENTICAL
        // 12000 output pairs)
        Dedup.minhashLsh(docs, "doc_id", "text", 3, 16, 3, 0.5,
          maxBucket = Some(64)).count()
      }
      stage("span_dedup") {
        Dedup.removeRepeatedSpans(docs, "doc_id", "text", n = 8, minDf = 1000)
          .agg(sum("n_removed")).head()
      }
      stage("line_dedup") {
        Curation.removeBoilerplateLines(withLines(docs), "doc_id", "lines",
          minDf = 1000).agg(sum("n_removed")).head()
      }
      stage("pack") {
        Curation.packSequences(
          docs.select(col("doc_id"), col("lang"),
            TextAnalysis.tokenCount(col("text")).as("n_toks")),
          "doc_id", col("n_toks"), col("lang"), capacity = 2048)
          .agg(max("bin_last")).head()
      }
      stage("sample") {
        Curation.sampleByHash(docs, col("doc_id"), col("lang"),
          Map("en" -> 900, "de" -> 500, "fr" -> 250), defaultPerMille = 100)
          .count()
      }
      stage("decontam") {
        Curation.decontaminate(
          docs.where(pmod(col("doc_id"), lit(1000)) =!= 0),
          docs.where(pmod(col("doc_id"), lit(1000)) === 0),
          "doc_id", "text", n = 13)
          .where(col("contaminated")).count()
      }
      stage("lm_perplexity") {
        val lm = graft.operators.LangModel.trainBigram(
          docs.where(col("lang") === "en"), "text")
        graft.operators.LangModel.perplexity(docs, "doc_id", "text", lm)
          .agg(sum("n_bigrams"), sum("perplexity")).head()
      }
      stage("bm25") {
        graft.operators.Bm25.score(docs, "doc_id", "text",
          Seq("the", "word", "time")).count()
      }
      stage("vocab_encode") {
        val v = graft.operators.Vocab.build(docs, "text", size = 48)
        graft.operators.Vocab.encode(docs, "doc_id", "text", v)
          .agg(sum("n_unk"), sum("n_tokens")).head()
      }
      s.stop()
    }

    // ---- 2→8 scaling pair on the heaviest stage (half subset: mixed
    // slogan/non-slogan docs, big enough that per-stage scheduling overhead
    // is amortized at both core counts). Interleaved sessions, best-of per
    // level (noise only slows runs down), per-window cpu_frac attached so a
    // contended pair is visibly contended. --------------------------------
    def spanRate(cores: Int): (Double, Double) = {
      val s = session(cores)
      try {
        val sub = s.read.parquet(s"$dir/docs.parquet")
          .where(pmod(col("doc_id"), lit(2)) === 0)
        val nSub = sub.count()
        def run(): (Double, Double) = {
          val (sec, frac) = window(cores) {
            Dedup.removeRepeatedSpans(sub, "doc_id", "text", n = 8, minDf = 500)
              .agg(sum("n_removed")).head()
          }
          (nSub / sec, frac)
        }
        run() // warm
        Seq(run(), run()).maxBy(_._1) // best of 2
      } finally s.stop()
    }
    val p2a = spanRate(2); val p8a = spanRate(8)
    val p2b = spanRate(2); val p8b = spanRate(8)
    val (r2, f2) = Seq(p2a, p2b).maxBy(_._1)
    val (r8, f8) = Seq(p8a, p8b).maxBy(_._1)
    val eff = (r8 / r2) / 4.0
    println(f"CPROBE pair_2_8 span_dedup rows/s n2=$r2%,.0f (cpu_frac=$f2%.2f) " +
      f"n8=$r8%,.0f (cpu_frac=$f8%.2f) efficiency=$eff%.3f")

    val stageJson = stages.map { case (n, sec, f) =>
      f""""$n":{"sec":$sec%.2f,"cpu_frac":$f%.2f}""" }.mkString("{", ",", "}")
    val json = f"""{"metric":"corpus_probe","docs":$nDocs,"cores":$cores,""" +
      f""""stages":$stageJson,"span_pair_2_8":{"rows_per_sec_n":$r2%.0f,""" +
      f""""rows_per_sec_4n":$r8%.0f,"efficiency":$eff%.3f,""" +
      f""""cpu_frac_n":$f2%.2f,"cpu_frac_4n":$f8%.2f}}"""
    println(json)
    java.nio.file.Files.write(java.nio.file.Paths.get("corpus_probe.json"),
      json.getBytes("UTF-8"))
  }
}
