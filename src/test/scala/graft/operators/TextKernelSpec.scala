package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Round-7: the fused curation-gate kernel must be BIT-identical to the
  * Catalyst langId/qualityScore/tokenCount forms — including the quality
  * double (same IEEE op order + the Catalyst round-6 semantics) and the
  * empty-text NaN. Checked on synthetic edge cases AND the sf0.001 corpus. */
class TextKernelSpec extends SparkTestBase {

  private def assertSame(df: org.apache.spark.sql.DataFrame): Unit = {
    val got = df.select(col("id"),
      TextAnalysis.langQualityTokensUdf(col("text")).as("f"),
      TextAnalysis.langId(col("text")).as("lang_r"),
      TextAnalysis.qualityScore(col("text")).as("q_r"),
      TextAnalysis.tokenCount(col("text")).as("n_r")).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val f = r.getStruct(1)
      assert(f.getString(0) == r.getString(2), s"lang diverges for id=${r.get(0)}")
      assert(java.lang.Double.doubleToRawLongBits(f.getDouble(1)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(3)),
        s"quality diverges for id=${r.get(0)}: ${f.getDouble(1)} vs ${r.getDouble(3)}")
      assert(f.getLong(2) == r.getLong(4), s"n_tokens diverges for id=${r.get(0)}")
    }
  }

  test("fused gate kernel == Catalyst forms on edge cases") {
    import spark.implicits._
    val texts = Seq(
      "the quick brown fox and the lazy dog of the north",
      "le chat et la porte de la maison dans un jardin",
      "der hund und die katze ist von den nicht ein",
      "xyzzy plugh no stopwords here",
      // NOTE: empty text is OUTSIDE the Catalyst form's domain — under ANSI
      // mode qualityScore's alpha division throws DIVIDE_BY_ZERO on len=0;
      // the fused kernel returns ("und", NaN, 1) instead (covered below)
      "the", "a",
      "el que y en la de los un una por",
      "il di che e un per con del la",
      "mixed the le der el il and et und y e", // cross-language tie material
      "trailing the space ", "  the  double spaces",
      "unicode é€ the 你好 and of to a in is that it for",
      ("the and of to a in is that it for " * 40).trim // long, quality ~ len
    )
    assertSame(texts.zipWithIndex.map { case (t, i) => (i, t) }.toDF("id", "text"))
  }

  test("fused gate kernel == Catalyst forms on the sf0.001 corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").as("id"), col("text"))
    assertSame(docs)
  }

  test("empty text: fused kernel returns (und, NaN, 1) where Catalyst throws") {
    import spark.implicits._
    val r = Seq((1, "")).toDF("id", "text")
      .select(TextAnalysis.langQualityTokensUdf(col("text")).as("f")).head().getStruct(0)
    assert(r.getString(0) == "und" && r.getDouble(1).isNaN && r.getLong(2) == 1L)
  }

  test("null text propagates as null struct") {
    import spark.implicits._
    val r = Seq((1, null.asInstanceOf[String])).toDF("id", "text")
      .select(TextAnalysis.langQualityTokensUdf(col("text")).as("f")).head()
    assert(r.isNullAt(0))
  }
}
