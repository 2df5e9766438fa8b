package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Deterministic synthesis of the Common-Crawl-style `pages` table
 * (BASELINE.json input_hint: url STRING, warc_ts TIMESTAMP, html BINARY,
 * text STRING, lang STRING) plus the geocoding + footprint-extraction
 * transforms. No external data; everything is a pure function of the row
 * index (FIXTURES.md §3), so any scale regenerates bit-identically.
 *
 * Geocode: deterministic LCG hash of the row index maps into the Geoclimate
 * fixture coordinate plane, with a configurable fraction of rows routed into
 * a small "hotspot" window (dense cells — the skew case the north rule calls
 * out). `html` embeds the text payload plus an optional footprint WKT in a
 * data attribute; extraction must return `text` byte-identical per url (the
 * per-row invariant, verified in PagesSpec).
 */
object Pages {
  val Langs: Array[String] = Array("en", "fr", "de", "es", "it")

  /** Pure-Catalyst deterministic point for row i (no UDF — codegen'd):
    * mixes i with an LCG then scales into [0,55)x[-15,40) — the fixture
    * window that overlaps rsu_test 1-3. `hotFraction` of rows (by i mod 100)
    * land in a 2x2 hotspot around (30,30) to create skewed cells. */
  def pointX(i: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val h = pmod(i * 1103515245L + 12345L, lit(2147483648L))
    when(pmod(i, lit(100)) < 20, lit(29.0) + pmod(h, lit(2000)) / 1000.0)
      .otherwise(pmod(h, lit(55000)) / 1000.0 + 0.0005)
  }
  def pointY(i: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val h = pmod(i * 69069L + 1L, lit(2147483648L))
    when(pmod(i, lit(100)) < 20, lit(29.0) + pmod(h, lit(2000)) / 1000.0)
      .otherwise(pmod(h, lit(55000)) / 1000.0 - 15.0 + 0.0005)
  }

  /** Synthesize n pages (distributed via spark.range — no driver loop). */
  def synth(spark: SparkSession, n: Long, parts: Int = 32): DataFrame = {
    val df = spark.range(0, n, 1, parts).toDF("i")
    val lang = element_at(lit(Langs), (pmod(col("i"), lit(Langs.length.toLong)) + 1).cast("int"))
    val text = concat(lit("Deterministic page body number "), col("i"),
      lit(" with some repeated filler words to give the text a realistic shape "),
      lit("lorem ipsum dolor sit amet "), col("i") % 7)
    // ~30% of pages carry a footprint polygon (a small square at the geocode)
    val x = round(pointX(col("i")), 4); val y = round(pointY(col("i")), 4)
    val wkt = concat(lit("POLYGON(("),
      x, lit(" "), y, lit(", "), x + 2.0, lit(" "), y, lit(", "),
      x + 2.0, lit(" "), y + 2.0, lit(", "), x, lit(" "), y + 2.0, lit(", "),
      x, lit(" "), y, lit("))"))
    val html = concat(lit("<html><head><meta charset=\"utf-8\"></head><body"),
      when(pmod(col("i"), lit(10)) < 3, concat(lit(" data-footprint=\""), wkt, lit("\""))).otherwise(lit("")),
      lit("><p>"), text, lit("</p></body></html>"))
    df.select(
      concat(lit("https://example-"), lang, lit(".test/p/"), col("i")).as("url"),
      (lit(1356998400L) + col("i") * 7L).cast("timestamp").as("warc_ts"), // 2013-01-01 + i*7s
      encode(html, "UTF-8").as("html"),
      text.as("text"),
      lang.as("lang"),
      col("i"))
  }

  /** Geocoded pages: adds (x, y) point columns — pure Catalyst. */
  def geocode(pages: DataFrame): DataFrame =
    pages.withColumn("x", pointX(col("i"))).withColumn("y", pointY(col("i")))

  /** Extract the text payload back out of html BINARY. MUST be byte-identical
    * to the `text` column per url (north-rule invariant). */
  val extractText = udf { (html: Array[Byte]) =>
    val s = new String(html, java.nio.charset.StandardCharsets.UTF_8)
    val a = s.indexOf("<p>"); val b = s.lastIndexOf("</p>")
    if (a >= 0 && b > a) s.substring(a + 3, b) else null
  }

  /** Extract the optional footprint WKT from the html data attribute. */
  val extractFootprintWkt = udf { (html: Array[Byte]) =>
    val s = new String(html, java.nio.charset.StandardCharsets.UTF_8)
    val k = s.indexOf("data-footprint=\"")
    if (k < 0) null
    else {
      val start = k + "data-footprint=\"".length
      val end = s.indexOf('"', start)
      if (end < 0) null else s.substring(start, end)
    }
  }
}
