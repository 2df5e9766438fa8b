package graft.indicators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Local Climate Zone classification — Spark re-expression of the reference's
 * `identifyLczType` (TypologyClassification.groovy:87-553). Three row-local
 * stages (rural decision tree, industrial/commercial override, urban
 * min-distance over normalized LCZ intervals) unioned back together.
 *
 * Everything is per-row column math — a single codegen'd projection, no
 * shuffle at all — so classification of 10^12 rows is map-only. The
 * reference's per-row Groovy loop + JDBC batch insert
 * (GenericIndicators.groovy:513-553 distributionCharacterization) becomes
 * an `array_sort` over (distance, tie-order) structs.
 */
object Lcz {

  /** LCZ interval table (name, per-indicator (low,upp)), verbatim from
    * TypologyClassification.groovy:144-152; NaN encodes SQL NULL. */
  val Indicators: Seq[String] = Seq(
    "sky_view_factor", "aspect_ratio", "building_surface_fraction",
    "impervious_surface_fraction", "pervious_surface_fraction",
    "height_of_roughness_elements", "terrain_roughness_length")

  private val N = Double.NaN
  // name -> Seq[(low, upp)] aligned with Indicators
  val Classes: Seq[(Int, Seq[(Double, Double)])] = Seq(
    1 -> Seq((0.2, 0.4), (2.0, N), (0.4, 0.6), (0.4, 0.6), (0.0, 0.1), (25.0, N), (1.5, N)),
    2 -> Seq((0.3, 0.6), (0.8, 2.0), (0.4, 0.7), (0.3, 0.5), (0.0, 0.2), (10.0, 25.0), (0.375, 1.5)),
    3 -> Seq((0.2, 0.6), (0.8, 1.5), (0.4, 0.7), (0.2, 0.5), (0.0, 0.3), (3.0, 10.0), (0.375, 0.75)),
    4 -> Seq((0.5, 0.7), (0.8, 1.3), (0.2, 0.4), (0.3, 0.4), (0.3, 0.4), (25.0, N), (0.75, N)),
    5 -> Seq((0.5, 0.8), (0.3, 0.8), (0.2, 0.4), (0.3, 0.5), (0.2, 0.4), (10.0, 25.0), (0.175, 0.75)),
    6 -> Seq((0.6, 0.9), (0.3, 0.8), (0.2, 0.4), (0.2, 0.5), (0.3, 0.6), (3.0, 10.0), (0.175, 0.75)),
    7 -> Seq((0.2, 0.5), (1.0, 2.0), (0.6, 0.9), (0.0, 0.2), (0.0, 0.3), (2.0, 4.0), (0.175, 0.375)),
    9 -> Seq((0.8, 1.0), (0.1, 0.3), (0.1, 0.2), (0.0, 0.2), (0.6, 0.8), (3.0, 10.0), (0.175, 0.75)))

  /** Per-indicator normalization constants: center=AVG, variability=
    * STDDEV_POP over all non-null interval bounds (normalisationType=AVG —
    * TypologyClassification.groovy:355-370). Computed once at plan time. */
  private def normConstants(idx: Int): (Double, Double) = {
    val vals = Classes.flatMap { case (_, b) =>
      Seq(b(idx)._1, b(idx)._2).filterNot(_.isNaN) }
    val mean = vals.sum / vals.size
    val varP = vals.map(v => (v - mean) * (v - mean)).sum / vals.size
    (mean, math.sqrt(varP))
  }

  /** Interval penalty (normalized): 0 inside, signed distance outside —
    * TypologyClassification.groovy:408-415 CASEWHEN cascade. */
  private def penalty(v: Column, low: Option[Double], upp: Option[Double]): Column =
    (low, upp) match {
      case (None, Some(u))    => when(v < u, lit(0.0)).otherwise(lit(u) - v)
      case (Some(l), None)    => when(v > l, lit(0.0)).otherwise(lit(l) - v)
      case (Some(l), Some(u)) =>
        when(v < l, lit(l) - v).otherwise(when(v < u, lit(0.0)).otherwise(lit(u) - v))
      case (None, None)       => lit(0.0)
    }

  /**
   * Classify RSUs. `lczIndics` must have id_rsu + the 7 `Indicators` columns;
   * `allIndics` must have id_rsu + the *_lcz fraction columns (see fixture
   * rsu_test_all_indics_for_lcz). Returns id_rsu, lcz_primary, lcz_secondary,
   * min_distance, lcz_uniqueness_value, lcz_equality_value.
   */
  def identifyLczType(lczIndics: DataFrame, allIndics: DataFrame,
                      weights: Map[String, Double] = Map.empty): DataFrame = {
    val urbanBuildFracMin = 0.1; val urbanAspectRatioMin = 0.1
    val scatteredTreeLow = 0.05; val scatteredTreeHigh = 0.75
    val lcz8LevNumbMax = 3.0; val lcz8VegFracMax = 0.2; val lcz8SVFMin = 0.7
    val lcz10IndFracMin = 0.33; val lcz8LLRFracMin = 0.33

    val bf = col("building_fraction_lcz"); val ar = col("aspect_ratio")
    val hv = col("high_vegetation_fraction_lcz"); val lv = col("low_vegetation_fraction_lcz")
    val wa = col("water_fraction_lcz"); val im = col("impervious_fraction_lcz")
    val pv = col("pervious_fraction_lcz")

    // ---- I. rural decision tree (TypologyClassification.groovy:190-285) ---
    val isRural = bf < urbanBuildFracMin && ar < urbanAspectRatioMin
    // NOTE: `1-IMPERVIOUS+WATER+BUILDING` is copied as written in the
    // reference SQL (no parentheses — TypologyClassification.groovy:215).
    val highAllVeg =
      when(im + wa + bf === 0 && hv === 0, lit(null).cast("double"))
        .when(im + wa + bf === 1, when(hv === 0, 0.0).otherwise(1.0))
        .when(lit(1.0) - im + wa + bf <= hv, 1.0)
        .otherwise(hv / (lit(1.0) - im - wa - bf))
    val allVeg = lv + hv
    val ruralLcz =
      when(im > allVeg && im > wa && im > 0.1, 105)
        .when(allVeg <= wa && wa > 0.31, 107)
        .when(highAllVeg.isNull || highAllVeg < scatteredTreeLow, 104)
        .when(highAllVeg < scatteredTreeHigh, 102)
        .otherwise(101)
    val ruralMinDist = when(im + pv < 0.5, lit(-1.0)).otherwise(lit(null).cast("double"))
    def ruralUncBase(landCover: Column): Column =
      lit(0.25) * (lit(urbanAspectRatioMin) - ar) / urbanAspectRatioMin +
      lit(0.25) * (lit(urbanBuildFracMin) - bf) / urbanBuildFracMin +
      lit(0.5) * (landCover - urbanBuildFracMin) / (1 - urbanBuildFracMin)
    val mid = (scatteredTreeHigh - scatteredTreeLow) / 2
    val ruralUnc =
      when(ruralLcz === 101, ruralUncBase(hv))
        .when(ruralLcz === 104, ruralUncBase(allVeg - hv))
        .when(ruralLcz === 105, ruralUncBase(im))
        .when(ruralLcz === 107, ruralUncBase(wa))
        .when(ruralLcz === 102,
          lit(0.25) * (lit(urbanAspectRatioMin) - ar) / urbanAspectRatioMin +
          lit(0.25) * (lit(urbanBuildFracMin) - bf) / urbanBuildFracMin +
          lit(0.25) * (allVeg - urbanBuildFracMin) / (1 - urbanBuildFracMin) +
          lit(0.25) * (lit(mid) - abs(highAllVeg - mid)) / mid)

    val rural = allIndics.where(isRural).select(
      col("id_rsu"), ruralLcz.as("lcz_primary"),
      lit(null).cast("int").as("lcz_secondary"),
      ruralMinDist.as("min_distance"), ruralUnc.as("lcz_uniqueness_value"),
      lit(null).cast("double").as("lcz_equality_value"))

    // ---- 0. industrial / large-low-rise override among non-rural ----------
    val nonRural = allIndics.where(!coalesce(isRural, lit(false)))
    val lowrise = col("area_fraction_commercial_lcz") + col("area_fraction_light_industry_lcz")
    val heavy = col("area_fraction_heavy_industry_lcz")
    val isIndus =
      (heavy > lowrise && heavy > lcz10IndFracMin) ||
      (lowrise > col("area_fraction_residential_lcz") && lowrise > lcz8LLRFracMin &&
        col("avg_nb_lev_area_weighted") < lcz8LevNumbMax &&
        lv + hv < lcz8VegFracMax && col("ground_sky_view_factor") > lcz8SVFMin)
    val indus = nonRural.where(isIndus).select(
      col("id_rsu"),
      when(heavy > lowrise, 10).otherwise(8).as("lcz_primary"),
      lit(null).cast("int").as("lcz_secondary"),
      lit(null).cast("double").as("min_distance"),
      when(heavy > lowrise, (heavy - lcz10IndFracMin) / (1 - lcz10IndFracMin))
        .otherwise((lowrise - lcz8LLRFracMin) / (1 - lcz8LLRFracMin))
        .as("lcz_uniqueness_value"),
      lit(null).cast("double").as("lcz_equality_value"))

    // ---- II. urban min-distance classification ----------------------------
    val urbanIds = nonRural.where(!coalesce(isIndus, lit(false)))
      .select(col("id_rsu"), col("avg_nb_lev_area_weighted"))
    val urban0 = lczIndics.join(urbanIds, Seq("id_rsu"))

    val norms = Indicators.indices.map(normConstants)
    def distTo(classBounds: Seq[(Double, Double)]): Column = {
      val terms = Indicators.zipWithIndex.map { case (ind, i) =>
        val (c, s) = norms(i)
        val v = (col(ind) - c) / s
        val (l0, u0) = classBounds(i)
        val low = if (l0.isNaN) None else Some((l0 - c) / s)
        val upp = if (u0.isNaN) None else Some((u0 - c) / s)
        val w = weights.getOrElse(ind, 1.0)
        lit(w) * pow(penalty(v, low, upp), 2.0)
      }
      sqrt(terms.reduce(_ + _))
    }
    // distance columns; LCZ1 masked to -9999.99 when avg_nb_lev < 10
    // (TypologyClassification.groovy:431-445); tie-order matches the
    // reference's column insertion order LCZ2..LCZ9 then LCZ1 (LCZ1 is
    // re-appended last after the masking join).
    val distCols: Seq[(Int, Column)] = Classes.map { case (name, b) =>
      val d = distTo(b)
      name -> (if (name == 1)
        when(col("avg_nb_lev_area_weighted") < 10, -9999.99).otherwise(d) else d)
    }
    val tieOrder = Seq(2, 3, 4, 5, 6, 7, 9, 1)
    val structs = tieOrder.zipWithIndex.map { case (name, ord) =>
      struct(distCols.find(_._1 == name).get._2.as("d"), lit(ord).as("ord"), lit(name).as("name"))
    }
    val arr = filter(array(structs: _*), s => s.getField("d") =!= -9999.99)
    val sorted = array_sort(arr) // struct order: by d, then ord — the reference's stable sort
    val nbDistCol = Classes.size // equality divides by TOTAL column count (pre-removal)
    val total = aggregate(sorted, lit(0.0), (acc, s) => acc + s.getField("d"))
    val d0 = element_at(sorted, 1).getField("d")
    val d1 = element_at(sorted, 2).getField("d")
    val urban = urban0.select(
      col("id_rsu"),
      element_at(sorted, 1).getField("name").as("lcz_primary"),
      element_at(sorted, 2).getField("name").as("lcz_secondary"),
      d0.as("min_distance"),
      when(d0 + d1 > 0, abs(d0 - d1) / (d0 + d1)).otherwise(lit(null).cast("double"))
        .as("lcz_uniqueness_value"),
      when(total === 0, lit(null).cast("double"))
        .otherwise(aggregate(sorted, lit(0.0),
          (acc, s) => acc + least(s.getField("d"), total / nbDistCol)) / total)
        .as("lcz_equality_value"))

    urban.unionByName(indus).unionByName(rural)
  }
}
