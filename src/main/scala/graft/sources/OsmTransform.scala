package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.geom.{GeoFunctions => G}

/**
 * Generic tag-filtered OSM extraction — the reference osmtools public API
 * `toPoints` / `toLines` / `toPolygons` (osmtools/Transform.groovy:47-186,
 * extractWaysAsPolygons :225-380, extractWaysAsLines :642-788,
 * extractRelationsAsLines :811-900, TransformUtils.groovy:
 * extractNodesAsPoints :230-400, createWhereFilter :409-452,
 * createTagList :470-505). Replicated semantics:
 *
 *  - a tag filter is a disjunction of (key IN ks [AND value IN vs]) terms;
 *    an EMPTY filter selects every element that has at least one tag;
 *  - output columns pivot tag_key → MAX(tag_value); with `columnsToKeep`
 *    the pivot is exactly that list (missing keys → NULL column) and
 *    elements carrying NONE of the kept keys are DROPPED (the reference's
 *    inner tag join); without it, the column set is the distinct keys of
 *    the selected elements (runtime-discovered like the reference's
 *    createTagList — we sort it for plan determinism);
 *  - ways → polygons only when closed (first == last node, > 3 points),
 *    buffer(0)-repaired, empty dropped; ways → lines when ≥ 2 points;
 *  - relations → polygons via the multipolygon assembly
 *    ([[OsmAssembly.assembleRelations]]) and → lines via per-relation
 *    line-merging of member ways; relation rows are selected by RELATION
 *    tags;
 *  - ids: 'w'||id_way / 'r'||id_relation (points keep id_node);
 *  - optional bounding geometry: intersects-filter on the result.
 *
 * Scale shape: tag selection and pivots are hash joins/aggregates on
 * element ids; geometry assembly is the [[OsmAssembly]] collect-per-way
 * pattern — no driver-side loops.
 */
object OsmTransform {

  /** One `(key IN ks [AND value IN vs])` disjunct; empty keys or values
    * drops that side of the conjunction (createWhereFilter semantics). */
  final case class TagFilter(keys: Seq[String] = Nil, values: Seq[String] = Nil)

  private def whereFilter(tags: Seq[TagFilter]): Option[Column] =
    if (tags.isEmpty) None
    else Some(tags.map { f =>
      val k = if (f.keys.isEmpty) None else Some(col("tag_key").isInCollection(f.keys))
      val v = if (f.values.isEmpty) None else Some(col("tag_value").isInCollection(f.values))
      (k, v) match {
        case (Some(a), Some(b)) => a && b
        case (Some(a), None) => a
        case (None, Some(b)) => b
        case (None, None) => lit(true)
      }
    }.reduce(_ || _))

  /** Distinct element ids whose tags match the filter (all tagged elements
    * when the filter is empty). */
  private def selectIds(tagTable: DataFrame, idCol: String,
                        tags: Seq[TagFilter]): DataFrame =
    whereFilter(tags).fold(tagTable)(tagTable.where(_))
      .select(idCol).distinct()

  /** Cap on runtime-discovered pivot keys (no `columnsToKeep`): at planetary
    * OSM scale the tag-key vocabulary is unbounded user input (~100k distinct
    * keys) and every key becomes a MAX-pivot column, so unbounded discovery
    * is a driver/codegen hazard. The documented scale path is an explicit
    * `columnsToKeep`; without one, discovery keeps the top `maxKeys` keys by
    * element frequency (ties broken alphabetically, then the kept set sorted
    * for plan determinism) and logs the drop count. */
  val DefaultMaxDiscoveredKeys = 1024

  /** Pivot the tags of the selected elements into columns. */
  private def pivotTags(tagTable: DataFrame, idCol: String, ids: DataFrame,
                        columnsToKeep: Seq[String],
                        maxKeys: Int = DefaultMaxDiscoveredKeys): DataFrame = {
    val selected = tagTable.join(ids, idCol)
    if (columnsToKeep.nonEmpty) {
      // inner tag join: elements with none of the kept keys drop out
      selected.where(col("tag_key").isInCollection(columnsToKeep))
        .groupBy(idCol).pivot("tag_key", columnsToKeep).agg(max("tag_value"))
    } else {
      // frequency census: #keys rows (bounded vocabulary), never the tags
      val counted = selected.where(col("tag_key").isNotNull)
        .groupBy("tag_key").agg(count(lit(1)).as("__n"))
        .orderBy(desc("__n"), col("tag_key"))
        .limit(maxKeys + 1) // +1 only to detect truncation without a count()
        .collect()
      val truncated = counted.length > maxKeys
      if (truncated)
        System.err.println(s"[graft] OsmTransform: discovered tag-key set " +
          s"exceeds $maxKeys; keeping the $maxKeys most frequent keys " +
          s"(pass columnsToKeep for the exact set)")
      val keys = counted.take(maxKeys).map(_.getString(0)).sorted.toSeq
      // only the capped path filters rows — the uncapped result is
      // bit-identical to the historical unbounded discovery
      val base = if (truncated)
        selected.where(col("tag_key").isInCollection(keys)) else selected
      base.groupBy(idCol).pivot("tag_key", keys).agg(max("tag_value"))
    }
  }

  private def boundFilter(df: DataFrame, bound: Option[Array[Byte]]): DataFrame =
    bound.fold(df)(b => df.where(G.stIntersects(lit(b), col("the_geom"))))

  /** toPoints: tag-selected nodes as point geometries + pivoted tags. */
  def toPoints(t: OsmXml.Tables, tags: Seq[TagFilter] = Nil,
               columnsToKeep: Seq[String] = Nil,
               bound: Option[Array[Byte]] = None,
               maxDiscoveredKeys: Int = DefaultMaxDiscoveredKeys): DataFrame = {
    val ids = selectIds(t.nodeTags, "node_id", tags)
    val tagCols = pivotTags(t.nodeTags, "node_id", ids, columnsToKeep, maxDiscoveredKeys)
    val pts = t.nodes.join(tagCols, "node_id")
      .withColumn("the_geom", G.stPoint(col("x"), col("y")))
      .drop("x", "y")
    boundFilter(pts, bound)
  }

  /** Member-way linework of the selected relations, merged per relation
    * (coordinate assembly shared with [[OsmAssembly.wayLinework]]). */
  private def relationLines(t: OsmXml.Tables, relIds: DataFrame): DataFrame = {
    import graft.geom.Geo
    val merge = udf { (gs: Seq[Array[Byte]]) =>
      val m = new org.locationtech.jts.operation.linemerge.LineMerger()
      gs.foreach(b => if (b != null) m.add(Geo.fromWkb(b)))
      import scala.jdk.CollectionConverters._
      val ls = m.getMergedLineStrings.asScala.toSeq
        .map(_.asInstanceOf[org.locationtech.jts.geom.Geometry])
      if (ls.isEmpty) null
      else Geo.toWkb(Geo.factory.buildGeometry(ls.asJava))
    }
    val wayLines = OsmAssembly.wayLinework(t.wayNodes, t.nodes)
    t.relationMembers.join(relIds, "id_relation")
      .join(wayLines, col("id_way") === col("way_id"))
      .groupBy("id_relation")
      .agg(collect_list(col("__line")).as("__ls"))
      .select(col("id_relation"), merge(col("__ls")).as("the_geom"))
      .where(col("the_geom").isNotNull)
  }

  /** toLines: tag-selected ways (≥2 nodes) + relations (merged member
    * linework), schema-aligned union with 'w'/'r' prefixed ids. */
  def toLines(t: OsmXml.Tables, tags: Seq[TagFilter] = Nil,
              columnsToKeep: Seq[String] = Nil,
              bound: Option[Array[Byte]] = None,
              maxDiscoveredKeys: Int = DefaultMaxDiscoveredKeys): DataFrame = {
    val wayIds = selectIds(t.wayTags, "way_id", tags)
    val wayTagCols = pivotTags(t.wayTags, "way_id", wayIds, columnsToKeep, maxDiscoveredKeys)
    val ways = OsmAssembly.assembleWays(t.wayNodes.join(wayIds, "way_id"), t.nodes)
      .where(G.stDimension(col("the_geom")) >= 1) // ≥ 2 nodes
      .select(col("way_id"), when(G.stDimension(col("the_geom")) === 2,
        G.stToMultiLine(col("the_geom"))).otherwise(col("the_geom")).as("the_geom"))
      .join(wayTagCols, "way_id")
      .withColumn("id", concat(lit("w"), col("way_id"))).drop("way_id")
    val relIds = selectIds(t.relationTags, "id_relation", tags)
    val relTagCols = pivotTags(t.relationTags, "id_relation", relIds, columnsToKeep, maxDiscoveredKeys)
    val rels = relationLines(t, relIds)
      .join(relTagCols, "id_relation")
      .withColumn("id", concat(lit("r"), col("id_relation"))).drop("id_relation")
    boundFilter(ways.unionByName(rels, allowMissingColumns = true), bound)
  }

  /** toPolygons: closed tag-selected ways (buffer(0) repair) + multipolygon
    * relations, schema-aligned union with 'w'/'r' prefixed ids. */
  def toPolygons(t: OsmXml.Tables, tags: Seq[TagFilter] = Nil,
                 columnsToKeep: Seq[String] = Nil,
                 bound: Option[Array[Byte]] = None,
                 maxDiscoveredKeys: Int = DefaultMaxDiscoveredKeys): DataFrame = {
    val wayIds = selectIds(t.wayTags, "way_id", tags)
    val wayTagCols = pivotTags(t.wayTags, "way_id", wayIds, columnsToKeep, maxDiscoveredKeys)
    val ways = OsmAssembly.assembleWays(t.wayNodes.join(wayIds, "way_id"), t.nodes)
      .where(G.stDimension(col("the_geom")) === 2) // closed rings only
      .select(col("way_id"), G.stBuffer(col("the_geom"), lit(0.0)).as("the_geom"))
      .where(!G.stIsEmpty(col("the_geom")))
      .join(wayTagCols, "way_id")
      .withColumn("id", concat(lit("w"), col("way_id"))).drop("way_id")
    val relIds = selectIds(t.relationTags, "id_relation", tags)
    val relTagCols = pivotTags(t.relationTags, "id_relation", relIds, columnsToKeep, maxDiscoveredKeys)
    val rels = OsmAssembly.assembleRelations(
        t.relationTags.join(relIds, "id_relation"), t.relationMembers,
        t.wayNodes, t.nodes)
      .join(relTagCols, "id_relation")
      .withColumn("id", concat(lit("r"), col("id_relation"))).drop("id_relation")
    boundFilter(ways.unionByName(rels, allowMissingColumns = true), bound)
  }
}
