package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * OSM XML → node/way/relation tables — the reference's `createGISLayers`
 * envelope (osm/InputDataLoading.groovy, ~300 LoC of H2 INSERT loops),
 * re-expressed as ONE `from_xml` projection + explodes: each input row
 * carries an `<osm>` document; the parsed struct explodes into the six
 * relational tables the assembly layer consumes ([[OsmAssembly]]
 * assembleWays / assembleRelations).
 *
 * Distributed by construction: parsing is per-row Catalyst (`from_xml`),
 * explodes are generators, nothing touches the driver — 10^12 small
 * extracts parse as one map stage.
 */
object OsmXml {

  private val tagT = ArrayType(StructType(Seq(
    StructField("_k", StringType), StructField("_v", StringType))))
  /** Schema of an `<osm>` document (attributePrefix `_`, Spark XML default). */
  val osmSchema: StructType = StructType(Seq(
    StructField("node", ArrayType(StructType(Seq(
      StructField("_id", LongType), StructField("_lat", DoubleType),
      StructField("_lon", DoubleType), StructField("tag", tagT))))),
    StructField("way", ArrayType(StructType(Seq(
      StructField("_id", LongType),
      StructField("nd", ArrayType(StructType(Seq(StructField("_ref", LongType))))),
      StructField("tag", tagT))))),
    StructField("relation", ArrayType(StructType(Seq(
      StructField("_id", LongType),
      StructField("member", ArrayType(StructType(Seq(
        StructField("_type", StringType), StructField("_ref", LongType),
        StructField("_role", StringType))))),
      StructField("tag", tagT)))))))

  final case class Tables(nodes: DataFrame, nodeTags: DataFrame,
                          wayNodes: DataFrame, wayTags: DataFrame,
                          relationMembers: DataFrame, relationTags: DataFrame)

  /**
   * Parse a column of OSM XML documents into the relational layer tables.
   * Column contracts match the assembly layer: nodes (node_id, x, y) with
   * lon→x / lat→y; wayNodes (way_id, pos, node_id) with pos = nd order;
   * relationMembers (id_relation, id_way, role, way_order) for way members.
   */
  def parse(docs: DataFrame, xmlCol: String): Tables = {
    val parsed = docs
      .select(from_xml(col(xmlCol), osmSchema).as("o"))
      .localCheckpoint() // six tables explode from one parse
    val nodes = parsed.select(explode(col("o.node")).as("n"))
      .select(col("n._id").as("node_id"), col("n._lon").as("x"), col("n._lat").as("y"))
    val nodeTags = parsed.select(explode(col("o.node")).as("n"))
      .select(col("n._id").as("node_id"), explode(col("n.tag")).as("t"))
      .select(col("node_id"), col("t._k").as("tag_key"), col("t._v").as("tag_value"))
    val ways = parsed.select(explode(col("o.way")).as("w"))
    val wayNodes = ways
      .select(col("w._id").as("way_id"), posexplode(col("w.nd")).as(Seq("pos", "nd")))
      .select(col("way_id"), col("pos").cast("int").as("pos"), col("nd._ref").as("node_id"))
    val wayTags = ways
      .select(col("w._id").as("way_id"), explode(col("w.tag")).as("t"))
      .select(col("way_id"), col("t._k").as("tag_key"), col("t._v").as("tag_value"))
    val rels = parsed.select(explode(col("o.relation")).as("r"))
    val relationMembers = rels
      .select(col("r._id").as("id_relation"), posexplode(col("r.member")).as(Seq("ord", "m")))
      .where(col("m._type") === "way")
      .select(col("id_relation"), col("m._ref").as("id_way"),
        col("m._role").as("role"), col("ord").cast("int").as("way_order"))
    val relationTags = rels
      .select(col("r._id").as("id_relation"), explode(col("r.tag")).as("t"))
      .select(col("id_relation"), col("t._k").as("tag_key"), col("t._v").as("tag_value"))
    Tables(nodes, nodeTags, wayNodes, wayTags, relationMembers, relationTags)
  }
}
